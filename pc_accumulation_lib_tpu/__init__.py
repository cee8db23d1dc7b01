"""pc_accumulation_lib_tpu: TPU-native semantic point cloud accumulation
and BEV dataset generation.

A from-scratch JAX/XLA re-design of robin-karlsson0/pc-accumulation-lib for
TPU hardware: fused jitted integrate steps (semseg + painting + ICP +
ring-buffer insert), a sort-based raster backend, fixed world-frame pose
chains, and mesh-sharded scale-out. See SURVEY.md for the reference layer
map these components correspond to.
"""
from pc_accumulation_lib_tpu import config  # noqa: F401

__version__ = '0.1.0'


def __getattr__(name):
    # Lazy heavyweight imports so `import pc_accumulation_lib_tpu` stays
    # cheap (jax/flax pull in at first use).
    import importlib
    lazy = {
        'Kitti360SemanticPointCloudAccumulator':
            'pc_accumulation_lib_tpu.accum.kitti360',
        'NuScenesSemanticPointCloudAccumulator':
            'pc_accumulation_lib_tpu.accum.nuscenes',
        'NuScenesOracleSemanticPointCloudAccumulator':
            'pc_accumulation_lib_tpu.accum.nuscenes_oracle',
        'SemBEVGenerator': 'pc_accumulation_lib_tpu.bev.sem_bev',
        'RGBBEVGenerator': 'pc_accumulation_lib_tpu.bev.rgb_bev',
        'Kitti360Dataloader': 'pc_accumulation_lib_tpu.dataloaders.kitti360',
        'NuScenesDataloader': 'pc_accumulation_lib_tpu.dataloaders.nuscenes',
        'SemSegTPU': 'pc_accumulation_lib_tpu.models.semseg',
        'load_semseg_model': 'pc_accumulation_lib_tpu.models.semseg',
    }
    if name in lazy:
        module = importlib.import_module(lazy[name])
        return getattr(module, name)
    raise AttributeError(name)
