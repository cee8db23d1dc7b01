"""End-to-end benchmark: accumulated-BEV samples/sec on one chip.

Measures the full pipeline per sample — ResNet-50 semseg forward, point
painting, ICP ego-motion, buffer insert, and a 256x256 5-channel x 3-split
BEV raster — on a synthetic KITTI-360-scale stream (~131k pts/frame).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 50 — the BASELINE.json north-star target of >=50
end-to-end BEV samples/sec/chip (the reference publishes no numbers;
BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

# Persistent XLA compile cache: sorts/convs compile slowly on first run.
# Must go through jax.config (the environment's sitecustomize imports jax
# before user code, so env vars are locked in by then).
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)


def bench_nuscenes_oracle():
    """BASELINE config 2: oracle-pose 6-camera accumulation + BEV sampling
    on a synthetic NuScenes-format stream. Secondary mode
    (`python bench.py nuscenes_oracle`)."""
    import jax

    from pc_accumulation_lib_tpu import config as cfg
    from pc_accumulation_lib_tpu.accum.nuscenes_oracle import (
        NuScenesOracleSemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticNuScenesStream)
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU

    n_frames = 20
    stream = SyntheticNuScenesStream(n_frames=n_frames, step=2.0,
                                     lidar_range=50.0, seed=0,
                                     img_hw=(448, 800))
    accum_cfg = cfg.AccumConfig(max_points_per_frame=65536, max_frames=32,
                                max_painted_points_per_frame=49152)
    model = SemSegTPU(seed=0)
    accum = NuScenesOracleSemanticPointCloudAccumulator(
        semseg_model=model,
        semseg_filters=(10, 11, 12, 16, 18),
        bev_params=dict(type='sem', view_size=80, pixel_size=256,
                        int_scaler=1., int_sep_scaler=30.,
                        int_mid_threshold=0.12),
        loc='synth', accum_cfg=accum_cfg, seed=0)
    frames = [stream.frame(i) for i in range(n_frames)]
    for i in range(4):
        accum.integrate([frames[i]])
    _ = accum.generate_bev(present_idx=2, bev_num=1, gen_future=True)
    jax.effects_barrier()
    t0 = time.perf_counter()
    n_samples = 0
    for i in range(4, n_frames):
        accum.integrate([frames[i]])
        bevs = accum.generate_bev(present_idx=len(accum.poses) - 2,
                                  bev_num=1, gen_future=True)
        n_samples += len(bevs)
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'nuscenes_oracle_bev_samples_per_sec_per_chip',
        'value': round(n_samples / dt, 3),
        'unit': 'samples/s',
        'vs_baseline': round(n_samples / dt / 50.0, 3),
    }))


def main():
    import jax
    import jax.numpy as jnp

    from pc_accumulation_lib_tpu import config as cfg
    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticKitti360Stream, make_calib)
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU

    n_frames = 24
    warmup_frames = 6
    stream = SyntheticKitti360Stream(n_frames=n_frames, step=2.0,
                                     lidar_range=60.0, seed=0,
                                     points_per_frame=45_000)  # ~121k/frame

    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum_cfg = cfg.AccumConfig(max_points_per_frame=131072, max_frames=32,
                                max_painted_points_per_frame=49152)
    icp_cfg = cfg.ICPConfig(max_downsampled=2048, num_iters=16)
    # Random rotate/translate/zoom + polynomial warp augmentation: each
    # sample yields bevs_per_sample distinct BEVs (BASELINE config 5).
    bev_params = dict(type='sem', view_size=80, pixel_size=256,
                      max_trans_radius=3.0, zoom_thresh=0.05, do_warp=True,
                      int_scaler=20., int_sep_scaler=20.,
                      int_mid_threshold=0.5, height_filter=None)
    bevs_per_sample = 8
    model = SemSegTPU(seed=0)
    accum = Kitti360SemanticPointCloudAccumulator(
        40.0, calib, 1e3, model, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, False, bev_params, accum_cfg=accum_cfg,
        icp_cfg=icp_cfg, seed=0, transfer_dtype='quantized')

    frames = [stream.frame(i) for i in range(n_frames)]

    # Warmup: triggers all compiles (semseg, paint, ICP, insert, raster).
    t_warm = time.perf_counter()
    for i in range(warmup_frames):
        accum.integrate([frames[i]])
    _ = accum.generate_bev(present_idx=len(accum.poses) - 2,
                           bev_num=bevs_per_sample, gen_future=True)
    jax.effects_barrier()
    # Cold compile cache: shorten the timed phase so the run still finishes
    # inside a driver timeout (steady-state rate is unaffected).
    if time.perf_counter() - t_warm > 240:
        n_frames = warmup_frames + 6

    # Timed steady-state: one integrate + bevs_per_sample augmented BEV
    # samples per iteration (semseg + ICP + accumulate + rasterize + warp).
    t0 = time.perf_counter()
    n_samples = 0
    for i in range(warmup_frames, n_frames):
        accum.integrate([frames[i]])
        bevs = accum.generate_bev(present_idx=len(accum.poses) - 2,
                                  bev_num=bevs_per_sample, gen_future=True)
        n_samples += len(bevs)
    jax.effects_barrier()
    dt = time.perf_counter() - t0

    samples_per_sec = n_samples / dt
    result = {
        'metric': 'e2e_bev_samples_per_sec_per_chip',
        'value': round(samples_per_sec, 3),
        'unit': 'samples/s',
        'vs_baseline': round(samples_per_sec / 50.0, 3),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    # Silence incidental prints from the pipeline; only the JSON line goes
    # to stdout.
    import builtins
    _orig_print = builtins.print
    builtins.print = lambda *a, **k: _orig_print(*a, file=sys.stderr, **k) \
        if not (a and isinstance(a[0], str) and a[0].startswith('{')) \
        else _orig_print(*a, **k)
    try:
        if len(sys.argv) > 1 and sys.argv[1] == 'nuscenes_oracle':
            bench_nuscenes_oracle()
        else:
            main()
    finally:
        builtins.print = _orig_print
