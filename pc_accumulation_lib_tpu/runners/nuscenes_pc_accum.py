"""NuScenes accumulation demo (run_nuscenes_pc_accum.py counterpart — the
reference version calls the accumulator with a stale signature,
run_nuscenes_pc_accum.py:57-64; this one works): accumulate one scene with
oracle poses and export the semantic vector space as PLY."""
from __future__ import annotations

import argparse

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.runners.kitti360_pc_accum import (
    export_vector_space)
from pc_accumulation_lib_tpu.runners.nuscenes_bev_gen import NUSCENES_FILTERS


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('nuscenes_path', type=str)
    parser.add_argument('semseg_model_path', type=str, nargs='?', default='')
    parser.add_argument('--nuscenes_version', type=str, default='v1.0-mini')
    parser.add_argument('--scene_idx', type=int, default=0)
    parser.add_argument('--num_sweeps', type=int, default=1)
    parser.add_argument('--out', type=str, default='sem_vec_space.ply')
    args = parser.parse_args(argv)

    from nuscenes.nuscenes import NuScenes

    from pc_accumulation_lib_tpu.accum.nuscenes_oracle import (
        NuScenesOracleSemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.nuscenes import (
        NuScenesDataloader)
    from pc_accumulation_lib_tpu.models.semseg import load_semseg_model

    semseg_model = load_semseg_model(args.semseg_model_path)
    nusc = NuScenes(dataroot=args.nuscenes_path,
                    version=args.nuscenes_version)
    log = nusc.get('log', nusc.scene[args.scene_idx]['log_token'])
    accum = NuScenesOracleSemanticPointCloudAccumulator(
        semseg_model, NUSCENES_FILTERS, cfg.DEFAULT_SEM_IDXS, False,
        {'type': 'sem'}, log['location'])
    dataloader = NuScenesDataloader(nusc, [args.scene_idx], 1,
                                    args.num_sweeps)
    for observations in dataloader:
        accum.integrate(observations)
    n = export_vector_space(accum, args.out)
    print(f'Wrote {n} points to {args.out}')


if __name__ == '__main__':
    main()
