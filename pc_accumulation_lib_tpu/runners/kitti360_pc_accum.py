"""KITTI-360 accumulation demo: integrate a clip and export the semantic
vector space.

Counterpart of run_kitti360_pc_accum.py — which is a broken/stale demo in
the reference (it instantiates the abstract base with a stale signature,
reference run_kitti360_pc_accum.py:69-77). This version works: it
accumulates observations and writes a PLY point cloud + pose path instead
of opening an interactive Open3D window (offscreen-friendly).
"""
from __future__ import annotations

import argparse

import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.runners.kitti360_bev_gen import (
    build_calib_params)
from pc_accumulation_lib_tpu.utils.ply import write_ply


def export_vector_space(accum, out_path: str):
    """Fetch the accumulated world-frame cloud and write PLY + poses."""
    pts = np.asarray(accum.state.points).reshape(-1, cfg.PT_DIM)
    valid = np.asarray(accum.state.valid).reshape(-1)
    fids = np.repeat(np.asarray(accum.state.frame_ids),
                     accum.state.points.shape[1])
    keep = valid & (fids >= accum.window_start)
    pts = pts[keep]
    write_ply(out_path, pts[:, :3], pts[:, cfg.PT_R:cfg.PT_B + 1])
    np.savetxt(out_path + '.poses.txt', np.array(accum.poses))
    return pts.shape[0]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('kitti360_path', type=str)
    parser.add_argument('semseg_model_path', type=str, nargs='?', default='')
    parser.add_argument('--accum_horizon_dist', type=float, default=200)
    parser.add_argument('--icp_threshold', type=float, default=1e3)
    parser.add_argument('--use_gt_sem', action='store_true')
    parser.add_argument('--num_frames', type=int, default=20)
    parser.add_argument('--sequence', type=str,
                        default='2013_05_28_drive_0000_sync')
    parser.add_argument('--start_idx', type=int, default=130)
    parser.add_argument('--out', type=str, default='sem_vec_space.ply')
    args = parser.parse_args(argv)

    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.kitti360 import (
        Kitti360Dataloader)

    semseg_model = None
    if not args.use_gt_sem:
        from pc_accumulation_lib_tpu.models.semseg import load_semseg_model
        semseg_model = load_semseg_model(args.semseg_model_path)

    calib = build_calib_params(args.kitti360_path)
    accum = Kitti360SemanticPointCloudAccumulator(
        args.accum_horizon_dist, calib, args.icp_threshold, semseg_model,
        cfg.DEFAULT_SEMSEG_FILTERS, cfg.DEFAULT_SEM_IDXS, args.use_gt_sem,
        {'type': 'sem'})
    dataloader = Kitti360Dataloader(
        args.kitti360_path, 1, [args.sequence], [args.start_idx],
        [args.start_idx + args.num_frames])
    for observations in dataloader:
        accum.integrate(observations)
    n = export_vector_space(accum, args.out)
    print(f'Wrote {n} points to {args.out}')


if __name__ == '__main__':
    main()
