"""KITTI-360 BEV dataset generation entry point.

Counterpart of run_kitti360_bev_gen.py (reference :23-273): streams
observations, integrates them into the accumulator, applies the
three-condition BEV sampling policy, and writes gzip-pickled BEV dicts plus
visualization PNGs in subdirNNN/bev_NNN.pkl shards.

Library use: call run(...); CLI: python -m
pc_accumulation_lib_tpu.runners.kitti360_bev_gen <root> [<semseg_model>].
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum.kitti360 import (
    Kitti360SemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.dataloaders.kitti360 import (
    Kitti360Dataloader, get_camera_intrinsics, get_transf_matrices)
from pc_accumulation_lib_tpu.utils.io import write_compressed_pickle


def build_calib_params(kitti360_path: str) -> dict:
    """Assemble projection matrices (run_kitti360_bev_gen.py:101-119)."""
    h_cam_velo, h_velo_cam = get_transf_matrices(kitti360_path)
    p_cam_frame = get_camera_intrinsics(kitti360_path)
    p_velo_frame = np.matmul(p_cam_frame, h_velo_cam)
    return {
        'h_velo_cam': h_velo_cam,
        'p_cam_frame': p_cam_frame,
        'p_velo_frame': p_velo_frame,
        'c_x': p_cam_frame[0, 2], 'c_y': p_cam_frame[1, 2],
        'f_x': p_cam_frame[0, 0], 'f_y': p_cam_frame[1, 1],
    }


def sampling_loop(sem_pc_accum, dataloader, sampling: cfg.SamplingConfig,
                  output: cfg.OutputConfig, gen_future: bool = True,
                  batch_size: int = 1, on_bev=None,
                  start_count: int = 0) -> dict:
    """Integrate + sample + write loop (run_kitti360_bev_gen.py:178-273).

    Returns counters {frames, bevs} (bevs = NEW samples this call).
    ``on_bev(bev, path)`` optional hook. ``start_count`` seats the
    sequential subdirNNN/bev_NNN numbering after previously-written
    samples, so a manifest-resumed job continues (and, for a unit that
    crashed mid-way, byte-identically overwrites) the numbering of the
    run it replaces."""
    from pc_accumulation_lib_tpu.utils.profiling import PhaseTimer
    timer = PhaseTimer()
    bev_idx = start_count % output.subdir_size
    subdir_idx = start_count // output.subdir_size
    bev_count = 0
    previous_idx = 0
    frames = 0
    writer = None
    if output.async_io:
        from pc_accumulation_lib_tpu.utils.async_writer import (
            AsyncPickleWriter)
        writer = AsyncPickleWriter()
    for sample_idx, observations in enumerate(dataloader):
        with timer.phase('integrate'):
            num_obs_removed = sem_pc_accum.integrate(observations)
        frames += len(observations)
        previous_idx -= num_obs_removed
        previous_idx = max(previous_idx, 0)

        if len(sem_pc_accum.poses) < 2:
            continue
        incr_path_dists = sem_pc_accum.get_incremental_path_dists()

        # Condition (1): sufficient distance to backward horizon.
        if incr_path_dists[-1] < sampling.bev_horizon_dist:
            continue
        # Find 'present' index position.
        dists = incr_path_dists - sampling.bev_horizon_dist
        present_idx = int((dists > 0).argmax())
        # Condition (2): sufficient distance from present to future horizon.
        fut_dist = incr_path_dists[-1] - incr_path_dists[present_idx]
        if fut_dist < sampling.bev_horizon_dist:
            continue
        # Condition (3): sufficient distance from the previous sample.
        pose_0 = sem_pc_accum.get_pose(previous_idx)
        pose_1 = sem_pc_accum.get_pose(present_idx)
        if sem_pc_accum.dist(pose_0, pose_1) < \
                sampling.bev_dist_between_samples:
            continue
        previous_idx = present_idx

        print(f'{sample_idx * batch_size} | {bev_count} |',
              f' back {incr_path_dists[present_idx]:.1f} |',
              f'front {fut_dist:.1f}')

        with timer.phase('generate_bev'):
            bevs = sem_pc_accum.generate_bev(present_idx,
                                             sampling.bevs_per_sample,
                                             gen_future=gen_future)
        rgbs = sem_pc_accum.get_rgb(present_idx)
        semsegs = sem_pc_accum.get_semseg(present_idx)

        for bev in bevs:
            if bev_idx >= output.subdir_size:
                bev_idx = 0
                subdir_idx += 1
            filename = f'bev_{bev_idx:03d}.pkl'
            output_path = os.path.join(output.output_dir,
                                       f'subdir{subdir_idx:03d}')
            os.makedirs(output_path, exist_ok=True)
            with timer.phase('write'):
                if writer is not None:
                    writer.write(bev, filename, output_path)
                else:
                    write_compressed_pickle(bev, filename, output_path)
            if output.viz_to_disk:
                viz_file = os.path.join(output_path, f'viz_{bev_idx:03d}.png')
                with timer.phase('viz'):
                    sem_pc_accum.viz_bev(bev, viz_file, rgbs, semsegs)
            if on_bev is not None:
                on_bev(bev, os.path.join(output_path, filename))
            bev_idx += 1
            bev_count += 1
    if writer is not None:
        with timer.phase('write_drain'):
            writer.wait()
    if bev_count:
        print('--- phase timing ---')
        print(timer.report())
    return {'frames': frames, 'bevs': bev_count}


def run(kitti360_path: str, semseg_model=None, use_gt_sem: bool = False,
        sequences=None, start_idxs=None, end_idxs=None,
        accum_horizon_dist: float = 200.0, icp_threshold: float = 1e3,
        bev_params: Optional[dict] = None,
        sampling: Optional[cfg.SamplingConfig] = None,
        output: Optional[cfg.OutputConfig] = None,
        accum_cfg: Optional[cfg.AccumConfig] = None,
        icp_cfg: Optional[cfg.ICPConfig] = None,
        seed: Optional[int] = None,
        img_transfer: Optional[str] = None,
        pc_transfer: str = 'float32') -> dict:
    sequences = list(sequences or cfg.KITTI360_SEQUENCES)
    start_idxs = list(start_idxs or cfg.KITTI360_START_IDXS)
    end_idxs = list(end_idxs or cfg.KITTI360_END_IDXS)
    sampling = sampling or cfg.SamplingConfig()
    output = output or cfg.OutputConfig()
    bev_params = bev_params or {
        'type': 'sem', 'view_size': 80, 'pixel_size': 256,
        'max_trans_radius': 0., 'zoom_thresh': 0., 'do_warp': False,
        'int_scaler': 20., 'int_sep_scaler': 20., 'int_mid_threshold': 0.5,
        'height_filter': None,
    }

    calib_params = build_calib_params(kitti360_path)
    sem_pc_accum = Kitti360SemanticPointCloudAccumulator(
        accum_horizon_dist, calib_params, icp_threshold, semseg_model,
        cfg.DEFAULT_SEMSEG_FILTERS, cfg.DEFAULT_SEM_IDXS, use_gt_sem,
        bev_params, accum_cfg=accum_cfg, icp_cfg=icp_cfg, seed=seed,
        img_transfer=img_transfer, transfer_dtype=pc_transfer)
    dataloader = Kitti360Dataloader(kitti360_path, 1, sequences, start_idxs,
                                    end_idxs)
    stats = sampling_loop(sem_pc_accum, dataloader, sampling, output)
    # Surface any deferred tile-raster overflow checks before reporting
    # success (parallel/sharded.make_tile_sharded_raster_fn defers them).
    if sem_pc_accum.sem_bev_generator is not None:
        sem_pc_accum.sem_bev_generator.close()
    return stats


def run_sharded(kitti360_path: str, semseg_model=None,
                use_gt_sem: bool = False, sequences=None, start_idxs=None,
                end_idxs=None, accum_horizon_dist: float = 200.0,
                icp_threshold: float = 1e3,
                bev_params: Optional[dict] = None,
                sampling: Optional[cfg.SamplingConfig] = None,
                output: Optional[cfg.OutputConfig] = None,
                accum_cfg: Optional[cfg.AccumConfig] = None,
                icp_cfg: Optional[cfg.ICPConfig] = None,
                seed: Optional[int] = None,
                manifest_path: Optional[str] = None, shard_idx: int = 0,
                num_shards: int = 1, on_bev=None,
                img_transfer: Optional[str] = None,
                pc_transfer: str = 'float32') -> dict:
    """Scene-sharded, manifest-resumable dataset job.

    Each sequence is an independent work unit processed with a FRESH
    accumulator (replacing the reference's manual per-process scene
    sharding, run_nuscenes_bev_gen.py:44-45,165, applied to the KITTI
    flow): units are strided across ``num_shards`` via
    parallel/manifest.shard_units, completed units are recorded in a
    JSONL manifest, and a restarted job resumes exactly the pending
    units. The sequential subdirNNN/bev_NNN numbering continues from the
    manifest's recorded per-unit output counts, so a unit that crashed
    mid-way is re-generated over the same filenames (per-unit seeding
    makes the rewrite byte-identical; tests/test_job_multichip.py).
    With ``num_shards > 1`` each shard writes under its own
    ``shardNN/`` subtree of output_dir (shards share the manifest file
    but never a filename). Works with multi-chip ``bev_params['mesh']``
    point-sharded rasters — one mesh job per shard/host.
    """
    from pc_accumulation_lib_tpu.parallel.manifest import (
        CompletionManifest, shard_units)
    sequences = list(sequences or cfg.KITTI360_SEQUENCES)
    start_idxs = list(start_idxs or cfg.KITTI360_START_IDXS)
    end_idxs = list(end_idxs or cfg.KITTI360_END_IDXS)
    sampling = sampling or cfg.SamplingConfig()
    output = output or cfg.OutputConfig()
    if num_shards > 1:
        import dataclasses
        output = dataclasses.replace(
            output, output_dir=os.path.join(output.output_dir,
                                            f'shard{shard_idx:02d}'))
    manifest = CompletionManifest(manifest_path) if manifest_path else None
    spans = {seq: (s, e)
             for seq, s, e in zip(sequences, start_idxs, end_idxs)}

    mine_all = [u for i, u in enumerate(sequences)
                if i % num_shards == shard_idx]
    pending = shard_units(sequences, shard_idx, num_shards, manifest)
    # Seat the sequential numbering after every sample this shard already
    # wrote (completed units only; a mid-unit crash re-runs that unit
    # over the same indices).
    done_count = 0
    if manifest is not None:
        for u in mine_all:
            rec = manifest.get(u)
            if rec is not None:
                done_count += int(rec.get('bevs', 0))

    calib_params = build_calib_params(kitti360_path)
    total_frames, total_new = 0, 0
    for unit in pending:
        s, e = spans[unit]
        sem_pc_accum = Kitti360SemanticPointCloudAccumulator(
            accum_horizon_dist, calib_params, icp_threshold, semseg_model,
            cfg.DEFAULT_SEMSEG_FILTERS, cfg.DEFAULT_SEM_IDXS, use_gt_sem,
            bev_params, accum_cfg=accum_cfg, icp_cfg=icp_cfg, seed=seed,
            img_transfer=img_transfer, transfer_dtype=pc_transfer)
        dataloader = Kitti360Dataloader(kitti360_path, 1, [unit], [s], [e])
        stats = sampling_loop(sem_pc_accum, dataloader, sampling, output,
                              on_bev=on_bev,
                              start_count=done_count + total_new)
        total_frames += stats['frames']
        total_new += stats['bevs']
        # Surface any deferred tile-raster overflow checks (the last few
        # rasters' counters) BEFORE recording the unit complete: a raised
        # TileRouteOverflow must leave the unit pending for the resume.
        if sem_pc_accum.sem_bev_generator is not None:
            sem_pc_accum.sem_bev_generator.close()
        if manifest is not None:
            manifest.mark_done(unit, bevs=stats['bevs'])
    return {'frames': total_frames, 'bevs': total_new,
            'units': list(pending), 'resumed_at': done_count}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('kitti360_path', type=str)
    parser.add_argument('semseg_model_path', type=str, nargs='?', default='')
    parser.add_argument('--accum_horizon_dist', type=float, default=200)
    parser.add_argument('--use_gt_sem', action='store_true')
    parser.add_argument('--bev_output_dir', type=str, default='bevs')
    parser.add_argument('--bevs_per_sample', type=int, default=1)
    parser.add_argument('--bev_horizon_dist', type=float, default=80)
    parser.add_argument('--bev_dist_between_samples', type=float, default=1.)
    parser.add_argument('--bev_type', type=str, default='sem')
    parser.add_argument('--bev_view_size', type=float, default=80)
    parser.add_argument('--bev_pixel_size', type=int, default=256)
    parser.add_argument('--bev_max_trans_radius', type=float, default=0)
    parser.add_argument('--bev_zoom_thresh', type=float, default=0)
    parser.add_argument('--bev_do_warp', action='store_true')
    parser.add_argument('--int_scaler', type=float, default=20)
    parser.add_argument('--int_sep_scaler', type=float, default=20)
    parser.add_argument('--int_mid_threshold', type=float, default=0.5)
    parser.add_argument('--height_filter', type=float, default=None)
    parser.add_argument('--icp_threshold', type=float, default=1e3)
    parser.add_argument('--no_viz', action='store_true')
    # Camera-image wire encoding for remote-TPU links (ops/imgcodec.py):
    # 'yuv420' halves the image upload bytes (lossy by chroma
    # quantization only; grayscale exact); 'yuv420h' halves it again
    # (4-bit Haar luma + 4x4 chroma — ops/imgcodec.py).
    parser.add_argument('--img_transfer', type=str, default='rgb8',
                        choices=('rgb8', 'yuv420', 'yuv420h'))
    # Point wire encoding: packed 7 B/point upload (5 mm fixed point;
    # accum/kitti360.py _pad_pc) vs float32 rows.
    parser.add_argument('--pc_transfer', type=str, default='float32',
                        choices=('float32', 'quantized'))
    # Scene-sharded resumable job (run_sharded): per-sequence work units,
    # JSONL completion manifest, strided shard of the unit list.
    parser.add_argument('--manifest', type=str, default=None)
    parser.add_argument('--shard_idx', type=int, default=0)
    parser.add_argument('--num_shards', type=int, default=1)
    # Multi-host bring-up (jax.distributed; SURVEY.md section 5). Each
    # process runs its own scene shard; the resumable manifest
    # (parallel/manifest.py) deduplicates across restarts.
    parser.add_argument('--coordinator_address', type=str, default=None)
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    args = parser.parse_args(argv)

    from pc_accumulation_lib_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(args.coordinator_address, args.num_processes,
                         args.process_id)

    semseg_model = None
    if not args.use_gt_sem:
        from pc_accumulation_lib_tpu.models.semseg import load_semseg_model
        semseg_model = load_semseg_model(args.semseg_model_path)

    bev_params = {
        'type': args.bev_type, 'view_size': args.bev_view_size,
        'pixel_size': args.bev_pixel_size,
        'max_trans_radius': args.bev_max_trans_radius,
        'zoom_thresh': args.bev_zoom_thresh, 'do_warp': args.bev_do_warp,
        'int_scaler': args.int_scaler,
        'int_sep_scaler': args.int_sep_scaler,
        'int_mid_threshold': args.int_mid_threshold,
        'height_filter': args.height_filter,
    }
    entry = run_sharded if (args.manifest or args.num_shards > 1) else run
    extra = ({'manifest_path': args.manifest, 'shard_idx': args.shard_idx,
              'num_shards': args.num_shards}
             if entry is run_sharded else {})
    stats = entry(
        args.kitti360_path, semseg_model, args.use_gt_sem,
        accum_horizon_dist=args.accum_horizon_dist,
        icp_threshold=args.icp_threshold, bev_params=bev_params,
        sampling=cfg.SamplingConfig(args.bev_horizon_dist,
                                    args.bev_dist_between_samples,
                                    args.bevs_per_sample),
        output=cfg.OutputConfig(args.bev_output_dir,
                                viz_to_disk=not args.no_viz),
        img_transfer=args.img_transfer, pc_transfer=args.pc_transfer,
        **extra)
    print(stats)


if __name__ == '__main__':
    main()
