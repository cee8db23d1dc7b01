"""Phase-level TPU profiling for the bench hot path.

Times each device stage of the bench.py main loop in isolation on the real
chip (value-fetch timing — block_until_ready is a no-op through the
tunnel; see CLAUDE.md). Run: python tools/profile_step.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum.kitti360 import (
    Kitti360SemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.bev import core
from pc_accumulation_lib_tpu.dataloaders.synthetic import (
    SyntheticKitti360Stream, make_calib)
from pc_accumulation_lib_tpu.models.semseg import SemSegTPU


def timeit(label, fn, n=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:45s} {dt*1e3:8.2f} ms')
    return dt


def main():
    n_frames = 10
    stream = SyntheticKitti360Stream(n_frames=n_frames, step=2.0,
                                     lidar_range=60.0, seed=0,
                                     points_per_frame=45_000)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum_cfg = cfg.AccumConfig(max_points_per_frame=131072, max_frames=24,
                                max_painted_points_per_frame=49152)
    icp_cfg = cfg.ICPConfig(max_downsampled=4096, num_iters=16)
    bev_params = dict(type='sem', view_size=80, pixel_size=256,
                      max_trans_radius=3.0, zoom_thresh=0.05, do_warp=True,
                      int_scaler=20., int_sep_scaler=20.,
                      int_mid_threshold=0.5, height_filter=None,
                      fetch_dtype='sparse', sparse_cap=12288)
    model = SemSegTPU(seed=0)
    accum = Kitti360SemanticPointCloudAccumulator(
        40.0, calib, 1e3, model, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, False, bev_params, accum_cfg=accum_cfg,
        icp_cfg=icp_cfg, seed=0, transfer_dtype='quantized')
    frames = [stream.frame(i) for i in range(n_frames)]
    for i in range(n_frames):
        accum.integrate([frames[i]])

    gen = accum.sem_bev_generator

    # --- integrate step alone (dispatch + pose fetch) ---
    idx = [0]

    def integrate_once():
        accum.integrate([frames[idx[0] % n_frames]])
        idx[0] += 1
    t_int = timeit('integrate (fused step + pose fetch)', integrate_once)

    # how many valid painted points actually live in the buffer?
    n_valid_total = int(np.asarray(jnp.sum(accum.state.valid)))
    f, n, d = accum.state.points.shape
    print(f'buffer: {f}x{n} rows, {n_valid_total} valid painted points')

    # --- semseg forward alone ---
    rgb = np.asarray(frames[0][0], np.float32)

    @jax.jit
    def semseg_fwd(variables, img):
        logits = model.model.apply(variables, img[None], train=False)
        return jnp.argmax(logits, axis=-1)[0].sum()

    timeit('semseg forward (argmax-sum fetch)',
           lambda: np.asarray(semseg_fwd(model.variables,
                                         jnp.asarray(rgb))))

    # --- one raster, full buffer, compute only (scalar fetch) ---
    flat_pts = accum.state.points.reshape(f * n, d)
    flat_valid = accum.state.valid.reshape(f * n)
    pt_fids = jnp.repeat(accum.state.frame_ids, n)
    params = core.identity_params(
        T_ref_world=accum._ref_transform().astype(np.float32),
        bev_coords=np.zeros(3, np.float32),
        window=(accum.window_start, accum.frame_count - 1),
        present_frame=accum.frame_count - 2)
    packed = jnp.asarray(params.pack())

    raster = gen._raster

    @jax.jit
    def raster_sum(pts, valid, fids, inst_dyn, pk):
        out = raster(pts, valid, fids, inst_dyn, pk, True)
        s = out[0] if isinstance(out, tuple) else out
        return s.astype(jnp.float32).sum()

    timeit('raster x1 FULL buffer (compute, scalar fetch)',
           lambda: np.asarray(raster_sum(flat_pts, flat_valid, pt_fids,
                                         accum.state.inst_dyn, packed)))

    # --- one raster on compacted buffers of various sizes ---
    pts_np = np.asarray(flat_pts)
    valid_np = np.asarray(flat_valid)
    fids_np = np.asarray(pt_fids)
    order = np.argsort(~valid_np, kind='stable')
    for cap in (524288, 262144, 131072):
        sel = order[:cap]
        cp = jnp.asarray(pts_np[sel])
        cv = jnp.asarray(valid_np[sel])
        cf = jnp.asarray(fids_np[sel])
        timeit(f'raster x1 compacted {cap} (compute)',
               lambda cp=cp, cv=cv, cf=cf: np.asarray(
                   raster_sum(cp, cv, cf, accum.state.inst_dyn, packed)))

    # --- sparse fetch + decode of ONE sample ---
    out = raster(flat_pts, flat_valid, pt_fids, accum.state.inst_dyn,
                 packed, True)

    def fetch_one():
        sparse, dense = out
        raw = np.asarray(sparse)
        try:
            core.decode_sparse_stack(raw, True, 256, gen.sparse_cap,
                                     gen._sparse_empty)
        except core.SparseOverflow:
            np.asarray(dense)
    timeit('sparse fetch+decode x1 (cached device val)', fetch_one)

    # decode only (host)
    raw = np.asarray(out[0])
    timeit('sparse decode only (host numpy)',
           lambda: core.decode_sparse_stack(raw, True, 256, gen.sparse_cap,
                                            gen._sparse_empty))

    # --- 8-sample generate (the real per-step BEV cost, sync) ---
    def gen8():
        accum.generate_bev(present_idx=len(accum.poses) - 2, bev_num=8,
                           gen_future=True)
    timeit('generate_bev x8 (dispatch+fetch, sync)', gen8, n=3)


if __name__ == '__main__':
    main()
