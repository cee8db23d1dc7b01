"""Harvest-side breakdown of the bench steady state: per-step dispatch
time, per-group transfer waits, and decode/assemble CPU time — the three
candidate walls (tunnel turnarounds, wire bytes, one-core host work).

Run: python tools/profile_harvest.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum.kitti360 import (
    Kitti360SemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.dataloaders.synthetic import (
    FULL_IMG_H, FULL_IMG_W, SyntheticKitti360Stream, make_calib)
from pc_accumulation_lib_tpu.models.semseg import SemSegTPU


def main():
    n_frames = 16
    warmup = 6
    img_hw = (FULL_IMG_H, FULL_IMG_W)
    stream = SyntheticKitti360Stream(n_frames=n_frames, step=2.0,
                                     lidar_range=60.0, seed=0,
                                     points_per_frame=45_000, img_hw=img_hw)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib(img_hw)
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    # Painted cap relaxed vs bench: the synthetic scene depends on
    # n_frames, and this short stream paints more per frame.
    accum_cfg = cfg.AccumConfig(max_points_per_frame=131072, max_frames=26,
                                max_painted_points_per_frame=49152)
    icp_cfg = cfg.ICPConfig(max_downsampled=4096, num_iters=16)
    bev_params = dict(type='sem', view_size=80, pixel_size=256,
                      max_trans_radius=3.0, zoom_thresh=0.05, do_warp=True,
                      int_scaler=20., int_sep_scaler=20.,
                      int_mid_threshold=0.5, height_filter=None,
                      fetch_dtype='sparse',
                      sparse_cap=(20480, 10240, 10240))
    model = SemSegTPU(seed=0)
    accum = Kitti360SemanticPointCloudAccumulator(
        40.0, calib, 1e3, model, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, False, bev_params, accum_cfg=accum_cfg,
        icp_cfg=icp_cfg, seed=0, transfer_dtype='quantized')
    frames = [stream.frame(i) for i in range(n_frames)]

    accum.integrate([frames[0]])
    for i in range(1, warmup):
        accum.step([frames[i]], bev_num=16, gen_future=True)
    jax.effects_barrier()
    gen = accum.sem_bev_generator

    # Steady state mirrors bench.py: depth-2 queue, one worker.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    futs = deque()
    t0 = time.perf_counter()
    n = 0
    cpu_prev = time.process_time()
    wall_prev = time.perf_counter()
    with ThreadPoolExecutor(max_workers=1) as ex:
        for i in range(warmup, n_frames):
            td = time.perf_counter()
            handle = accum.step([frames[i]], bev_num=16, gen_future=True,
                                async_fetch=True)
            disp = time.perf_counter() - td
            futs.append((i, disp, ex.submit(handle)))
            if len(futs) > 2:
                j, d, f = futs.popleft()
                tw = time.perf_counter()
                n += len(f.result())
                wait = time.perf_counter() - tw
                h = gen.last_harvest
                cpu_now, wall_now = time.process_time(), time.perf_counter()
                print(f'step {j}: dispatch {d*1e3:6.1f} ms | main-wait '
                      f'{wait*1e3:6.1f} | finalize wall {h["wall_s"]*1e3:6.1f}'
                      f' | group waits {[round(w*1e3,1) for w in h["waits"]]}'
                      f' | work {h["work_s"]*1e3:6.1f} ms'
                      f' | resolve {h.get("resolved_by")} '
                      f'{h.get("resolve_wait_s", 0)*1e3:5.1f} ms'
                      f' | wire {h.get("wire_bytes", 0)/1e6:.2f} MB'
                      f' | step CPU {(cpu_now-cpu_prev)*1e3:6.1f}'
                      f' / wall {(wall_now-wall_prev)*1e3:6.1f} ms')
                cpu_prev, wall_prev = cpu_now, wall_now
        while futs:
            j, d, f = futs.popleft()
            n += len(f.result())
    dt = time.perf_counter() - t0
    print(f'{n / dt:.2f} samples/s over {n} samples')


if __name__ == '__main__':
    main()
