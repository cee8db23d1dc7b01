"""Measure the ACTUAL reference CPU pipeline on the bench workload.

BASELINE.json's secondary target is ">=100x speedup vs the reference CPU
path"; this tool turns that claim into a measured number. It imports the
reference code itself (read-only at /root/reference) and times its two
per-sample hot paths on the same synthetic scale `bench.py` runs at:

  * `SemBEVGenerator.generate_rand_aug` — per-cell Python median loops
    (bev_generator/sem_bev.py:619-669), min-z loops (:535-554), dense-warp
    double loop (bev_generator/bev_generator.py:482-525);
  * `SemanticPointCloudAccumulator.update_sem_pcs` — the O(frames.points)
    per-frame history re-transform (sem_pc_accum.py:167-183), amortized
    over bevs_per_sample like bench.py's integrate.

ICP (Open3D) and semseg (ONNX Runtime) are NOT timed — those packages are
absent here — so the reference numbers below are a strict UNDERESTIMATE of
its real per-sample cost; the resulting speedup ratio is a lower bound.

Run: python tools/bench_reference.py [tpu_samples_per_sec]
(default comparison point: the most recent BENCH_r*.json in the repo root)

Writes nothing; prints JSON lines. Record the output in PERF_NOTES.md.
"""
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), '..')
REF_PATH = '/root/reference'
sys.path.insert(0, REF_PATH)

# Bench workload scale (bench.py main): ~21 live frames of <=49152 painted
# points at steady state (~961k in-crop points), present_idx = newest-1 so
# the future split is one frame. bevs_per_sample amortizes integrate.
N_FRAMES = 21
PTS_PER_FRAME = 45_700
BEVS_PER_SAMPLE = 16
VIEW, P = 80.0, 256
SEM_IDXS = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15, 'motorcycle': 17}


def make_cloud(rng, n):
    pc = np.zeros((n, 10))
    pc[:, 0:2] = rng.uniform(-40, 40, size=(n, 2))
    pc[:, 2] = rng.uniform(-1.8, 3, size=n)
    pc[:, 3] = rng.uniform(0, 1, size=n)
    pc[:, 4:7] = rng.integers(0, 256, size=(n, 3))
    pc[:, 7] = rng.choice([0, 1, 2, 13, 14, 15, 17], size=n)
    return pc


def time_generate(rng, n_samples=2):
    """Reference BEV generation per augmented sample (bench aug config:
    rotate/translate/zoom + polynomial warp, 3 time splits)."""
    from bev_generator.sem_bev import SemBEVGenerator as RefGen
    gen = RefGen(SEM_IDXS, VIEW, P, max_trans_radius=3.0, zoom_thresh=0.05,
                 do_warp=True, int_scaler=20., int_sep_scaler=20.,
                 int_mid_threshold=0.5, height_filter=None)
    pc_present = make_cloud(rng, (N_FRAMES - 1) * PTS_PER_FRAME)
    pc_future = make_cloud(rng, PTS_PER_FRAME)
    pcs = {'pc_present': pc_present, 'pc_future': pc_future,
           'pc_full': np.concatenate([pc_present, pc_future])}
    ego_p = np.stack([np.linspace(-30, 0, 16), np.zeros(16),
                      np.zeros(16)], 1)
    ego_f = np.stack([np.linspace(0, 2, 2), np.zeros(2), np.zeros(2)], 1)
    trajs = {'ego_traj_present': ego_p, 'other_trajs_present': [],
             'ego_traj_future': ego_f, 'other_trajs_future': [],
             'ego_traj_full': np.concatenate([ego_p, ego_f]),
             'other_trajs_full': []}
    ts = []
    for _ in range(n_samples):
        # The reference mutates pcs/trajs in place — fresh copies per call.
        pcs_i = {k: np.array(v, copy=True) for k, v in pcs.items()}
        trajs_i = {k: (np.array(v, copy=True) if not isinstance(v, list)
                       else [np.array(t, copy=True) for t in v])
                   for k, v in trajs.items()}
        t0 = time.perf_counter()
        gen.generate_rand_aug(pcs_i, trajs_i, do_warping=True)
        ts.append(time.perf_counter() - t0)
        print(f'  reference generate_rand_aug: {ts[-1]:.1f}s',
              file=sys.stderr, flush=True)
    return min(ts)


def time_integrate(rng, n_iters=3):
    """Reference per-frame accumulation bookkeeping: the history
    re-transform update_sem_pcs + update_poses + remove_observations
    (sem_pc_accum.py:156-209), on a full 21-frame window. Instantiating
    the abstract accumulator needs Open3D/ONNX, so the methods are timed
    on a minimal stand-in object carrying the same state lists."""
    # sem_pc_accum imports open3d/onnxruntime/torchvision at module scope;
    # the timed methods (update_poses/update_sem_pcs/remove_observations)
    # never touch them, so satisfy the imports with stubs when absent.
    from unittest import mock
    for name in ('open3d', 'onnxruntime', 'torchvision',
                 'torchvision.transforms'):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = mock.MagicMock(name=name)
    from sem_pc_accum import SemanticPointCloudAccumulator as RefAccum
    host = RefAccum.__new__(RefAccum)  # no __init__: skip Open3D/ONNX deps
    host.horizon_dist = 40.0
    T = np.eye(4)
    T[:3, 3] = [-1.9, 0.02, 0.0]
    ts = []
    for _ in range(n_iters):
        host.sem_pcs = [make_cloud(rng, PTS_PER_FRAME)
                        for _ in range(N_FRAMES)]
        host.poses = [[1.9 * i, 0.0, 0.0] for i in range(N_FRAMES)]
        host.seg_dists = [1.9] * (N_FRAMES - 1)
        host.rgbs = [None] * N_FRAMES
        host.semsegs = [None] * N_FRAMES
        t0 = time.perf_counter()
        host.update_poses(T)
        host.update_sem_pcs(T)
        host.remove_observations()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    if len(sys.argv) > 1:
        tpu = float(sys.argv[1])
        tpu_src = 'argv'
    else:
        benches = sorted(glob.glob(os.path.join(REPO, 'BENCH_r*.json')))
        with open(benches[-1]) as f:
            tpu = json.load(f)['value']
        tpu_src = os.path.basename(benches[-1])

    t_int = time_integrate(rng)
    print(f'reference integrate bookkeeping (21x45.7k pts): {t_int:.3f}s',
          file=sys.stderr, flush=True)
    t_gen = time_generate(rng)

    t_sample = t_gen + t_int / BEVS_PER_SAMPLE
    ref_sps = 1.0 / t_sample
    ncores = os.cpu_count() or 1
    pool_sps = ref_sps * min(ncores, BEVS_PER_SAMPLE)
    for line in (
        {'metric': 'reference_cpu_generate_sec_per_sample',
         'value': round(t_gen, 3), 'unit': 's'},
        {'metric': 'reference_cpu_samples_per_sec', 'value': round(ref_sps, 4),
         'unit': 'samples/s (single process; no ICP/semseg cost included)'},
        {'metric': 'reference_cpu_samples_per_sec_pool_bound',
         'value': round(pool_sps, 4),
         'unit': f'samples/s (optimistic Pool({min(ncores, BEVS_PER_SAMPLE)})'
                 ' linear-scaling bound)'},
        {'metric': 'tpu_vs_reference_speedup', 'value': round(tpu / ref_sps, 1),
         'unit': f'x (tpu {tpu} samples/s from {tpu_src})'},
        {'metric': 'tpu_vs_reference_pool_speedup',
         'value': round(tpu / pool_sps, 1), 'unit': 'x (vs Pool bound)'},
    ):
        print(json.dumps(line), flush=True)


if __name__ == '__main__':
    main()
