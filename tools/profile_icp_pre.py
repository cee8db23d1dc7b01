"""Time the ICP preprocess (voxel ds + normals) on the real TPU.

Compares the fused preprocess at bench shape; run before/after kNN or
eigendecomposition changes. Run: python tools/profile_icp_pre.py
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
from pc_accumulation_lib_tpu.ops import icp as icp_ops


def timeit(label, fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:46s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def main():
    icfg = cfg.ICPConfig(max_downsampled=4096, num_iters=16)
    pre = icp_ops.make_preprocess_fn(icfg.downsample_voxel,
                                     icfg.max_downsampled,
                                     icfg.normal_neighbors)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, size=(131072, 3)).astype(np.float32)
    pts_d = jnp.asarray(pts)  # resident: excludes upload from the timing
    valid = jnp.asarray(np.arange(131072) < 121000)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    @jax.jit
    def pre_sum(p, v):
        c = pre(p, v)
        return c.points.sum() + c.normals.sum()

    t = timeit('ICP preprocess (device-resident input)',
               lambda: np.asarray(pre_sum(pts_d, valid)))
    print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
