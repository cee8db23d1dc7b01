"""Attribute raster cost to its pieces on the real TPU.

Times each stage of the sort raster (ops/sort_raster.py + bev/core.py)
standalone at bench shape (1179648 rows). First run compiles several new
kernels (slow through the tunnel, then cached).

NOTE: the sort variants here reflect the ROUND-2 configuration (5-operand
sorts, 12288 sparse cap) — kept unchanged so numbers stay comparable to
the PERF_NOTES round-2 cost model. The production path is the 3-operand
packed sort + prepped raster (ops/sort_raster.split_stats_from_packed);
use tools/profile_step.py for current end-to-end stage times.
Run: python tools/profile_raster_pieces.py
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

from pc_accumulation_lib_tpu.ops import pallas_stats
from pc_accumulation_lib_tpu.ops import warp as warp_ops


def timeit(label, fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:52s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def main():
    N = 1179648
    P = 256
    sent = P * P * 2
    rng = np.random.default_rng(0)
    c2 = np.sort(rng.integers(0, sent, size=N)).astype(np.int32)
    z = rng.uniform(-2, 5, N).astype(np.float32)
    inten = rng.uniform(0, 1, N).astype(np.float32)
    road = (rng.random(N) < 0.5).astype(np.float32)
    dyn = (rng.random(N) < 0.1).astype(np.float32)
    val = rng.integers(0, 256, N).astype(np.int32)

    c2_d, z_d = jnp.asarray(c2), jnp.asarray(z)
    int_d, road_d, dyn_d = (jnp.asarray(inten), jnp.asarray(road),
                            jnp.asarray(dyn))
    val_d = jnp.asarray(val)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    @jax.jit
    def sort5_k2(c, zz, ii, rr, dd):
        o = jax.lax.sort((c, zz, ii, rr, dd), num_keys=2)
        return o[1][0] + o[2][1] + o[3][2] + o[4][3]

    @jax.jit
    def sort5_k1(c, zz, ii, rr, dd):
        o = jax.lax.sort((c, zz, ii, rr, dd), num_keys=1)
        return o[1][0] + o[2][1] + o[3][2] + o[4][3]

    @jax.jit
    def sort2_k1(c, pp):
        o = jax.lax.sort((c, pp), num_keys=1)
        return o[1][0]

    @jax.jit
    def sort1(k):
        return jnp.sort(k)[0]

    @jax.jit
    def pallas_sums(sc, zz, ii, rr, dd):
        sums, zmin = pallas_stats.segmented_stats(
            sc, [jnp.ones_like(rr), rr, dd, ii], zz, sent)
        return sums.sum() + zmin[0]

    @jax.jit
    def warp24(m, a1, a2, b1, b2):
        return warp_ops.warp_dense_maps(m, a1, a2, b1, b2).sum()

    maps = jnp.asarray(rng.random((24, P, P)).astype(np.float32))

    @jax.jit
    def pack_sparse_like(dense, counts):
        from pc_accumulation_lib_tpu.bev import core
        words = core._pack_channel_words(dense, 3, P * P)
        caps = core.resolve_sparse_caps(12288)
        return core._pack_sparse(words, counts, P, caps, 3).sum()

    dense = jnp.asarray(rng.random((21, P, P)).astype(np.float16))
    counts = jnp.asarray(
        (rng.random((3, P, P)) < 0.2).astype(np.float32))

    def corr(label, fn):
        t = timeit(label, fn)
        print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)

    corr('main sort 5-op num_keys=2 (N=1.18M)',
         lambda: np.asarray(sort5_k2(c2_d, z_d, int_d, road_d, dyn_d)))
    corr('main sort 5-op num_keys=1',
         lambda: np.asarray(sort5_k1(c2_d, z_d, int_d, road_d, dyn_d)))
    corr('sort 2-op num_keys=1 (packed-payload candidate)',
         lambda: np.asarray(sort2_k1(c2_d, z_d)))
    med_key = c2_d * 256 + val_d
    corr('median sort 1-op u32',
         lambda: np.asarray(sort1(med_key)))
    corr('pallas segmented_stats (sorted keys)',
         lambda: np.asarray(pallas_sums(c2_d, z_d, int_d, road_d, dyn_d)))
    corr('dense warp 24x256x256 (two takes)',
         lambda: np.asarray(warp24(maps, 0.9, 0.0005, 1.05, -0.0002)))
    corr('sparse pack (3 argsorts + gathers)',
         lambda: np.asarray(pack_sparse_like(dense, counts)))


if __name__ == '__main__':
    main()
