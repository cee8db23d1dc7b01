"""Batched-vs-serial median sort cost on TPU.

The 6 per-channel median sorts (ops/sort_raster.py) are independent
single-operand sorts over the same length; jnp.sort of a (6, N) batch may
amortize fixed passes. Run: python tools/profile_batched_sort.py
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


def timeit(label, fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:52s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def main():
    N = 1179648
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**25, size=(6, N)).astype(np.int32)
    k_d = jnp.asarray(keys)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    @jax.jit
    def serial6(k):
        return sum(jnp.sort(k[i])[i] for i in range(6))

    @jax.jit
    def batched6(k):
        s = jnp.sort(k, axis=-1)
        return s[:, :6].sum()

    @jax.jit
    def batched3(k):
        s = jnp.sort(k[:3], axis=-1)
        return s[:, :3].sum()

    for label, fn in (('serial 6x sort 1.18M', serial6),
                      ('batched (6,1.18M) sort', batched6),
                      ('batched (3,1.18M) sort', batched3)):
        t = timeit(label, lambda fn=fn: np.asarray(fn(k_d)))
        print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
