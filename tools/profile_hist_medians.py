"""A/B: median sorts vs in-kernel MXU histograms, on the real TPU.

Also asserts rgb-map equality at bench shape (the on-chip complement to
tests/test_pallas_stats.py::test_hist_medians_match_sort_medians).
Run: python tools/profile_hist_medians.py
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
from pc_accumulation_lib_tpu.bev import core


def timeit(label, fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:46s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def main():
    N = 24 * 49152
    P = 256
    rng = np.random.default_rng(0)
    pts = np.zeros((N, 10), np.float32)
    pts[:, 0:2] = rng.uniform(-40, 40, size=(N, 2))
    pts[:, 2] = rng.uniform(-2, 6, size=N)
    pts[:, 3] = rng.uniform(0, 1, size=N)
    pts[:, 4:7] = rng.integers(0, 256, size=(N, 3))
    pts[:, 7] = rng.choice([0, 2, 13, 14, 15, 17], size=N)
    fids = rng.integers(0, 8, size=N).astype(np.int32)
    valid = rng.random(N) < 0.85
    params = core.identity_params(window=(0, 7), present_frame=4)
    pk = jnp.asarray(params.pack())
    args = (jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(fids),
            jnp.zeros(4, jnp.float32), pk)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    outs = {}
    for hist in (False, True):
        fn = core.make_raster_fn(80.0, P, cfg.DEFAULT_SEM_IDXS, 20., 20.,
                                 0.5, pack='sparse', sparse_cap=16384,
                                 hist_medians=hist)

        @jax.jit
        def s(p, v, f, i, k, fn=fn):
            out = fn(p, v, f, i, k, True)
            return (out[0].astype(jnp.float32).sum()
                    + out[1].astype(jnp.float32).sum())

        t = timeit(f'raster sparse hist_medians={hist}',
                   lambda s=s: np.asarray(s(*args)))
        print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)
        outs[hist] = np.asarray(fn(*args, True)[1])

    err = np.abs(outs[True].astype(np.float32)
                 - outs[False].astype(np.float32)).max()
    print(f'quantized dense stack max |diff|: {err}', flush=True)


if __name__ == '__main__':
    main()
