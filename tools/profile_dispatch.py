"""Measure per-submission dispatch cost on the remote-TPU tunnel.

Hypothesis (bench phase data, round 4): each jit submission blocks the
main thread on a control-channel round whose latency tracks tunnel
congestion — ~3-7 ms/call on a healthy link, ~25-30 ms/call when MBs of
transfer are queued. If true, consolidating the bench step's ~11
submissions into 1-2 directly hardens the headline against link weather.

Times three scenarios, main-thread seconds per call:
  A. N tiny jit calls back-to-back, idle link.
  B. Same, with a ~3 MB device->host fetch in flight (harvest analogue).
  C. Same, with a ~3 MB host->device upload in flight (upload analogue).

Run: python tools/profile_dispatch.py
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
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

N_CALLS = 12
REPS = 5


def main():
    dev = jax.devices()[0]
    print(f'device: {dev.platform} {dev.device_kind}', file=sys.stderr)

    # A family of distinct tiny jits (distinct executables, like the
    # step's integrate/compact/prep/raster mix) over a shared small arg.
    x = jnp.zeros((256, 256), jnp.float32)
    fns = [jax.jit(lambda a, i=i: a * (i + 1) + i) for i in range(N_CALLS)]
    for f in fns:
        f(x)                      # warm compiles
    big_host = np.random.default_rng(0).integers(
        0, 255, 3 << 20, dtype=np.uint8)
    big_dev = jax.device_put(big_host)
    bump = jax.jit(lambda a: a + 1)
    _ = np.asarray(bump(big_dev)[:8])

    def run_calls():
        t0 = time.perf_counter()
        outs = [f(x) for f in fns]
        dt = time.perf_counter() - t0
        return dt, outs

    from concurrent.futures import ThreadPoolExecutor
    scen = {}
    with ThreadPoolExecutor(max_workers=1) as ex:
        for name in ('idle', 'fetch_inflight', 'upload_inflight'):
            per = []
            for _ in range(REPS):
                fut = None
                if name == 'fetch_inflight':
                    big_dev = bump(big_dev)
                    fut = ex.submit(np.asarray, big_dev)
                elif name == 'upload_inflight':
                    fut = ex.submit(
                        lambda: np.asarray(bump(
                            jax.device_put(big_host))[:8]))
                time.sleep(0.002)     # let the transfer enter the wire
                dt, outs = run_calls()
                per.append(dt / N_CALLS)
                if fut is not None:
                    fut.result()
                _ = np.asarray(outs[-1][:2, :2])   # drain queue
            scen[name] = per
            print(f'{name:16s} per-call ms: '
                  f'{[round(p * 1e3, 2) for p in per]} '
                  f'median {np.median(per) * 1e3:.2f}', file=sys.stderr)

    # Same total work, ONE submission: a jit that composes the N bodies.
    def fused(a):
        outs = [f(a) for f in fns]
        return outs[-1]
    fused_j = jax.jit(fused)
    fused_j(x)
    per = []
    for _ in range(REPS):
        big_dev = bump(big_dev)
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(np.asarray, big_dev)
            time.sleep(0.002)
            t0 = time.perf_counter()
            out = fused_j(x)
            per.append(time.perf_counter() - t0)
            fut.result()
        _ = np.asarray(out[:2, :2])
    print(f'fused(1 call) under fetch, total ms: '
          f'{[round(p * 1e3, 2) for p in per]} '
          f'median {np.median(per) * 1e3:.2f}', file=sys.stderr)


if __name__ == '__main__':
    main()
