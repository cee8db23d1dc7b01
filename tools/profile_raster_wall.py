"""A/B the per-raster device-compute wall on the real TPU (round-5).

Times, at bench steady shape (rung 860160 rows, clustered lidar-like
occupancy, P=256, gen_future), RTT-corrected:

  1. the 3-operand 1-key main sort;
  2. the OLD stats path on presorted words: XLA unpack + (8,N) pad +
     segmented_stats kernel (sort_raster words_kernel=False, minus sort);
  3. the NEW words kernel on presorted words (segmented_stats_words:
     in-kernel unpack + empty-window median gating);
  4. end-to-end split_stats_from_packed old vs new (sort included);
  5. the sparse-pack + finalize tail at current bench caps.

Tunnel noise is ±7 ms — trust trends/ratios, repeat runs.
Run: python tools/profile_raster_wall.py [rows]
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

from pc_accumulation_lib_tpu.bev import core
from pc_accumulation_lib_tpu.ops import pallas_stats, sort_raster


def timeit(label, fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:58s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def make_case(rng, n, P=256, nsplit=2):
    """Clustered (road-scene-like) cell occupancy: cells drawn from a
    forward wedge + gaussian blob, ~25% of the raster occupied."""
    sent = P * P * nsplit
    r = np.abs(rng.normal(0, 0.22, n)) + 0.02
    ang = rng.normal(0, 0.8, n)
    x = np.clip(0.5 + r * np.cos(ang) * 0.9, 0, 0.999)
    y = np.clip(0.5 + r * np.sin(ang) * 0.9, 0, 0.999)
    cells = (np.floor(y * P) * P + np.floor(x * P)).astype(np.int32)
    isf = (rng.uniform(size=n) < 0.3).astype(np.int32)
    valid = rng.uniform(size=n) < 0.9
    c2 = np.where(valid, cells * nsplit + isf, sent).astype(np.int32)
    road = (rng.uniform(size=n) < 0.5).astype(np.float32)
    dyn = (rng.uniform(size=n) < 0.1).astype(np.float32)
    rgb = rng.integers(0, 256, size=(n, 3)).astype(np.float32)
    inten = rng.uniform(size=n).astype(np.float32) * road
    z = rng.normal(size=n).astype(np.float32) * 2.0
    w1, w2 = jax.jit(sort_raster.pack_payload_words)(
        jnp.asarray(road), jnp.asarray(dyn), jnp.asarray(rgb),
        jnp.asarray(inten), jnp.asarray(z))
    occ = np.unique(cells[valid & (isf == 0)]).size
    print(f'rows={n} occupied present cells={occ}', flush=True)
    return jnp.asarray(c2), w1, w2


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 860160
    P = 256
    sent = P * P * 2
    sent_pad = ((sent + 511) // 512) * 512
    rng = np.random.default_rng(0)
    c2, w1, w2 = make_case(rng, n, P)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)), n=20)

    def corr(label, fn, n=10):
        t = timeit(label, fn, n=n)
        print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)
        return t - t_rtt

    @jax.jit
    def sort3(c, a, b):
        o = jax.lax.sort((c, a, b), num_keys=1)
        return o[0][0] + o[1][0] + o[2][0]

    corr('main sort 3-op num_keys=1', lambda: np.asarray(sort3(c2, w1, w2)))

    s_c2, s_w1, s_w2 = jax.jit(
        lambda c, a, b: jax.lax.sort((c, a, b), num_keys=1))(c2, w1, w2)
    s_c2.block_until_ready()

    @jax.jit
    def old_stats(sc, sa, sb):
        s_z = jax.lax.bitcast_convert_type(
            ((sb >> 16) & 0xFFFF).astype(jnp.uint16),
            jnp.float16).astype(jnp.float32)
        s_int = (sb & 0xFFFF).astype(jnp.float32) * (1.0 / 65535.0)
        s_road = ((sa >> 25) & 1).astype(jnp.float32)
        s_dyn = ((sa >> 24) & 1).astype(jnp.float32)
        value_rows = [((sa >> 16) & 255).astype(jnp.float32),
                      ((sa >> 8) & 255).astype(jnp.float32),
                      (sa & 255).astype(jnp.float32)]
        st = pallas_stats.segmented_stats(
            sc, [jnp.ones_like(s_road), s_road, s_dyn, s_int], s_z,
            sent_pad, value_rows=value_rows, med_nsplit=2)
        return st[0].sum() + st[1][0] + st[2][0, 0, 0]

    @jax.jit
    def new_stats(sc, sa, sb):
        st = pallas_stats.segmented_stats_words(
            sc, sa, sb, sent_pad, hist_medians=True, med_nsplit=2)
        return st[0].sum() + st[1][0] + st[2][0, 0, 0]

    corr('OLD kernel path on presorted (unpack+pad+kernel)',
         lambda: np.asarray(old_stats(s_c2, s_w1, s_w2)))
    corr('NEW words kernel on presorted',
         lambda: np.asarray(new_stats(s_c2, s_w1, s_w2)))

    @jax.jit
    def e2e_old(c, a, b):
        chs = sort_raster.split_stats_from_words_flat(
            c, a, b, P * P, True, use_pallas=True, hist_medians=True,
            words_kernel=False)
        return sum(v.sum() for v in chs.values())

    @jax.jit
    def e2e_new(c, a, b):
        chs = sort_raster.split_stats_from_words_flat(
            c, a, b, P * P, True, use_pallas=True, hist_medians=True,
            words_kernel=True)
        return sum(v.sum() for v in chs.values())

    corr('stats e2e OLD (sort+kernel+splits)',
         lambda: np.asarray(e2e_old(c2, w1, w2)))
    corr('stats e2e NEW (sort+words kernel+splits)',
         lambda: np.asarray(e2e_new(c2, w1, w2)))

    # The emit tail at bench caps: channel maps -> finalize -> sparse pack.
    caps = (20480, 10240, 10240)
    dense = jnp.asarray(rng.random((21, P, P)).astype(np.float16))
    counts = jnp.asarray(
        (rng.random((3, P, P)) < 0.25).astype(np.float32))

    @jax.jit
    def tail(d, cts):
        s, q = core.sparse_outputs(d, cts, P, caps, 3)
        return s[0].astype(jnp.int32) + q[0].astype(jnp.int32)

    corr('sparse pack tail (words+argsorts+gathers, bench caps)',
         lambda: np.asarray(tail(dense, counts)))


if __name__ == '__main__':
    main()
