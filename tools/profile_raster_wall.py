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


def make_case(rng, n, P=256, nsplit=2, spread=0.22):
    """Clustered (road-scene-like) cell occupancy: cells drawn from a
    forward wedge + gaussian blob. ``spread`` sets the radial sigma:
    0.22 -> ~25% of the raster occupied (a stress case), 0.07 -> ~7.4k
    present cells (the bench MEAN occupancy), 0.10 -> ~12.5k (between
    bench mean and the observed 16.6k peak)."""
    sent = P * P * nsplit
    r = np.abs(rng.normal(0, spread, n)) + 0.02
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
    spread = float(sys.argv[2]) if len(sys.argv) > 2 else 0.22
    P = 256
    sent = P * P * 2
    sent_pad = ((sent + 511) // 512) * 512
    rng = np.random.default_rng(0)
    c2, w1, w2 = make_case(rng, n, P, spread=spread)

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

    # Compacted-group candidate (round-5 open frontier (a)): rank occupied
    # CELLS after the main sort (rank = cumsum of cell-head flags — monotone
    # in cell id, so the sorted order is preserved and no re-sort is
    # needed), then run the words kernel over the compact group space
    # rank*2+is_future. All points concentrate in the first
    # ~union_occupancy*2/WIN windows; everything past them is truly empty.
    def rank_groups(sc, cap_groups):
        cell = sc >> 1
        head = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (cell[1:] != cell[:-1]).astype(jnp.int32)])
        rank = jnp.cumsum(head) - 1
        return jnp.where(sc < sent, rank * 2 + (sc & 1), cap_groups)

    @jax.jit
    def rank_only(sc):
        return rank_groups(sc, 49152)[0] + rank_groups(sc, 49152)[-1]

    corr('rank cumsum alone (presorted)',
         lambda: np.asarray(rank_only(s_c2)))

    import functools

    @functools.partial(jax.jit, static_argnames=('cap_groups',))
    def compact_stats(sc, sa, sb, cap_groups):
        g = rank_groups(sc, cap_groups)
        st = pallas_stats.segmented_stats_words(
            g, sa, sb, cap_groups, hist_medians=True, med_nsplit=2)
        return st[0].sum() + st[1][0] + st[2][0, 0, 0]

    for cap_g in (49152, 65536):
        corr(f'words kernel COMPACT groups={cap_g} (rank+kernel)',
             lambda cg=cap_g: np.asarray(
                 compact_stats(s_c2, s_w1, s_w2, cg)))

    # Repeated-inside-jit forms: 8 chained kernel invocations per fetch so
    # the per-rep delta resolves well above the +-7 ms tunnel noise. The
    # carry XORs into an intensity bit of w2 so XLA cannot CSE the reps.
    REPS = 8

    @functools.partial(jax.jit, static_argnames=('cap_groups',))
    def dense_rep(sc, sa, sb, cap_groups):
        def body(i, acc):
            st = pallas_stats.segmented_stats_words(
                sc, sa, sb ^ (acc & 1), cap_groups,
                hist_medians=True, med_nsplit=2)
            return (st[0].sum() + st[1][0] + st[2][0, 0, 0]).astype(
                jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=('cap_groups',))
    def compact_rep(sc, sa, sb, cap_groups):
        def body(i, acc):
            g = rank_groups(sc, cap_groups)
            st = pallas_stats.segmented_stats_words(
                g, sa, sb ^ (acc & 1), cap_groups,
                hist_medians=True, med_nsplit=2)
            return (st[0].sum() + st[1][0] + st[2][0, 0, 0]).astype(
                jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    t = corr(f'dense words kernel x{REPS} (in-jit)',
             lambda: np.asarray(dense_rep(s_c2, s_w1, s_w2, sent_pad)))
    print(f'  -> per-rep ~{t / REPS * 1e3:7.2f} ms', flush=True)
    for cap_g in (49152, 65536):
        t = corr(f'COMPACT groups={cap_g} x{REPS} (rank+kernel, in-jit)',
                 lambda cg=cap_g: np.asarray(
                     compact_rep(s_c2, s_w1, s_w2, cg)))
        print(f'  -> per-rep ~{t / REPS * 1e3:7.2f} ms', flush=True)

    # Decomposition: the rgb-median histogram share (hist_medians=False
    # drops the one-hot builds + MXU hists + finalize), and whether a
    # larger CHUNK pays once compact windows hold full chunks.
    @functools.partial(jax.jit,
                       static_argnames=('cap_groups', 'hist', 'chunk',
                                        'compact'))
    def var_rep(sc, sa, sb, cap_groups, hist, chunk, compact):
        def body(i, acc):
            g = rank_groups(sc, cap_groups) if compact else sc
            st = pallas_stats.segmented_stats_words(
                g, sa, sb ^ (acc & 1), cap_groups,
                hist_medians=hist, med_nsplit=2, chunk=chunk)
            extra = st[2][0, 0, 0] if hist else 0.0
            return (st[0].sum() + st[1][0] + extra).astype(jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    for label, kw in (
            ('dense NO-hist', dict(cap_groups=sent_pad, hist=False,
                                   chunk=None, compact=False)),
            ('compact 65536 NO-hist', dict(cap_groups=65536, hist=False,
                                           chunk=None, compact=True)),
            ('compact 65536 chunk=2048', dict(cap_groups=65536, hist=True,
                                              chunk=2048, compact=True)),
            ('dense chunk=2048', dict(cap_groups=sent_pad, hist=True,
                                      chunk=2048, compact=False)),
    ):
        t = corr(f'{label} x{REPS} (in-jit)',
                 lambda kw=kw: np.asarray(var_rep(s_c2, s_w1, s_w2, **kw)))
        print(f'  -> per-rep ~{t / REPS * 1e3:7.2f} ms', flush=True)

    # Correctness spot-check: compact sums == dense sums at their cells.
    st_d = jax.jit(lambda: pallas_stats.segmented_stats_words(
        s_c2, s_w1, s_w2, sent_pad, hist_medians=True, med_nsplit=2))()
    g = jax.jit(lambda sc: rank_groups(sc, 49152))(s_c2)
    st_c = jax.jit(lambda gg: pallas_stats.segmented_stats_words(
        gg, s_w1, s_w2, 49152, hist_medians=True, med_nsplit=2))(g)
    sums_d, sums_c = np.asarray(st_d[0]), np.asarray(st_c[0])
    meds_d, meds_c = np.asarray(st_d[2]), np.asarray(st_c[2])
    g_np, c2_np = np.asarray(g), np.asarray(s_c2)
    m = c2_np < sent
    union_cells = int(g_np[m].max()) // 2 + 1
    if int(g_np[m].max()) >= 49152:
        print(f'compact correctness SKIPPED: union cells '
              f'{int(g_np[m].max()) // 2 + 1} overflow the 24576-cell cap '
              f'(use a lower spread)', flush=True)
        m &= False
    # map: dense group id -> compact group id (first occurrence wins)
    pairs = np.stack([c2_np[m], g_np[m]], 1)
    uniq = dict(zip(pairs[:, 0].tolist(), pairs[:, 1].tolist()))
    dg = np.fromiter(uniq.keys(), np.int64)
    cg = np.fromiter((uniq[k] for k in dg), np.int64)
    # Columns 0..2 (count/road/dyn) are integer-valued f32 — exact.
    # Column 3 (intensity) is an f32 sum whose addition order follows the
    # chunk boundaries, which differ between the dense and compact group
    # spaces — compare with tolerance. Columns 4..7 are per-chunk scan
    # artifacts (see _kernel_words), not part of the contract.
    assert np.array_equal(sums_d[dg][:, :3], sums_c[cg][:, :3]), \
        'compact sums mismatch'
    assert np.allclose(sums_d[dg][:, 3], sums_c[cg][:, 3],
                       rtol=1e-6, atol=1e-4), 'compact intensity mismatch'
    assert np.array_equal(meds_d[:, 0, dg], meds_c[:, 0, cg]), \
        'compact medians mismatch'
    # 'full' medians live at EVEN lanes (cell parity is preserved: compact
    # group = rank*2 + is_future with rank per-CELL, so a cell's
    # present/future lanes stay adjacent). Compare at every occupied cell.
    cells_u = np.unique(dg // 2)
    rank_u = np.array([uniq[2 * c] if 2 * c in uniq else uniq[2 * c + 1]
                       for c in cells_u]) // 2
    assert np.array_equal(meds_d[:, 1, 2 * cells_u],
                          meds_c[:, 1, 2 * rank_u]), \
        'compact full-medians mismatch'
    print(f'compact correctness OK: {dg.size} groups, union cells '
          f'{union_cells}', flush=True)

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
