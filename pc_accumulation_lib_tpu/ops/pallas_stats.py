"""Pallas TPU kernel: windowed segmented statistics over sorted keys.

The sort-based raster (ops/sort_raster.py) reduces per-cell statistics with
XLA cumsum + searchsorted + boundary gathers — all ~1e8 elem/s random-access
ops. This kernel computes every per-group SUM, MIN, and rgb MEDIAN in ONE
double-buffered bandwidth-bound pass by exploiting sortedness:

  grid = windows of K consecutive groups. Each window DMAs its point range
  (scalar-prefetched boundaries) from HBM in CHUNK slices with two buffers
  (next slice's DMA overlaps this slice's compute), builds a (C, K)
  one-hot of local group ids on the VPU, and accumulates
    sums  += weights_T (W, C) @ one-hot (C, K)      on the MXU,
    mins   = min(mins, columnwise-min of masked z)   on the VPU,
    hist  += value-one-hot (B, C) @ one-hot (C, K)   on the MXU (u8 values).

After the window's last chunk the kernel finishes the medians IN VMEM:
per-group cumulative histograms via 8 sublane shift-adds, order statistics
(n-1)//2 and n//2 read off with threshold counts, and the 'full' split
(present+future group pairs) via one lane shift — so the only median
output is a (3, 2, K) f32 block per window instead of a
(3, 256, K) histogram stack (~400 MB/raster at bench shape) that XLA
would have to re-read, cumsum and argmax through.

Replaces ~5 cumsums over N + one 131k-query searchsorted + 6 median sorts
per BEV sample (see sort_raster.sorted_split_stats).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Chunk of points processed per DMA; window of consecutive groups per
# grid step. Both MXU/VPU-friendly sizes. DMA offsets must be 128-aligned
# on TPU, so each chunk read is aligned down and over-fetched by ALIGN.
CHUNK = 1024
ALIGN = 128
# Window of consecutive groups per grid step. The histogram matmuls'
# MXU work scales with WIN at fixed total chunk count (hist acc is
# (N_BINS, WIN) per chunk), while the median-finalize cumsum work is
# WIN-invariant (num_windows x (N_BINS, WIN) = const) — so smaller
# windows win until per-window DMA round-up dominates (~1 CHUNK per
# window): measured on v5e at bench shape (905k live rows, 131072
# groups): WIN 512 -> 13.8 ms, 256 -> 8.8, 128 -> 6.8, and the
# round-up crossover is below 128 (avg points/window ~884 < CHUNK).
WIN = 128
W_PAD = 8  # weight rows padded to the f32 sublane tile
N_BINS = 256  # u8 value histogram bins (rgb medians)
N_MED = 3    # median value rows (r, g, b)


def _sublane_cumsum(h):
    """Exact cumulative sum along axis 0 (bins) of an (N_BINS, K) f32
    count array via log2(N_BINS) shifted adds — integer counts stay exact
    (all values < 2^24). pltpu.roll + row mask instead of concatenate:
    both are native Mosaic ops with no relayout."""
    n = h.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
    k = 1
    while k < n:
        shifted = pltpu.roll(h, shift=k, axis=0)
        h = h + jnp.where(row_ids >= k, shifted, 0.0)
        k *= 2
    return h


def _lane_shift_left(x):
    """x[..., j] <- x[..., j+1]: pairs group 2c with 2c+1. Circular (the
    last lane wraps) — callers only read even lanes, whose pair partner
    never wraps. pltpu.roll requires a non-negative shift: size-1 == -1."""
    return pltpu.roll(x, shift=x.shape[-1] - 1, axis=x.ndim - 1)


def _median_ranks(cum, lens):
    """0.5 * (order stat (n-1)//2 + order stat n//2) per column from an
    exact cumulative histogram. Value at rank k = #bins with cum <= k
    (cum is non-decreasing). Empty columns produce garbage — callers mask
    with their own fill where lens == 0."""
    t1 = jnp.floor((lens - 1.0) * 0.5)
    t2 = jnp.floor(lens * 0.5)
    v1 = jnp.sum((cum <= t1[None, :]).astype(jnp.float32), axis=0)
    v2 = jnp.sum((cum <= t2[None, :]).astype(jnp.float32), axis=0)
    return 0.5 * (v1 + v2)


def _kernel(win_start_ref, win_len_ref, keys_hbm, wts_hbm, sum_ref, min_ref,
            *rest, med_rows=(), med_nsplit=0, CHUNK=CHUNK, WIN=WIN):
    if med_rows:
        (med_ref, hist_ref, key_buf, wt_buf, key_sem, wt_sem) = rest
    else:
        med_ref = hist_ref = None
        key_buf, wt_buf, key_sem, wt_sem = rest
    w = pl.program_id(0)
    start = win_start_ref[w]
    length = win_len_ref[w]
    base = w * WIN

    sum_ref[...] = jnp.zeros_like(sum_ref)
    min_ref[...] = jnp.full_like(min_ref, jnp.inf)
    if hist_ref is not None:
        hist_ref[...] = jnp.zeros_like(hist_ref)

    B = CHUNK + ALIGN
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, WIN), 1)
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    nchunks = pl.cdiv(length, CHUNK)

    def chunk_dma(i, slot):
        off = start + i * CHUNK
        # 128-align the read (Mosaic requires lane-tile-aligned dynamic
        # slices) and over-fetch by ALIGN; the row mask shifts by rem.
        off_al = pl.multiple_of((off // ALIGN) * ALIGN, ALIGN)
        cp_k = pltpu.make_async_copy(
            keys_hbm.at[0, pl.ds(off_al, B)], key_buf.at[slot, 0, :],
            key_sem.at[slot])
        cp_w = pltpu.make_async_copy(
            wts_hbm.at[:, pl.ds(off_al, B)], wt_buf.at[slot], wt_sem.at[slot])
        return cp_k, cp_w

    # Double buffering: chunk i+1's DMA rides under chunk i's compute —
    # the serialized-small-DMA latency of the single-buffer kernel was the
    # dominant cost at bench shape (~2300 blocking 20 KB copies).
    @pl.when(nchunks > 0)
    def _warmup():
        k0, w0 = chunk_dma(0, 0)
        k0.start()
        w0.start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nchunks)
        def _prefetch():
            kn, wn = chunk_dma(i + 1, nslot)
            kn.start()
            wn.start()

        kc, wc = chunk_dma(i, slot)
        kc.wait()
        wc.wait()

        off = start + i * CHUNK
        rem = off - (off // ALIGN) * ALIGN
        local = key_buf[slot, 0, :] - base                # (B,)
        in_len = (row_pos >= rem) & (
            row_pos < rem + jnp.minimum(length - i * CHUNK, CHUNK))
        valid = in_len & (local >= 0) & (local < WIN)
        onehot = (local[:, None] == col_ids) & valid[:, None]  # (C, K)

        # Per-group z-min WITHOUT a (C, K) masked-min (that select +
        # reduce pair was ~25% of the loop's VPU work): keys are sorted,
        # so each group is a contiguous run — a segmented prefix-min
        # scan (log2(C) lane-rolls) leaves the run min at each run's
        # LAST element, and the per-group extraction rides the sums
        # matmul as two extra rows (boundary indicator b has exactly one
        # 1 per present group, so sum(min*b) IS that group's chunk-min).
        z2 = wt_buf[slot, W_PAD - 1, :][None, :]           # (1, C)
        s2 = local[None, :]
        v2 = valid[None, :]
        m2 = jnp.where(v2, z2, jnp.inf)
        p2 = row_pos[None, :]
        k = 1
        while k < B:
            same = (pltpu.roll(s2, shift=k, axis=1) == s2) & (p2 >= k)
            m2 = jnp.where(same,
                           jnp.minimum(m2, pltpu.roll(m2, shift=k, axis=1)),
                           m2)
            k *= 2
        nxt = B - 1  # roll by size-1 == peek at position p+1
        # (roll the valid mask as i32 — Mosaic has no 1-bit rotate)
        vi = v2.astype(jnp.int32)
        last = ((pltpu.roll(s2, shift=nxt, axis=1) != s2)
                | (pltpu.roll(vi, shift=nxt, axis=1) == 0)
                | (p2 == B - 1))
        b2 = (v2 & last).astype(jnp.float32)               # (1, C)
        minb = jnp.where(b2 > 0, m2, 0.0)

        # precision=HIGHEST: the default MXU path truncates the f32
        # weight operand to bf16, which skews the intensity sums by ~0.4%
        # (the road-marking sigmoid then amplifies that up to ~100x —
        # caught by `bench.py --selftest` on the real chip). The one-hot
        # operand is exact in bf16 either way; rows 4/5 carry the scan
        # min and boundary count (single nonzero term per group — exact).
        lhs = jnp.concatenate(
            [wt_buf[slot, :4, :], minb, b2,
             jnp.zeros((W_PAD - 6, B), jnp.float32)], axis=0)
        acc = jax.lax.dot_general(
            lhs, onehot.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (W_PAD, K)
        sum_ref[0] += acc
        min_ref[0, 0, :] = jnp.minimum(
            min_ref[0, 0, :], jnp.where(acc[5] > 0.5, acc[4], jnp.inf))

        if hist_ref is not None:
            # Per-group 256-bin value histograms for each med row (rgb
            # medians): one-hot of the u8 value @ the group one-hot —
            # both operands exact in bf16, counts exact in f32. Replaces
            # 6 median SORTS per raster (~60% of raster time) with MXU
            # work.
            oh_b16 = onehot.astype(jnp.bfloat16)
            bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, B), 0)
            for hi, row in enumerate(med_rows):
                val = wt_buf[slot, row, :].astype(jnp.int32)  # (B,) 0..255
                vh = (bins == val[None, :]).astype(jnp.bfloat16)
                h = jax.lax.dot_general(
                    vh, oh_b16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (N_BINS, K)
                hist_ref[hi] += h
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    if med_ref is not None:
        # Median finalize in VMEM: exact per-group cumulative histograms
        # -> order statistics. Channel 0 of the output is the per-GROUP
        # median (nsplit=2: present/future interleaved exactly like the
        # group ids); channel 1 is the 'full' (present+future) median,
        # meaningful at even lanes only (garbage at odd lanes — the
        # XLA side reads every other lane). Empty groups produce garbage
        # values here; the XLA side overwrites them with rgb_fill using
        # the counts it already has.
        lens = sum_ref[0, 0:1, :]                          # (1, K) counts
        if med_nsplit == 2:
            lens_full = lens + _lane_shift_left(lens)
        for hi in range(len(med_rows)):
            cum = _sublane_cumsum(hist_ref[hi])            # (N_BINS, K)
            med_ref[0, hi, 0, :] = _median_ranks(cum, lens[0])
            if med_nsplit == 2:
                cum_full = cum + _lane_shift_left(cum)
                med_ref[0, hi, 1, :] = _median_ranks(cum_full, lens_full[0])
            else:
                med_ref[0, hi, 1, :] = jnp.zeros((WIN,), jnp.float32)


@functools.partial(jax.jit, static_argnames=('num_groups', 'interpret',
                                             'med_rows', 'med_nsplit',
                                             'chunk', 'win'))
def window_stats(sorted_keys, weights_t, win_start, win_len, num_groups,
                 interpret=False, med_rows=(), med_nsplit=0, chunk=None,
                 win=None):
    """Per-group sums and z-min (and optional exact u8-value medians) over
    sorted keys.

    Args:
      sorted_keys: (1, Npad) int32 ascending group ids (pad = num_groups).
      weights_t: (W_PAD, Npad) float32; rows 0..3 are SUMMED weights (the
        kernel's sums-matmul lhs is exactly these 4 rows — output rows
        4-5 carry the z-min scan and boundary count instead; row 0 MUST
        be the all-ones count row when med_rows is used — the median
        thresholds read it), rows 4..W_PAD-2 may hold u8 value rows for
        med_rows, row W_PAD-1 is z (min-reduced). Npad must be a multiple
        of CHUNK with at least CHUNK of padding slack.
      win_start/win_len: (num_windows,) int32 point ranges per WIN-group
        window (from a coarse searchsorted).
      num_groups: static; multiple of WIN.
      med_rows: static tuple of weight-row indices holding u8 values in
        [0,256) — for each, the exact np.median per group is computed
        in-kernel from an MXU-accumulated histogram.
      med_nsplit: 2 when group ids interleave two time splits
        (group = cell*2 + is_future) — additionally computes the
        present+future 'full' median per cell.

    Returns (sums (num_groups, W_PAD), zmin (num_groups,)[, meds
    (len(med_rows), 2, num_groups) — [:, 0] per-group medians, [:, 1]
    'full' medians at even group positions]).
    """
    CHUNK_ = CHUNK if chunk is None else chunk
    WIN_ = WIN if win is None else win
    if num_groups % WIN_:   # not assert: must survive python -O
        raise ValueError(f'num_groups ({num_groups}) must be a multiple '
                         f'of the kernel window ({WIN_})')
    num_windows = num_groups // WIN_
    n_med = len(med_rows)
    out_specs = [
        pl.BlockSpec((1, W_PAD, WIN_), lambda w, *_: (w, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WIN_), lambda w, *_: (w, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_windows, W_PAD, WIN_), jnp.float32),
        jax.ShapeDtypeStruct((num_windows, 1, WIN_), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, 1, CHUNK_ + ALIGN), jnp.int32),
        pltpu.VMEM((2, W_PAD, CHUNK_ + ALIGN), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if n_med:
        out_specs.append(
            pl.BlockSpec((1, n_med, 2, WIN_), lambda w, *_: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((num_windows, n_med, 2, WIN_),
                                 jnp.float32))
        scratch_shapes.insert(0, pltpu.VMEM((n_med, N_BINS, WIN_),
                                            jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, med_rows=med_rows,
                          med_nsplit=med_nsplit, CHUNK=CHUNK_, WIN=WIN_),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(win_start, win_len, sorted_keys, weights_t)
    sums, mins = outs[0], outs[1]
    sums = jnp.transpose(sums, (0, 2, 1)).reshape(num_groups, W_PAD)
    mins = mins.reshape(num_groups)
    if not n_med:
        return sums, mins
    # (nw, M, 2, WIN) -> (M, 2, num_groups)
    meds = jnp.transpose(outs[2], (1, 2, 0, 3)).reshape(n_med, 2, num_groups)
    return sums, mins, meds


def _f16_bits_to_f32(bits):
    """Decode float16 bit patterns held in an int32 vector to float32 —
    arithmetically, on the VPU (Mosaic has no 16-bit bitcast on an i32
    lane). Normals re-bias the exponent into a float32 bit pattern
    (one i32 bitcast); subnormals are exact as mant * 2^-24. exp==31
    (inf/nan) never occurs here: the bits come from casting finite point
    heights (sort_raster.pack_payload_words). Exactness for all finite
    patterns is pinned by tests/test_pallas_stats.py. ``bits`` must be
    >= 2-D (pltpu.bitcast has no 1-D form)."""
    sgn = (bits >> 15) & 1
    expo = (bits >> 10) & 31
    mant = bits & 1023
    f32_bits = (sgn << 31) | ((expo + 112) << 23) | (mant << 13)
    normal = pltpu.bitcast(f32_bits, jnp.float32)
    sub = ((1.0 - 2.0 * sgn.astype(jnp.float32))
           * mant.astype(jnp.float32) * jnp.float32(2.0 ** -24))
    return jnp.where(expo == 0, sub, normal)


def _kernel_words(win_start_ref, win_len_ref, keys_hbm, words_hbm, sum_ref,
                  min_ref, *rest, n_med=0, med_nsplit=0, CHUNK=CHUNK,
                  WIN=WIN):
    """The words form of _kernel: identical math, but the per-point
    features arrive as the TWO packed int32 sort-payload words
    (sort_raster.pack_payload_words) and are unpacked IN-KERNEL on the
    VPU — 12 B/row of DMA instead of 36, and none of the XLA-side
    unpack/(8,N)-pad passes between the main sort and the kernel.
    Additionally gates the median zero-init/finalize (the per-window
    cumsum + rank extraction — WIN-invariant total work in _kernel) on
    the window being non-empty: empty windows' median blocks hold
    garbage, which the XLA side already masks via the counts."""
    if n_med:
        (med_ref, hist_ref, key_buf, word_buf, key_sem, word_sem) = rest
    else:
        med_ref = hist_ref = None
        key_buf, word_buf, key_sem, word_sem = rest
    w = pl.program_id(0)
    start = win_start_ref[w]
    length = win_len_ref[w]
    base = w * WIN

    sum_ref[...] = jnp.zeros_like(sum_ref)
    min_ref[...] = jnp.full_like(min_ref, jnp.inf)

    B = CHUNK + ALIGN
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, WIN), 1)
    row_pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, B), 0)
    nchunks = pl.cdiv(length, CHUNK)

    if hist_ref is not None:
        @pl.when(nchunks > 0)
        def _zero_hist():
            hist_ref[...] = jnp.zeros_like(hist_ref)

    def chunk_dma(i, slot):
        off = start + i * CHUNK
        off_al = pl.multiple_of((off // ALIGN) * ALIGN, ALIGN)
        cp_k = pltpu.make_async_copy(
            keys_hbm.at[0, pl.ds(off_al, B)], key_buf.at[slot, 0, :],
            key_sem.at[slot])
        cp_w = pltpu.make_async_copy(
            words_hbm.at[:, pl.ds(off_al, B)], word_buf.at[slot],
            word_sem.at[slot])
        return cp_k, cp_w

    @pl.when(nchunks > 0)
    def _warmup():
        k0, w0 = chunk_dma(0, 0)
        k0.start()
        w0.start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nchunks)
        def _prefetch():
            kn, wn = chunk_dma(i + 1, nslot)
            kn.start()
            wn.start()

        kc, wc = chunk_dma(i, slot)
        kc.wait()
        wc.wait()

        off = start + i * CHUNK
        rem = off - (off // ALIGN) * ALIGN
        local = key_buf[slot, 0, :] - base                # (B,)
        in_len = (row_pos >= rem) & (
            row_pos < rem + jnp.minimum(length - i * CHUNK, CHUNK))
        valid = in_len & (local >= 0) & (local < WIN)
        onehot = (local[:, None] == col_ids) & valid[:, None]  # (C, K)

        # In-kernel unpack of the two payload words (bit layout:
        # sort_raster.pack_payload_words). >> on i32 is arithmetic; the
        # & masks make that equivalent to the XLA path's logical form.
        w1 = word_buf[slot, 0, :]
        w2 = word_buf[slot, 1, :]
        road = ((w1 >> 25) & 1).astype(jnp.float32)
        dyn = ((w1 >> 24) & 1).astype(jnp.float32)
        inten = ((w2 & 0xFFFF).astype(jnp.float32) * (1.0 / 65535.0))
        z2 = _f16_bits_to_f32((w2[None, :] >> 16) & 0xFFFF)   # (1, C)

        # Per-group z-min via the segmented prefix-min scan (see _kernel).
        s2 = local[None, :]
        v2 = valid[None, :]
        m2 = jnp.where(v2, z2, jnp.inf)
        p2 = row_pos[None, :]
        k = 1
        while k < B:
            same = (pltpu.roll(s2, shift=k, axis=1) == s2) & (p2 >= k)
            m2 = jnp.where(same,
                           jnp.minimum(m2, pltpu.roll(m2, shift=k, axis=1)),
                           m2)
            k *= 2
        nxt = B - 1
        vi = v2.astype(jnp.int32)
        last = ((pltpu.roll(s2, shift=nxt, axis=1) != s2)
                | (pltpu.roll(vi, shift=nxt, axis=1) == 0)
                | (p2 == B - 1))
        b2 = (v2 & last).astype(jnp.float32)               # (1, C)
        minb = jnp.where(b2 > 0, m2, 0.0)

        # Same sums matmul as _kernel (precision=HIGHEST: see its note on
        # the bf16 truncation of the intensity row), lhs rows fixed:
        # [ones, road, dyn, intensity, scan-min, boundary, 0, 0].
        lhs = jnp.concatenate(
            [jnp.ones((1, B), jnp.float32), road[None, :], dyn[None, :],
             inten[None, :], minb, b2,
             jnp.zeros((W_PAD - 6, B), jnp.float32)], axis=0)
        acc = jax.lax.dot_general(
            lhs, onehot.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (W_PAD, K)
        sum_ref[0] += acc
        min_ref[0, 0, :] = jnp.minimum(
            min_ref[0, 0, :], jnp.where(acc[5] > 0.5, acc[4], jnp.inf))

        if hist_ref is not None:
            oh_b16 = onehot.astype(jnp.bfloat16)
            for hi, shift in enumerate((16, 8, 0)):
                val = (w1 >> shift) & 255                  # (B,) 0..255
                vh = (bins == val[None, :]).astype(jnp.bfloat16)
                h = jax.lax.dot_general(
                    vh, oh_b16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (N_BINS, K)
                hist_ref[hi] += h
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    if med_ref is not None:
        @pl.when(nchunks > 0)
        def _finalize_meds():
            lens = sum_ref[0, 0:1, :]                      # (1, K) counts
            if med_nsplit == 2:
                lens_full = lens + _lane_shift_left(lens)
            for hi in range(n_med):
                cum = _sublane_cumsum(hist_ref[hi])        # (N_BINS, K)
                med_ref[0, hi, 0, :] = _median_ranks(cum, lens[0])
                if med_nsplit == 2:
                    cum_full = cum + _lane_shift_left(cum)
                    med_ref[0, hi, 1, :] = _median_ranks(cum_full,
                                                         lens_full[0])
                else:
                    med_ref[0, hi, 1, :] = jnp.zeros((WIN,), jnp.float32)


@functools.partial(jax.jit, static_argnames=('num_groups', 'interpret',
                                             'hist_medians', 'med_nsplit',
                                             'chunk', 'win'))
def segmented_stats_words(sorted_c2, sorted_w1, sorted_w2, num_groups,
                          interpret=False, hist_medians=True, med_nsplit=1,
                          chunk=None, win=None):
    """Per-group stats straight from the sorted packed payload words.

    The fast form of segmented_stats for the raster's fixed payload
    layout (sort_raster.pack_payload_words): the kernel unpacks road/dyn
    flags, u16 intensity, f16-bit z, and the u8 rgb values in-VMEM, so
    the XLA glue between the main sort and the kernel is just padding.

    Args:
      sorted_c2/w1/w2: (N,) int32 — the three operands of the main sort,
        already sorted by c2 ascending (pad/sentinel key >= num_groups).
      num_groups: static; multiple of the kernel window.
      hist_medians: also compute exact per-group rgb medians in-kernel.
      med_nsplit: 2 when groups interleave present/future (adds the
        'full' pair-median channel, valid at even positions).

    Returns (sums (num_groups, 4) [count, road, dyn, intensity], zmin
    (num_groups,)[, meds (3, 2, num_groups) when hist_medians]).
    Bit-identical to segmented_stats fed the XLA-unpacked rows (pinned
    by tests/test_pallas_stats.py and on-chip by bench.py --selftest).
    """
    CHUNK_ = CHUNK if chunk is None else chunk
    WIN_ = WIN if win is None else win
    if num_groups % WIN_:
        raise ValueError(f'num_groups ({num_groups}) must be a multiple '
                         f'of the kernel window ({WIN_})')
    num_windows = num_groups // WIN_
    n = sorted_c2.shape[0]
    slack = max(2 * CHUNK_, CHUNK_ + ALIGN)
    n_pad = ((n + slack + CHUNK_ - 1) // CHUNK_) * CHUNK_
    pad = n_pad - n
    keys = jnp.pad(sorted_c2.astype(jnp.int32), (0, pad),
                   constant_values=num_groups)[None, :]
    words = jnp.stack([
        jnp.pad(sorted_w1.astype(jnp.int32), (0, pad)),
        jnp.pad(sorted_w2.astype(jnp.int32), (0, pad))])
    ws, wl = window_boundaries(keys[0, :n], num_groups, win=WIN_)
    n_med = 3 if hist_medians else 0

    out_specs = [
        pl.BlockSpec((1, W_PAD, WIN_), lambda w, *_: (w, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WIN_), lambda w, *_: (w, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_windows, W_PAD, WIN_), jnp.float32),
        jax.ShapeDtypeStruct((num_windows, 1, WIN_), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, 1, CHUNK_ + ALIGN), jnp.int32),
        pltpu.VMEM((2, 2, CHUNK_ + ALIGN), jnp.int32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if n_med:
        out_specs.append(
            pl.BlockSpec((1, n_med, 2, WIN_), lambda w, *_: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((num_windows, n_med, 2, WIN_),
                                 jnp.float32))
        scratch_shapes.insert(0, pltpu.VMEM((n_med, N_BINS, WIN_),
                                            jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        functools.partial(_kernel_words, n_med=n_med,
                          med_nsplit=med_nsplit if n_med else 0,
                          CHUNK=CHUNK_, WIN=WIN_),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(ws, wl, keys, words)
    sums = jnp.transpose(outs[0], (0, 2, 1)).reshape(num_groups, W_PAD)
    mins = outs[1].reshape(num_groups)
    if not n_med:
        return sums[:, :4], mins
    meds = jnp.transpose(outs[2], (1, 2, 0, 3)).reshape(3, 2, num_groups)
    return sums[:, :4], mins, meds


def window_boundaries(sorted_keys_1d, num_groups, win=None):
    """Coarse per-window point ranges: one searchsorted with
    num_groups/WIN queries (vs per-group queries in the XLA path)."""
    q = jnp.arange(0, num_groups + 1, WIN if win is None else win,
                   dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_keys_1d, q).astype(jnp.int32)
    return bounds[:-1], bounds[1:] - bounds[:-1]


def segmented_stats(sorted_keys_1d, weight_rows, z_sorted, num_groups,
                    interpret=False, value_rows=(), med_nsplit=1,
                    chunk=None, win=None):
    """Convenience wrapper: per-group sums for each row in ``weight_rows``
    (list of (N,) f32 aligned with the sorted keys; row 0 must be the
    all-ones count row when value_rows is used) and per-group z-min;
    optionally the exact per-group np.median for each (N,) u8-valued
    array in ``value_rows`` (in-kernel histogram medians).

    Returns (sums (num_groups, len(weight_rows)), zmin (num_groups,))
    [, meds (len(value_rows), 2, num_groups): [:, 0] per-group medians;
    [:, 1] medians of adjacent group PAIRS (the 'full' split when
    med_nsplit == 2), valid at even positions].
    """
    n = sorted_keys_1d.shape[0]
    chunk_ = CHUNK if chunk is None else chunk
    # Slack past n must cover the kernel's aligned-down over-fetch: the
    # last chunk's DMA reads chunk_ + ALIGN bytes starting at most one
    # chunk before its window end (<= n). 2*chunk_ alone is short when
    # chunk_ < ALIGN (identical to it at the default chunk).
    slack = max(2 * chunk_, chunk_ + ALIGN)
    n_pad = ((n + slack + chunk_ - 1) // chunk_) * chunk_
    pad = n_pad - n
    keys = jnp.pad(sorted_keys_1d.astype(jnp.int32), (0, pad),
                   constant_values=num_groups)[None, :]
    rows = list(weight_rows)
    vals = list(value_rows)
    # The kernel's sums matmul takes exactly wt rows 0..3 as its lhs
    # (rows 4-5 of the OUTPUT carry the scan-min and boundary count, see
    # window_stats) — a 5th weight row would be silently replaced by the
    # min accumulation, not summed.
    if len(rows) > 4:   # not assert: must survive python -O
        raise ValueError(f'at most 4 summed weight rows, got {len(rows)}')
    if len(rows) + len(vals) > W_PAD - 1:
        raise ValueError(f'{len(rows)} weight + {len(vals)} value rows '
                         f'exceed the {W_PAD - 1} payload rows')
    wt = jnp.zeros((W_PAD, n_pad), jnp.float32)
    for i, r in enumerate(rows):
        wt = wt.at[i, :n].set(r.astype(jnp.float32))
    med_rows = tuple(range(len(rows), len(rows) + len(vals)))
    for i, v in zip(med_rows, vals):
        wt = wt.at[i, :n].set(v.astype(jnp.float32))
    wt = wt.at[W_PAD - 1, :n].set(z_sorted.astype(jnp.float32))
    ws, wl = window_boundaries(keys[0, :n], num_groups, win=win)
    out = window_stats(keys, wt, ws, wl, num_groups, interpret=interpret,
                       med_rows=med_rows,
                       med_nsplit=med_nsplit if vals else 0,
                       chunk=chunk, win=win)
    if not vals:
        sums, zmin = out
        return sums[:, :len(rows)], zmin
    sums, zmin, meds = out
    return sums[:, :len(rows)], zmin, meds
