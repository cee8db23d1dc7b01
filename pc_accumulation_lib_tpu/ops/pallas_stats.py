"""Pallas TPU kernel: windowed segmented statistics over sorted keys.

The sort-based raster (ops/sort_raster.py) reduces per-cell statistics with
XLA cumsum + searchsorted + boundary gathers — all ~1e8 elem/s random-access
ops. This kernel computes every per-group SUM and MIN in ONE bandwidth-bound
pass by exploiting sortedness:

  grid = windows of K consecutive groups. Each window DMAs its point range
  (scalar-prefetched boundaries) from HBM in chunks, builds a (C, K)
  one-hot of local group ids on the VPU, and accumulates
    sums  += weights_T (W, C) @ one-hot (C, K)     on the MXU,
    mins   = min(mins, columnwise-min of masked z)  on the VPU.

Per point: K*W MACs — at K=512, W=8 that is ~4 GFLOP per million points,
i.e. microseconds of MXU time; the pass is DMA-bound. Replaces ~5 cumsums
over N + one 131k-query searchsorted per BEV sample.
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
CHUNK = 512
ALIGN = 128
WIN = 512
W_PAD = 8  # weight rows padded to the f32 sublane tile
N_BINS = 256  # u8 value histogram bins (rgb medians)


def _kernel(win_start_ref, win_len_ref, keys_hbm, wts_hbm, sum_ref, min_ref,
            *rest, n_pad, hist_rows=()):
    if hist_rows:
        hist_ref, key_buf, wt_buf, key_sem, wt_sem = rest
    else:
        hist_ref = None
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

    def body(i, _):
        off = start + i * CHUNK
        # 128-align the read (Mosaic requires lane-tile-aligned dynamic
        # slices) and over-fetch by ALIGN; the row mask shifts by rem.
        off_al = pl.multiple_of((off // ALIGN) * ALIGN, ALIGN)
        rem = off - off_al
        cp_k = pltpu.make_async_copy(
            keys_hbm.at[0, pl.ds(off_al, B)], key_buf.at[0, :], key_sem)
        cp_w = pltpu.make_async_copy(
            wts_hbm.at[:, pl.ds(off_al, B)], wt_buf, wt_sem)
        cp_k.start()
        cp_w.start()
        cp_k.wait()
        cp_w.wait()

        local = key_buf[0, :] - base                      # (B,)
        in_len = (row_pos >= rem) & (
            row_pos < rem + jnp.minimum(length - i * CHUNK, CHUNK))
        valid = in_len & (local >= 0) & (local < WIN)
        onehot = (local[:, None] == col_ids) & valid[:, None]  # (C, K)

        # precision=HIGHEST: the default MXU path truncates the f32
        # weight operand to bf16, which skews the intensity sums by ~0.4%
        # (the road-marking sigmoid then amplifies that up to ~100x —
        # caught by `bench.py --selftest` on the real chip). The one-hot
        # operand is exact in bf16 either way; the pass stays DMA-bound.
        acc = jax.lax.dot_general(
            wt_buf[:, :], onehot.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)           # (W_PAD, K)
        sum_ref[0] += acc

        z = wt_buf[W_PAD - 1, :]                           # z row
        zmask = jnp.where(onehot, z[:, None], jnp.inf)     # (C, K)
        min_ref[0, 0, :] = jnp.minimum(min_ref[0, 0, :],
                                       jnp.min(zmask, axis=0))

        if hist_ref is not None:
            # Per-group 256-bin value histograms for each hist row (rgb
            # medians): one-hot of the u8 value @ the group one-hot —
            # both operands exact in bf16, counts exact in f32. Replaces
            # 6 median SORTS per raster (~60% of raster time) with MXU
            # work.
            oh_b16 = onehot.astype(jnp.bfloat16)
            bins = jax.lax.broadcasted_iota(jnp.int32, (N_BINS, B), 0)
            for hi, row in enumerate(hist_rows):
                val = wt_buf[row, :].astype(jnp.int32)     # (B,) 0..255
                vh = (bins == val[None, :]).astype(jnp.bfloat16)
                h = jax.lax.dot_general(
                    vh, oh_b16,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (N_BINS, K)
                hist_ref[0, hi] += h
        return 0

    nchunks = pl.cdiv(length, CHUNK)
    jax.lax.fori_loop(0, nchunks, body, 0)


@functools.partial(jax.jit, static_argnames=('num_groups', 'interpret',
                                             'hist_rows'))
def window_stats(sorted_keys, weights_t, win_start, win_len, num_groups,
                 interpret=False, hist_rows=()):
    """Per-group sums and z-min (and optional value histograms) over
    sorted keys.

    Args:
      sorted_keys: (1, Npad) int32 ascending group ids (pad = num_groups).
      weights_t: (W_PAD, Npad) float32; rows 0..W_PAD-2 are summed weights,
        row W_PAD-1 is z (min-reduced). Npad must be a multiple of CHUNK
        with at least CHUNK of padding slack.
      win_start/win_len: (num_windows,) int32 point ranges per WIN-group
        window (from a coarse searchsorted).
      num_groups: static; multiple of WIN.
      hist_rows: static tuple of weight-row indices holding u8 values in
        [0,256) — for each, a per-group N_BINS histogram is accumulated
        on the MXU (exact integer counts in f32).

    Returns (sums (num_groups, W_PAD), zmin (num_groups,)[, hists
    (len(hist_rows), N_BINS, num_groups)]).
    """
    assert num_groups % WIN == 0
    num_windows = num_groups // WIN
    n_pad = sorted_keys.shape[1]
    n_hist = len(hist_rows)
    out_specs = [
        pl.BlockSpec((1, W_PAD, WIN), lambda w, *_: (w, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, WIN), lambda w, *_: (w, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_windows, W_PAD, WIN), jnp.float32),
        jax.ShapeDtypeStruct((num_windows, 1, WIN), jnp.float32),
    ]
    if n_hist:
        out_specs.append(
            pl.BlockSpec((1, n_hist, N_BINS, WIN), lambda w, *_: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((num_windows, n_hist, N_BINS, WIN),
                                 jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_windows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((1, CHUNK + ALIGN), jnp.int32),
            pltpu.VMEM((W_PAD, CHUNK + ALIGN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, n_pad=n_pad, hist_rows=hist_rows),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(win_start, win_len, sorted_keys, weights_t)
    sums, mins = outs[0], outs[1]
    sums = jnp.transpose(sums, (0, 2, 1)).reshape(num_groups, W_PAD)
    mins = mins.reshape(num_groups)
    if not n_hist:
        return sums, mins
    # (nw, H, BINS, WIN) -> (H, BINS, num_groups)
    hists = jnp.transpose(outs[2], (1, 2, 0, 3)).reshape(
        n_hist, N_BINS, num_groups)
    return sums, mins, hists


def window_boundaries(sorted_keys_1d, num_groups):
    """Coarse per-window point ranges: one searchsorted with
    num_groups/WIN queries (vs per-group queries in the XLA path)."""
    q = jnp.arange(0, num_groups + 1, WIN, dtype=jnp.int32)
    bounds = jnp.searchsorted(sorted_keys_1d, q).astype(jnp.int32)
    return bounds[:-1], bounds[1:] - bounds[:-1]


def segmented_stats(sorted_keys_1d, weight_rows, z_sorted, num_groups,
                    interpret=False, value_rows=()):
    """Convenience wrapper: per-group sums for each row in ``weight_rows``
    (list of (N,) f32 aligned with the sorted keys) and per-group z-min;
    optionally per-group N_BINS value histograms for each (N,) u8-valued
    array in ``value_rows``.

    Returns (sums (num_groups, len(weight_rows)), zmin (num_groups,))
    [, hists (len(value_rows), N_BINS, num_groups)].
    """
    n = sorted_keys_1d.shape[0]
    n_pad = ((n + CHUNK - 1) // CHUNK + 2) * CHUNK
    pad = n_pad - n
    keys = jnp.pad(sorted_keys_1d.astype(jnp.int32), (0, pad),
                   constant_values=num_groups)[None, :]
    rows = list(weight_rows)
    vals = list(value_rows)
    assert len(rows) + len(vals) <= W_PAD - 1
    wt = jnp.zeros((W_PAD, n_pad), jnp.float32)
    for i, r in enumerate(rows):
        wt = wt.at[i, :n].set(r.astype(jnp.float32))
    hist_rows = tuple(range(len(rows), len(rows) + len(vals)))
    for i, v in zip(hist_rows, vals):
        wt = wt.at[i, :n].set(v.astype(jnp.float32))
    wt = wt.at[W_PAD - 1, :n].set(z_sorted.astype(jnp.float32))
    ws, wl = window_boundaries(keys[0, :n], num_groups)
    out = window_stats(keys, wt, ws, wl, num_groups, interpret=interpret,
                       hist_rows=hist_rows)
    if not vals:
        sums, zmin = out
        return sums[:, :len(rows)], zmin
    sums, zmin, hists = out
    return sums[:, :len(rows)], zmin, hists
