"""Sort-based BEV channel statistics — the fast TPU raster backend.

Motivation (measured on TPU v5e): XLA scatter/gather run at ~1e8 elem/s,
so the scatter rasterizer (ops/rasterize.py) costs ~24 scatter passes per
BEV sample (~2s at 8.4M points). XLA sort runs at vector-unit speed, so
group-by-cell is reformulated as sort + cumsum + boundary lookup:

  * ONE multi-operand sort keyed by c2 = cell*2 + is_future (sentinel for
    masked points) with z as secondary key and [intensity*road, road_flag,
    dynobj_flag] payloads gives every count/sum/min channel:
      - segment boundaries: one searchsorted (method='sort');
      - counts per (cell,split): boundary diffs (pure vector math);
      - weighted sums: segment_sum over the sorted keys (sequential-
        access scatter; exact, unlike cumsum boundary-differencing
        which cancels catastrophically at ~1e5 running magnitude);
      - min-z elevation: z at segment start (z is the secondary sort key);
      - 'full' split = present + future (reshape-and-reduce, free).
  * per-channel median: single-key sorts of packed (c2*256 + value) —
    order statistics read at start + (n-1)//2 / start + n//2, which is
    EXACTLY np.median for the integer colour values (sem_bev.py:665-667).
    The same boundary table serves all sorts (identical key multisets).

Outputs match the scatter backend exactly for counts/probmaps/medians/
elevation; intensity sums agree to f32 addition-order noise (tested, and
gated on real TPU against the Pallas kernel by `bench.py --selftest`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pc_accumulation_lib_tpu.ops import rasterize as ras


def _boundaries(sorted_c2, num_groups):
    """ends[g] = #elements with key <= g; starts[g] = ends[g-1]."""
    q = jnp.arange(1, num_groups + 1, dtype=sorted_c2.dtype)
    ends = jnp.searchsorted(sorted_c2, q, method='sort').astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    return starts, ends


def _median_from_sorted(packed_sorted, starts, lens, fill_value, base=256):
    """np.median of each group's integer values from a packed sorted array.

    packed_sorted: sort of (group * base + value); group segment at
    [starts, starts+lens). Returns (G,) medians; empty groups get fill.
    """
    n = packed_sorted.shape[0]
    p1 = jnp.clip(starts + (lens - 1) // 2, 0, n - 1)
    p2 = jnp.clip(starts + lens // 2, 0, n - 1)
    v1 = (packed_sorted[p1] % base).astype(jnp.float32)
    v2 = (packed_sorted[p2] % base).astype(jnp.float32)
    med = 0.5 * (v1 + v2)
    return jnp.where(lens > 0, med, jnp.float32(fill_value))


def _medians_from_kernel(meds, lens, n_cells, nsplit, rgb_fill):
    """Unpack the Pallas kernel's in-kernel medians into the split dict.

    meds: (3, 2, n_cells*nsplit) from pallas_stats — [:, 0] per-group
    medians (exactly np.median of each group's integer values, computed
    in-kernel from MXU histograms), [:, 1] 'full' (adjacent group pair)
    medians at even positions. lens: (sent,) group sizes. Empty groups
    hold kernel garbage — masked to rgb_fill here.
    """
    fill = jnp.float32(rgb_fill)
    out = {}
    if nsplit == 2:
        lens2 = lens.reshape(n_cells, 2)
        pg = meds[:, 0, :].reshape(3, n_cells, 2)
        full = meds[:, 1, :].reshape(3, n_cells, 2)[:, :, 0]
        len_full = lens2.sum(-1)
        out['present'] = [jnp.where(lens2[:, 0] > 0, pg[c, :, 0], fill)
                          for c in range(3)]
        out['future'] = [jnp.where(lens2[:, 1] > 0, pg[c, :, 1], fill)
                         for c in range(3)]
        out['full'] = [jnp.where(len_full > 0, full[c], fill)
                       for c in range(3)]
    else:
        out['present'] = [jnp.where(lens > 0, meds[c, 0, :], fill)
                          for c in range(3)]
    return out


def _per_split_with_full(vecs, n_cells, gen_future):
    """Map each (sent,) vector to {present[,future,full]} dicts; 'full' is
    derived present (+/min) future — the adds for counts/sums, the min for
    elevation (reshape-and-reduce, free)."""
    reds = (jnp.add, jnp.add, jnp.add, jnp.add, jnp.minimum)

    def per_split(vec):
        if not gen_future:
            return {'present': vec}
        m = vec.reshape(n_cells, 2)
        return {'present': m[:, 0], 'future': m[:, 1]}

    out = []
    for vec, red in zip(vecs, reds):
        d = per_split(vec)
        if gen_future:
            d['full'] = red(d['present'], d['future'])
        out.append(d)
    return tuple(out)


def pack_payload_words(road_f, dyn_f, rgb, int_road, z):
    """Pack ALL per-point sort payloads into TWO int32 words (sort operand
    bytes are the raster's dominant cost; the main sort is then 1-key +
    2 payloads):

      word1: road/dyn flags (bits 25/24) + the clipped u8 rgb in bits
        23..0 — bit-exact;
      word2: z as float16 bits + road-intensity as u16. Rounding z to f16
        BEFORE the min commutes with the min (round-to-nearest is
        monotone), and the shipped elevation channel is float16 anyway, so
        the f16 OUTPUT stays bit-exact. Intensity (reference range [0,1]:
        raw KITTI .bin floats / nuScenes u8/255) quantizes to 1/65535 —
        ~2e-5 on the per-cell mean, within the 2e-3 on-chip parity gate
        even after the ~100x road-marking sigmoid gain.

    These words are augmentation-invariant on the accum.step() fast path
    (z is untouched by the in-plane rot/trans and the zoom scales the VIEW,
    not the points — bev/core.make_raster_fn), so callers may hoist this
    packing out of the per-sample rasters (core.make_prep_fn).
    """
    packed = ((road_f.astype(jnp.int32) << 25)
              | (dyn_f.astype(jnp.int32) << 24))
    r8, g8, b8 = (jnp.clip(rgb[:, ch], 0., 255.).astype(jnp.int32)
                  for ch in range(3))
    packed = packed | (r8 << 16) | (g8 << 8) | b8
    z16 = jax.lax.bitcast_convert_type(
        z.astype(jnp.float16), jnp.uint16).astype(jnp.int32)
    i16 = jnp.round(jnp.clip(int_road, 0., 1.) * 65535.0).astype(jnp.int32)
    return packed, (z16 << 16) | i16


def split_stats_from_words_flat(c2, packed, packed2, n_cells, gen_future,
                                rgb_fill=0, use_pallas=True,
                                pallas_interpret=False, hist_medians=True,
                                words_kernel=True, compact_groups=False):
    """Split stats from pre-packed payload words over a FLAT cell range.

    The tile form of the raster stats: ``n_cells`` is any cell count — a
    full (P,P) map, or one device's stripe of cells in the tile-sharded
    mesh raster (parallel/sharded.make_tile_sharded_raster_fn). Returns
    {channel_split: (n_cells,)} flat maps ((3, n_cells) for rgb); the
    caller reshapes/assembles.

    ``use_pallas``: the 1-key sort + segmented-stats kernel path. The
    group count is padded up to the kernel's 512-group window and the
    pad groups sliced off afterwards. ``words_kernel`` (default) feeds
    the sorted payload words straight to the words-form kernel
    (pallas_stats.segmented_stats_words: in-kernel unpack, 12 B/row DMA,
    empty-window median gating); False keeps the XLA-unpack +
    segmented_stats form — bit-identical outputs, kept for A/B
    (tools/profile_raster_wall.py measured the words form ~2.7 ms/raster
    faster e2e at 860k rows). Sentinel rows (key == ``sent``)
    sort to the tail; when ``sent`` is already a multiple of 512 (all
    bench-shaped configs) there are no pad groups and the sentinels are
    excluded because window_boundaries' searchsorted never reaches the
    key — when ``sent % 512 != 0`` they fall INSIDE the padded group
    range, are accumulated into pad groups, and only then sliced off
    (wasted DMA on small tile stripes; acceptable today, see
    PERF_NOTES open frontiers). Otherwise a pure-XLA
    fallback unpacking the features from the words: z (f16 bits) rides
    as the secondary sort key so the segment-start read IS the min
    (exact — the shipped elevation channel is f16 anyway); intensity is
    the u16 payload (~2e-5 on per-cell means, inside the 2e-3 on-chip
    parity gate even after the road-marking sigmoid gain).

    ``compact_groups`` (Pallas + hist_medians only): rank-compact the
    kernel's group space. The stats kernel's remaining per-raster fixed
    cost scales with the GROUP space while raster occupancy is sparse
    (bench: ~7.7k occupied of 65536 cells), so groups are renumbered by
    occupied-cell RANK (cumsum of cell-head flags over the already-sorted
    keys — rank is monotone in cell id, no re-sort) as
    g = rank*nsplit + is_future: every point lands in the first
    ~nsplit*union groups and the kernel's empty-window gate skips the
    rest (measured ~1.0 ms/raster at bench occupancy,
    tools/profile_compact_extras.py). The group cap stays ``sent`` — rank
    space can never exceed it, so there is no overflow/redo path. Rank
    order IS ascending-cell order, so stats come back RANK-indexed with
    the same pack layout; the returned dict carries an extra
    ``cell_of_rank`` (n_cells,) int32 (sentinel ``n_cells`` for dead
    ranks) that bev/core scatters back to cell space where needed (the
    sparse wire bytes are identical either way; see core._pack_sparse).
    """
    nsplit = 2 if gen_future else 1
    sent = n_cells * nsplit
    compact = bool(compact_groups) and use_pallas and hist_medians

    if use_pallas:
        from pc_accumulation_lib_tpu.ops import pallas_stats
        sent_pad = ((sent + 511) // 512) * 512
        s_c2, s_packed, s_p2 = jax.lax.sort((c2, packed, packed2),
                                            num_keys=1)
        cell_of_rank = None
        g = s_c2
        if compact:
            cell_s = s_c2 // nsplit          # sentinel -> n_cells
            head = jnp.concatenate([
                jnp.ones((1,), jnp.int32),
                (cell_s[1:] != cell_s[:-1]).astype(jnp.int32)])
            rank = jnp.cumsum(head) - 1
            # Sentinels get key == sent_pad: past every kernel window's
            # searchsorted query, so they are never accumulated (even
            # when sent % 512 != 0).
            g = jnp.where(s_c2 < sent, rank * nsplit + s_c2 % nsplit,
                          sent_pad)
        if words_kernel:
            # Words form: the kernel unpacks the payload words in-VMEM —
            # 12 B/row of kernel DMA instead of 36 and no XLA unpack/pad
            # passes. Bit-identical to the unpacked form (same matmuls on
            # the same values; tests/test_pallas_stats.py pins it, and
            # bench.py --selftest gates it on the real chip).
            st = pallas_stats.segmented_stats_words(
                g, s_packed, s_p2, sent_pad,
                interpret=pallas_interpret, hist_medians=hist_medians,
                med_nsplit=nsplit)
        else:
            s_z = jax.lax.bitcast_convert_type(
                ((s_p2 >> 16) & 0xFFFF).astype(jnp.uint16),
                jnp.float16).astype(jnp.float32)
            s_int = (s_p2 & 0xFFFF).astype(jnp.float32) * (1.0 / 65535.0)
            s_road = ((s_packed >> 25) & 1).astype(jnp.float32)
            s_dyn = ((s_packed >> 24) & 1).astype(jnp.float32)
            if hist_medians:
                value_rows = [((s_packed >> 16) & 255).astype(jnp.float32),
                              ((s_packed >> 8) & 255).astype(jnp.float32),
                              (s_packed & 255).astype(jnp.float32)]
            else:
                value_rows = ()
            st = pallas_stats.segmented_stats(
                g, [jnp.ones_like(s_road), s_road, s_dyn, s_int], s_z,
                sent_pad, interpret=pallas_interpret, value_rows=value_rows,
                med_nsplit=nsplit)
        sums, zmin = st[0][:sent], st[1][:sent]
        kmeds = st[2][:, :, :sent] if hist_medians else None
        lens = sums[:, 0]
        road_c, dyn_c, int_s = sums[:, 1], sums[:, 2], sums[:, 3]
        zmin = jnp.where(lens > 0, zmin, jnp.inf)

        if compact:
            # cell id of each rank: the sorted keys at each rank-group
            # start (a 65k gather — measured at the noise floor). Dead
            # ranks (no points in either split) get sentinel n_cells.
            grp = lens.astype(jnp.int32).reshape(n_cells, nsplit).sum(-1)
            ends_r = jnp.cumsum(grp)
            n_total = s_c2.shape[0]
            starts_r = jnp.clip(ends_r - grp, 0, n_total - 1)
            cell_of_rank = jnp.where(grp > 0, s_c2[starts_r] // nsplit,
                                     n_cells).astype(jnp.int32)

        lens_s, road_s, dyn_s, int_ss, zmin_s = _per_split_with_full(
            (lens, road_c, dyn_c, int_s, zmin), n_cells, gen_future)

        out = {}
        if kmeds is not None:
            med = _medians_from_kernel(kmeds, lens, n_cells, nsplit,
                                       rgb_fill)
            for s in lens_s:
                _emit_split(out, s, lens_s[s], road_s[s], int_ss[s],
                            dyn_s[s], zmin_s[s], med[s], None)
            if cell_of_rank is not None:
                out['cell_of_rank'] = cell_of_rank
            return out

        # No in-kernel medians: per-channel median sorts on the unpacked
        # u8 values (needs the rgb bytes in word1 regardless — callers
        # always pack them; boundary table from the kernel's exact group
        # sizes).
        ends = jnp.cumsum(lens.astype(jnp.int32))
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        med = _median_sorts(c2, packed, starts, ends, n_cells, nsplit,
                            gen_future, rgb_fill, lens_s)
        for s in lens_s:
            _emit_split(out, s, lens_s[s], road_s[s], int_ss[s], dyn_s[s],
                        zmin_s[s], med[s], None)
        return out

    # Pure-XLA fallback (no kernel anywhere — e.g. CPU-mesh shards).
    z = jax.lax.bitcast_convert_type(
        ((packed2 >> 16) & 0xFFFF).astype(jnp.uint16),
        jnp.float16).astype(jnp.float32)
    int_road = (packed2 & 0xFFFF).astype(jnp.float32) * (1.0 / 65535.0)
    road_f = ((packed >> 25) & 1).astype(jnp.float32)
    dyn_f = ((packed >> 24) & 1).astype(jnp.float32)
    s_c2, s_z, s_int, s_road, s_dyn = jax.lax.sort(
        (c2, z, int_road, road_f, dyn_f), num_keys=2)
    starts, ends = _boundaries(s_c2, sent)
    lens = (ends - starts).astype(jnp.float32)
    road_c = jax.ops.segment_sum(s_road, s_c2,
                                 num_segments=sent + 1)[:sent]
    dyn_c = jax.ops.segment_sum(s_dyn, s_c2,
                                num_segments=sent + 1)[:sent]
    int_s = jax.ops.segment_sum(s_int, s_c2,
                                num_segments=sent + 1)[:sent]
    n_total = s_c2.shape[0]
    zmin = s_z[jnp.clip(starts, 0, n_total - 1)]
    zmin = jnp.where(lens > 0, zmin, jnp.inf)
    lens_s, road_s, dyn_s, int_ss, zmin_s = _per_split_with_full(
        (lens, road_c, dyn_c, int_s, zmin), n_cells, gen_future)
    med = _median_sorts(c2, packed, starts, ends, n_cells, nsplit,
                        gen_future, rgb_fill, lens_s)
    out = {}
    for s in lens_s:
        _emit_split(out, s, lens_s[s], road_s[s], int_ss[s], dyn_s[s],
                    zmin_s[s], med[s], None)
    return out


def _median_sorts(c2, packed, starts, ends, n_cells, nsplit, gen_future,
                  rgb_fill, lens_s):
    """Exact per-split rgb medians via packed (c2*256 + value) sorts —
    the non-kernel formulation; values are the u8 rgb bytes in word1."""
    sent = n_cells * nsplit
    med = {s: [] for s in lens_s}
    starts2 = starts.reshape(n_cells, nsplit)
    ends2 = ends.reshape(n_cells, nsplit)
    for ch, shift in enumerate((16, 8, 0)):
        val = (packed >> shift) & 255
        pf_sorted = jnp.sort(jnp.where(c2 < sent, c2 * 256 + val,
                                       sent * 256))
        med['present'].append(
            _median_from_sorted(pf_sorted, starts2[:, 0],
                                (ends2[:, 0] - starts2[:, 0]), rgb_fill))
        if gen_future:
            med['future'].append(
                _median_from_sorted(pf_sorted, starts2[:, 1],
                                    (ends2[:, 1] - starts2[:, 1]),
                                    rgb_fill))
            full_sorted = jnp.sort(jnp.where(c2 < sent,
                                             (c2 // nsplit) * 256 + val,
                                             n_cells * 256))
            med['full'].append(
                _median_from_sorted(full_sorted, starts2[:, 0],
                                    (ends2[:, 1] - starts2[:, 0]),
                                    rgb_fill))
    return med


def split_stats_from_packed(c2, packed, packed2, pixel_size, gen_future,
                            rgb_fill=0, pallas_interpret=False,
                            hist_medians=True, compact_groups=False):
    """Pallas-kernel split stats from pre-packed payload words.

    The 1-key sort (a 2-key comparator costs ~2x on the main sort,
    measured on v5e; the kernel's per-group min is order-independent so z
    rides as payload) + one bandwidth-bound Pallas pass for every sum, the
    z-min and (with hist_medians) the exact per-group rgb medians
    (ops/pallas_stats.py) instead of cumsums + a per-group searchsorted +
    6 median sorts. (P,P)-shaped wrapper over split_stats_from_words_flat.

    With ``compact_groups`` the maps come back RANK-indexed (their (P,P)
    shape is a container, not a spatial layout) plus a flat
    ``cell_of_rank`` key — only the sparse-pack emit path consumes that
    form (bev/core._emit_outputs).
    """
    P = pixel_size
    flat = split_stats_from_words_flat(
        c2, packed, packed2, P * P, gen_future, rgb_fill=rgb_fill,
        use_pallas=True, pallas_interpret=pallas_interpret,
        hist_medians=hist_medians, compact_groups=compact_groups)
    cor = flat.pop('cell_of_rank', None)
    out = {k: v.reshape((3, P, P) if v.ndim == 2 else (P, P))
           for k, v in flat.items()}
    if cor is not None:
        out['cell_of_rank'] = cor
    return out


def sorted_split_stats(cells, static_m, is_future, z, intensity, rgb, sem,
                       sem_idxs, pixel_size, gen_future, rgb_fill=0,
                       use_pallas=False, pallas_interpret=False,
                       hist_medians=False):
    """All channel families for all time splits via the sort formulation.

    Args:
      cells: (N,) int32 raster cell ids in [0, P*P).
      static_m: (N,) bool — valid & in-window & in-view & static.
      is_future: (N,) bool split membership (ignored when not gen_future).
      z/intensity: (N,) float point features; rgb: (N,3) in [0,255].
      sem: (N,) semantic class ids.

    Returns {road,intensity(raw),rgb,dynamic,elevation} x
    {present[,future,full]} of (P,P)/(3,P,P) float32 maps, identical to the
    scatter backend (ras.split_accumulators + finalize_split).
    """
    P = pixel_size
    n_cells = P * P
    nsplit = 2 if gen_future else 1
    sent = n_cells * nsplit
    if gen_future:
        isf = is_future.astype(jnp.int32)
    else:
        isf = jnp.zeros_like(cells)
    c2 = jnp.where(static_m, cells * nsplit + isf, sent)

    road_f = ras.sem_class_mask(sem, [sem_idxs['road']]).astype(jnp.float32)
    from pc_accumulation_lib_tpu.config import DYN_OBJ_CLASSES
    dyn_f = ras.sem_class_mask(
        sem, [sem_idxs[nm] for nm in DYN_OBJ_CLASSES]).astype(jnp.float32)
    int_road = intensity.astype(jnp.float32) * road_f

    pallas_ok = use_pallas and sent % 512 == 0
    hist_ok = hist_medians and pallas_ok
    # Pallas path: z is a payload only (the kernel's per-group min is
    # order-independent), so a 1-key sort suffices — a 2-key comparator
    # costs ~2x on the main sort (measured on v5e). The XLA fallback reads
    # the min as the segment-start element, which NEEDS z as a secondary
    # key.
    # ALL per-point features ride the sort as TWO packed int32 payloads
    # (sort operand bytes are the raster's dominant cost):
    #   word1: road/dyn flags + (with hist_medians) the clipped u8 rgb —
    #     bit-exact;
    #   word2: z as float16 bits + road-intensity as u16. Rounding z to
    #     f16 BEFORE the min commutes with the min (round-to-nearest is
    #     monotone), and the shipped elevation channel is float16 anyway,
    #     so the f16 OUTPUT stays bit-exact. Intensity (reference range
    #     [0,1]: raw KITTI .bin floats / nuScenes u8/255) quantizes to
    #     1/65535 — ~2e-5 on the per-cell mean, within the 2e-3 on-chip
    #     parity gate even after the ~100x road-marking sigmoid gain.
    if pallas_ok:
        packed, packed2 = pack_payload_words(road_f, dyn_f, rgb,
                                             int_road, z)
        return split_stats_from_packed(
            c2, packed, packed2, pixel_size, gen_future, rgb_fill=rgb_fill,
            pallas_interpret=pallas_interpret, hist_medians=hist_ok)

    sorted_ops = jax.lax.sort(
        (c2, z.astype(jnp.float32), int_road, road_f, dyn_f),
        num_keys=2)
    s_c2, s_z, s_int, s_road, s_dyn = sorted_ops
    starts, ends = _boundaries(s_c2, sent)
    lens = (ends - starts).astype(jnp.float32)          # (sent,)
    # Per-group sums via segment_sum, NOT cumsum boundary differences:
    # a global f32 cumsum reaches ~1e5 magnitude, so differencing it
    # loses ~1e-2 absolute per group (catastrophic cancellation) —
    # which the road-marking sigmoid then amplifies ~100x. Caught by
    # `bench.py --selftest` against the (near-exact) Pallas kernel.
    road_c = jax.ops.segment_sum(s_road, s_c2,
                                 num_segments=sent + 1)[:sent]
    dyn_c = jax.ops.segment_sum(s_dyn, s_c2,
                                num_segments=sent + 1)[:sent]
    int_s = jax.ops.segment_sum(s_int, s_c2,
                                num_segments=sent + 1)[:sent]
    n_total = s_c2.shape[0]
    zmin = s_z[jnp.clip(starts, 0, n_total - 1)]
    zmin = jnp.where(lens > 0, zmin, jnp.inf)

    lens_s, road_s, dyn_s, int_ss, zmin_s = _per_split_with_full(
        (lens, road_c, dyn_c, int_s, zmin), n_cells, gen_future)

    # Colour medians: packed single-key sorts; boundary table reused.
    med = {s: [] for s in lens_s}
    starts2 = starts.reshape(n_cells, nsplit)
    ends2 = ends.reshape(n_cells, nsplit)
    for ch in range(3):
        val = jnp.clip(rgb[:, ch].astype(jnp.int32), 0, 255)
        pf_sorted = jnp.sort(jnp.where(static_m, c2 * 256 + val,
                                       sent * 256))
        med['present'].append(
            _median_from_sorted(pf_sorted, starts2[:, 0],
                                (ends2[:, 0] - starts2[:, 0]), rgb_fill))
        if gen_future:
            med['future'].append(
                _median_from_sorted(pf_sorted, starts2[:, 1],
                                    (ends2[:, 1] - starts2[:, 1]),
                                    rgb_fill))
            full_sorted = jnp.sort(jnp.where(static_m, cells * 256 + val,
                                             n_cells * 256))
            med['full'].append(
                _median_from_sorted(full_sorted, starts2[:, 0],
                                    (ends2[:, 1] - starts2[:, 0]),
                                    rgb_fill))

    out = {}
    for s in lens_s:
        _emit_split(out, s, lens_s[s], road_s[s], int_ss[s], dyn_s[s],
                    zmin_s[s], med[s], P)
    return out


def _emit_split(out, s, cnt, road_c, int_s, dyn_c, zmin, meds, P):
    """Finalize one split's channel maps (Dirichlet probmaps, road-mean
    intensity, min-z elevation, median rgb, raw counts). ``P=None``
    emits FLAT (n_cells,) maps (the tile-sharded raster's per-stripe
    form); otherwise (P,P)."""
    shp = (lambda a: a) if P is None else (lambda a: a.reshape(P, P))
    out[f'road_{s}'] = shp((road_c + 1.0) / (cnt + 2.0))
    out[f'intensity_{s}'] = shp(int_s / (road_c + 1.0))
    out[f'rgb_{s}'] = jnp.stack([shp(m) for m in meds]) / 255.0
    out[f'dynamic_{s}'] = shp((dyn_c + 1.0) / (cnt + 2.0))
    out[f'elevation_{s}'] = shp(jnp.where(cnt > 0, zmin, 0.0))
    # Per-cell point counts: every other channel holds a known constant
    # where count==0, which is what the sparse fetch packing keys on
    # (bev/core.py pack='sparse').
    out[f'count_{s}'] = shp(cnt)
