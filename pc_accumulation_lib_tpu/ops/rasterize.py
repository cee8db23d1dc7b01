"""Scatter-based BEV rasterizers.

The reference rasterizes with np.histogram2d (bev_generator.py:438-455) and
pure-Python per-point loops for min-z elevation (sem_bev.py:535-554) and
per-cell median RGB (sem_bev.py:619-669). Here every channel family maps onto
XLA segment scatters over flat raster cell ids (SURVEY.md section 7 decision
3):

  counts / Dirichlet numerators  -> segment_sum
  intensity sums                 -> segment_sum (weighted)
  elevation                      -> segment_min
  per-cell median RGB            -> 256-bin histogram + cumulative-count
                                    order statistics (exact for integer
                                    colour values, matching np.median)

Masked-out points are routed to a sentinel segment (cell id P*P) which is
sliced off, so all shapes stay static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pc_accumulation_lib_tpu.config import DYN_OBJ_CLASSES


def _masked_cells(cells, mask, num_cells):
    return jnp.where(mask, cells, num_cells)


def count_map(cells, mask, pixel_size, weights=None):
    """Per-cell (weighted) point counts -> (P,P) raster.

    Equivalent to gen_gridmap_count_map (bev_generator.py:438-455): the
    Cartesian-to-image vertical flip is already folded into the cell ids
    (see geometry.grid_cell_index).
    """
    num_cells = pixel_size * pixel_size
    seg = _masked_cells(cells, mask, num_cells)
    if weights is None:
        data = mask.astype(jnp.float32)
    else:
        data = jnp.where(mask, weights, 0.0).astype(jnp.float32)
    out = jax.ops.segment_sum(data, seg, num_segments=num_cells + 1)
    return out[:num_cells].reshape(pixel_size, pixel_size)


def dirichlet_probmap(count_sem, count_not_sem):
    """Posterior expectation of a 2-class Dirichlet with uniform prior
    (bev_generator.py:457-480): (c_sem + 1) / (c_sem + c_not + 2)."""
    return (count_sem + 1.0) / (count_sem + count_not_sem + 2.0)


def sem_probmap(cells, mask, sem_onehot_mask, pixel_size):
    """Probabilistic map of a semantic class set vs the rest
    (bev_generator.py:373-394).

    Args:
      sem_onehot_mask: (N,) bool — point belongs to the class set.
    """
    c_sem = count_map(cells, mask & sem_onehot_mask, pixel_size)
    c_not = count_map(cells, mask & ~sem_onehot_mask, pixel_size)
    return dirichlet_probmap(c_sem, c_not)


def intensity_map(cells, mask, intensity, pixel_size):
    """Mean intensity with +1 count regularizer: sum / (count + 1)
    (bev_generator.py:396-415)."""
    s = count_map(cells, mask, pixel_size, weights=intensity)
    c = count_map(cells, mask, pixel_size)
    return s / (c + 1.0)


def elevation_map(cells, mask, z, pixel_size):
    """Per-cell min z; unobserved cells are 0 (sem_bev.py:535-554)."""
    num_cells = pixel_size * pixel_size
    seg = _masked_cells(cells, mask, num_cells)
    zz = jnp.where(mask, z, jnp.inf).astype(jnp.float32)
    mn = jax.ops.segment_min(zz, seg, num_segments=num_cells + 1)[:num_cells]
    observed = count_map(cells, mask, pixel_size) > 0
    return jnp.where(observed, mn.reshape(pixel_size, pixel_size), 0.0)


def _hist_median(hist, counts, fill_value):
    """Exact median from a per-cell integer-value histogram.

    For n values, np.median = (v_{(n-1)//2} + v_{n//2}) / 2 where v_k is the
    k-th order statistic; both are read off the cumulative histogram. Exactly
    matches np.median over the cell's values (sem_bev.py:665-667) because
    colour values are integers.

    Args:
      hist: (C, B) per-cell histograms.
      counts: (C,) per-cell value counts.
      fill_value: value for empty cells (sem_bev.py:661-664).
    """
    cum = jnp.cumsum(hist, axis=-1)
    k1 = (counts - 1) // 2
    k2 = counts // 2
    v1 = jnp.argmax(cum > k1[:, None], axis=-1)
    v2 = jnp.argmax(cum > k2[:, None], axis=-1)
    med = 0.5 * (v1 + v2).astype(jnp.float32)
    return jnp.where(counts > 0, med, jnp.float32(fill_value))


def median_value_map(cells, mask, values, pixel_size, num_bins=256,
                     fill_value=0):
    """Per-cell exact median of integer-valued features -> (P,P) raster.

    Replaces the reference's per-cell Python-list median (sem_bev.py:619-669),
    its slowest code path, with one scatter into (P*P, num_bins) histograms
    plus a cumulative-count order-statistic readout.
    """
    num_cells = pixel_size * pixel_size
    vi = jnp.clip(values.astype(jnp.int32), 0, num_bins - 1)
    flat = _masked_cells(cells * num_bins + vi, mask, num_cells * num_bins)
    hist = jax.ops.segment_sum(
        mask.astype(jnp.int32), flat,
        num_segments=num_cells * num_bins + 1)[:-1]
    hist = hist.reshape(num_cells, num_bins)
    counts = hist.sum(axis=-1)
    med = _hist_median(hist, counts, fill_value)
    return med.reshape(pixel_size, pixel_size)


def rgb_median_maps(cells, mask, rgb, pixel_size, fill_value=0):
    """Per-cell median R/G/B maps (sem_bev.py:619-669). rgb: (N,3) in
    [0,255]. Returns (3,P,P)."""
    return jnp.stack([
        median_value_map(cells, mask, rgb[:, c], pixel_size,
                         fill_value=fill_value) for c in range(3)
    ])


def elevation_min_raw(cells, mask, z, pixel_size):
    """Per-cell min z with +inf for empty cells — the linear (pmin-combinable)
    form of elevation_map."""
    num_cells = pixel_size * pixel_size
    seg = _masked_cells(cells, mask, num_cells)
    zz = jnp.where(mask, z, jnp.inf).astype(jnp.float32)
    mn = jax.ops.segment_min(zz, seg, num_segments=num_cells + 1)[:num_cells]
    return mn.reshape(pixel_size, pixel_size)


def rgb_histograms(cells, mask, rgb, pixel_size, num_bins=256):
    """(3, P*P, num_bins) int32 per-cell colour histograms — the linear
    (psum-combinable) form of the median maps."""
    num_cells = pixel_size * pixel_size
    hists = []
    for c in range(3):
        vi = jnp.clip(rgb[:, c].astype(jnp.int32), 0, num_bins - 1)
        flat = _masked_cells(cells * num_bins + vi, mask,
                             num_cells * num_bins)
        h = jax.ops.segment_sum(mask.astype(jnp.int32), flat,
                                num_segments=num_cells * num_bins + 1)[:-1]
        hists.append(h.reshape(num_cells, num_bins))
    return jnp.stack(hists)


def split_accumulators(cells, mask, z, intensity, rgb, sem, sem_idxs,
                       pixel_size):
    """Linear per-split accumulators for one time split.

    Everything here combines across point shards with a plain sum (psum)
    except ``z_min`` which combines with min (pmin) — the basis of the
    point-sharded multi-chip rasterizer (SURVEY.md section 5: the raster,
    not the point set, crosses ICI).
    """
    road_sel = sem_class_mask(sem, [sem_idxs['road']])
    dyn_sel = sem_class_mask(sem,
                             [sem_idxs[name] for name in DYN_OBJ_CLASSES])
    return {
        'c_road': count_map(cells, mask & road_sel, pixel_size),
        'c_not_road': count_map(cells, mask & ~road_sel, pixel_size),
        'c_dynobj': count_map(cells, mask & dyn_sel, pixel_size),
        'c_not_dynobj': count_map(cells, mask & ~dyn_sel, pixel_size),
        'int_sum_road': count_map(cells, mask & road_sel, pixel_size,
                                  weights=intensity),
        'z_min': elevation_min_raw(cells, mask, z, pixel_size),
        'rgb_hist': rgb_histograms(cells, mask, rgb, pixel_size),
    }


def finalize_split(acc, pixel_size, rgb_fill=0):
    """Nonlinear channel readout from (possibly psum-combined) linear
    accumulators: Dirichlet expectation, mean intensity, elevation fill,
    histogram medians."""
    road = dirichlet_probmap(acc['c_road'], acc['c_not_road'])
    inten = acc['int_sum_road'] / (acc['c_road'] + 1.0)
    dyn = dirichlet_probmap(acc['c_dynobj'], acc['c_not_dynobj'])
    observed = (acc['c_road'] + acc['c_not_road']) > 0
    elev = jnp.where(observed, acc['z_min'], 0.0)
    counts = acc['rgb_hist'].sum(axis=-1)
    rgbm = jnp.stack([
        _hist_median(acc['rgb_hist'][c], counts[c], rgb_fill).reshape(
            pixel_size, pixel_size) for c in range(3)
    ]) / 255.0
    return {
        'road': road,
        'intensity': inten,
        'rgb': rgbm,
        'dynamic': dyn,
        'elevation': elev,
    }


def road_marking_transform(intensity_raster, int_scaler, int_sep_scaler,
                           int_mid_threshold):
    """Sigmoid contrast stretch for road-marking intensity
    (sem_bev.py:593-613), clipped from above at 1."""
    out = int_scaler * jax.nn.sigmoid(
        int_sep_scaler * (intensity_raster - int_mid_threshold))
    return jnp.minimum(out, 1.0)


def sem_class_mask(sem, class_idxs):
    """(N,) bool mask: sem in class_idxs (partition_semantic_pc,
    bev_generator.py:417-436)."""
    mask = jnp.zeros(sem.shape, dtype=bool)
    for c in class_idxs:
        mask |= sem == c
    return mask


def bev_split_channels(cells, mask, z, intensity, rgb, sem, sem_idxs,
                       pixel_size, rgb_fill=0):
    """All five channel families for one time split in one fused pass.

    Args:
      cells: (N,) flat raster cell ids (from geometry.grid_cell_index).
      mask: (N,) validity (in-view & static & split membership).
      z, intensity: (N,) point features.
      rgb: (N,3) colour values in [0,255].
      sem: (N,) semantic class ids.
      sem_idxs: name->idx dict (config.DEFAULT_SEM_IDXS).

    Returns dict with keys road, intensity (raw, pre road-marking transform),
    rgb (3,P,P in [0,1]), dynamic, elevation — the per-split channel set of
    SemBEVGenerator.generate_bev (sem_bev.py:57-118).
    """
    acc = split_accumulators(cells, mask, z, intensity, rgb, sem, sem_idxs,
                             pixel_size)
    return finalize_split(acc, pixel_size, rgb_fill=rgb_fill)
