"""Polynomial BEV warping augmentation.

Reference: bev_generator/bev_generator.py:482-698 (class-based copy of the
legacy utils/bev_data_aug.py:7-166). The dense warp there is a Python double
loop over all pixels; here it is a batched gather with precomputed row/column
index maps — identical output, one XLA op. The sparse (trajectory) warp is
the closed-form inverse of the quadratic, matching warp_point
(bev_generator.py:548-593) including its int-rounding and clipping.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cal_warp_params(idx_0, idx_1, idx_max):
    """Quadratic warp coefficients (a_1, a_2) through (0,0), (idx_max,
    idx_max) and (idx_0, idx_1) (bev_generator.py:658-683)."""
    a_1 = (idx_1 - idx_0**2 / idx_max) / (idx_0 * (1.0 - idx_0 / idx_max))
    a_2 = (1.0 - a_1) / idx_max
    return a_1, a_2


def get_random_warp_params(mean_ratio, max_ratio, I, J, rng=None):
    """Random warp anchor (i_warp, j_warp) (bev_generator.py:621-656).

    Host-side RNG (numpy Generator); reference distribution: |N(mean, max)|
    clipped to max, random sign, offset from the image midpoint.
    """
    rng = np.random.default_rng() if rng is None else rng
    max_val = max_ratio * (I / 2.0)
    mean_val = mean_ratio * max_val
    i_warp = rng.normal(mean_val, max_val)
    j_warp = rng.normal(mean_val, max_val)
    if abs(i_warp) > max_val:
        i_warp = max_val
    if abs(j_warp) > max_val:
        j_warp = max_val
    if rng.random() < 0.5:
        i_warp = -i_warp
    if rng.random() < 0.5:
        j_warp = -j_warp
    return (int(I / 2) + i_warp, int(J / 2) + j_warp)


def _poly_index_map(a_1, a_2, n):
    """Source index for each destination index: clip(rint(a1*k + a2*k^2))
    (bev_generator.py:507-520)."""
    k = jnp.arange(n, dtype=jnp.float32)
    src = jnp.rint(a_1 * k + a_2 * k * k).astype(jnp.int32)
    return jnp.clip(src, 0, n - 1)


def warp_dense_maps(maps, a_1, a_2, b_1, b_2):
    """Warp a stack of dense maps (C,I,J) -> (C,I,J).

    Matches warp_dense_probmaps (bev_generator.py:482-525):
    B[:, jw, iw] = A[:, j(jw), i(iw)] with j from the b-params over the row
    index and i from the a-params over the column index. The warp is
    separable, so it lowers as two single-axis takes instead of one 2-D
    fancy gather (which XLA runs at scatter speed, ~1e8 elem/s — measured
    ~10 ms per 24x256x256 stack on TPU v5e; the takes are ~free).
    """
    n_rows, n_cols = maps.shape[-2], maps.shape[-1]
    row_src = _poly_index_map(b_1, b_2, n_rows)
    col_src = _poly_index_map(a_1, a_2, n_cols)
    return jnp.take(jnp.take(maps, row_src, axis=-2), col_src, axis=-1)


def warp_dense_maps_np(maps, a_1, a_2, b_1, b_2):
    """Numpy twin of warp_dense_maps for HOST-side warping.

    The warp is a pure reindexing, so it commutes with every elementwise
    op after it; the sparse fetch path (bev/core.py pack='sparse') ships
    PRE-warp cells (warp duplication inflates occupancy ~1.5x, measured
    up to 18.7k vs 12.6k cells) and applies the warp here after decode.
    Index math is float32 rint/clip, bit-identical to the jnp version.
    """
    import numpy as _np
    n_rows, n_cols = maps.shape[-2], maps.shape[-1]

    def idx_map(a1, a2, n):
        k = _np.arange(n, dtype=_np.float32)
        src = _np.rint(_np.float32(a1) * k
                       + _np.float32(a2) * k * k).astype(_np.int32)
        return _np.clip(src, 0, n - 1)

    # One flat gather instead of two per-axis takes: this runs per sample
    # on the (single-core) host, and each take copies the full stack.
    ri = idx_map(b_1, b_2, n_rows)
    ci = idx_map(a_1, a_2, n_cols)
    flat = (ri[:, None] * n_cols + ci[None, :]).reshape(-1)
    lead = maps.shape[:-2]
    out = maps.reshape(lead + (n_rows * n_cols,))[..., flat]
    return out.reshape(lead + (n_rows, n_cols))


def _inverse_quadratic(x, a_1, a_2):
    """Closed-form inverse of y = a1*x + a2*x^2 with the reference's
    degenerate-case guard (bev_generator.py:570-581). Pure numpy: this runs
    on tiny host-side trajectory arrays (device dispatch would cost a
    round trip per call)."""
    x = np.asarray(x, np.float64)
    disc = a_1 * a_1 + 4.0 * a_2 * x
    inv = np.rint((-a_1 + np.sqrt(np.maximum(disc, 0.0)))
                  / (2.0 * a_2 + 1e-30))
    return np.where(abs(a_2) < 1e-6, x, inv)


def warp_points_xy(x, y, a_1, a_2, b_1, b_2, I, J):
    """Inverse-warp point coordinates, int-rounded and clipped like
    warp_point (bev_generator.py:548-593). Host numpy."""
    xw = np.clip(_inverse_quadratic(x, a_1, a_2), 0, I - 1)
    yw = np.clip(_inverse_quadratic(y, b_1, b_2), 0, J - 1)
    return xw, yw


def warp_sparse_points(pnts, a_1, a_2, j_mid, j_warp, pixel_size):
    """Warp sparse (N,>=2) pixel-coordinate points in place-semantics.

    Matches warp_sparse_points (bev_generator.py:527-545): x uses the
    a-params; y uses b-params recomputed from the REVERSED j anchor
    (j_warp_rev = P - j_warp), reproducing the reference's axis flip.
    """
    j_warp_rev = pixel_size - j_warp
    b_1_rev, b_2_rev = cal_warp_params(j_warp_rev, j_mid, pixel_size - 1)
    xw, yw = warp_points_xy(np.asarray(pnts[:, 0]), np.asarray(pnts[:, 1]),
                            a_1, a_2, b_1_rev, b_2_rev, pixel_size,
                            pixel_size)
    out = np.asarray(pnts).copy()
    out[:, 0] = xw
    out[:, 1] = yw
    return out


def warp_trajs(trajs, a_1, a_2, j_mid, j_warp, pixel_size):
    """Warp a list of (N,3) pixel-space trajectories (bev_generator.py:685-698)."""
    return [
        warp_sparse_points(t, a_1, a_2, j_mid, j_warp, pixel_size)
        if t.shape[0] > 0 else t for t in trajs
    ]
