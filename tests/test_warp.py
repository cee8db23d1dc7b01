"""Warp ops vs numpy oracles re-implemented from bev_generator.py:482-698 /
utils/bev_data_aug.py:7-166."""
import math

import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu.ops import warp

P = 64


def oracle_warp_dense(probmaps, a_1, a_2, b_1, b_2):
    """Oracle for warp_dense_probmaps (bev_generator.py:482-525)."""
    N, I, J = probmaps.shape
    B = np.zeros((N, I, J))
    for i_w in range(I):
        for j_w in range(J):
            i = int(np.rint(a_1 * i_w + a_2 * i_w**2))
            j = int(np.rint(b_1 * j_w + b_2 * j_w**2))
            i = min(max(i, 0), I - 1)
            j = min(max(j, 0), J - 1)
            B[:, j_w, i_w] = probmaps[:, j, i]
    return B


def oracle_warp_point(x, y, a_1, a_2, b_1, b_2, I, J):
    """Oracle for warp_point (bev_generator.py:548-593)."""
    if math.isclose(a_2, 0.0, abs_tol=1e-6):
        xw = x
    else:
        xw = int(np.rint((-a_1 + np.sqrt(a_1**2 + 4 * a_2 * x)) / (2 * a_2)))
    if math.isclose(b_2, 0.0, abs_tol=1e-6):
        yw = y
    else:
        yw = int(np.rint((-b_1 + np.sqrt(b_1**2 + 4 * b_2 * y)) / (2 * b_2)))
    xw = min(max(xw, 0), I - 1)
    yw = min(max(yw, 0), J - 1)
    return xw, yw


def test_cal_warp_params_boundary_conditions():
    """The quadratic must pass through (0,0), (idx_max,idx_max), and
    (idx_0,idx_1) (bev_generator.py:658-683)."""
    a1, a2 = warp.cal_warp_params(40.0, 32.0, P - 1)
    poly = lambda k: a1 * k + a2 * k * k
    assert abs(poly(0.0)) < 1e-9
    assert abs(poly(P - 1) - (P - 1)) < 1e-9
    assert abs(poly(40.0) - 32.0) < 1e-9


def test_warp_dense_maps_matches_oracle(rng):
    maps = rng.uniform(size=(3, P, P))
    i_warp, j_warp = 38.0, 25.0
    a1, a2 = warp.cal_warp_params(i_warp, P // 2, P - 1)
    b1, b2 = warp.cal_warp_params(j_warp, P // 2, P - 1)
    expected = oracle_warp_dense(maps, a1, a2, b1, b2)
    got = warp.warp_dense_maps(jnp.asarray(maps), a1, a2, b1, b2)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-12)


def test_warp_dense_identity():
    maps = np.arange(P * P, dtype=np.float64).reshape(1, P, P)
    # idx_0 == idx_1 == midpoint -> identity polynomial.
    a1, a2 = warp.cal_warp_params(P // 2, P // 2, P - 1)
    got = warp.warp_dense_maps(jnp.asarray(maps), a1, a2, a1, a2)
    np.testing.assert_allclose(np.asarray(got), maps, atol=1e-12)


def test_warp_sparse_points_matches_oracle(rng):
    pnts = rng.integers(0, P, size=(30, 3)).astype(np.float64)
    i_warp, j_warp = 38.0, 25.0
    j_mid = P // 2
    a1, a2 = warp.cal_warp_params(i_warp, j_mid, P - 1)
    # Oracle reproduces warp_sparse_points (bev_generator.py:527-545):
    j_warp_rev = P - j_warp
    b1r, b2r = warp.cal_warp_params(j_warp_rev, j_mid, P - 1)
    expected = pnts.copy()
    for r in range(pnts.shape[0]):
        xw, yw = oracle_warp_point(pnts[r, 0], pnts[r, 1], a1, a2, b1r, b2r,
                                   P, P)
        expected[r, 0] = xw
        expected[r, 1] = yw
    got = warp.warp_sparse_points(pnts.copy(), a1, a2, j_mid, j_warp, P)
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_get_random_warp_params_bounds(rng):
    for _ in range(100):
        i_w, j_w = warp.get_random_warp_params(0.15, 0.30, P, P, rng=rng)
        max_val = 0.30 * (P / 2)
        assert abs(i_w - P // 2) <= max_val + 1e-9
        assert abs(j_w - P // 2) <= max_val + 1e-9
