"""Trajectory crop vs a bisection oracle re-implemented from
bev_generator.py:257-371."""
import numpy as np

from pc_accumulation_lib_tpu.ops import trajectory as tr

V = 80.0


def oracle_point_in_box(x, y, bx0, by0, bx1, by1):
    return (bx0 < x < bx1) and (by0 < y < by1)


def oracle_intersec_bisect(x0, y0, x1, y1, bbox, thresh=1e-4):
    """Midpoint bisection oracle (bev_generator.py:322-371)."""
    bx0, by0, bx1, by1 = bbox
    diff = np.inf
    while diff > thresh:
        xm, ym = 0.5 * (x0 + x1), 0.5 * (y0 + y1)
        p0_in = oracle_point_in_box(x0, y0, bx0, by0, bx1, by1)
        m_in = oracle_point_in_box(xm, ym, bx0, by0, bx1, by1)
        if m_in == p0_in:
            diff = np.hypot(xm - x0, ym - y0)
            x0, y0 = xm, ym
        else:
            diff = np.hypot(xm - x1, ym - y1)
            x1, y1 = xm, ym
    return xm, ym


def oracle_crop_trajectory(traj, view_size):
    """Oracle for crop_trajectory (bev_generator.py:257-315)."""
    half = 0.5 * view_size
    bbox = [-half, -half, half, half]
    out = []
    for idx in range(traj.shape[0] - 1):
        x0, y0, z0 = traj[idx]
        x1, y1 = traj[idx + 1][:2]
        p0_in = oracle_point_in_box(x0, y0, *bbox)
        p1_in = oracle_point_in_box(x1, y1, *bbox)
        if not p0_in and not p1_in:
            continue
        elif p0_in and p1_in:
            out.append([x0, y0, z0])
        elif p0_in and not p1_in:
            out.append([x0, y0, z0])
            ix, iy = oracle_intersec_bisect(x0, y0, x1, y1, bbox)
            out.append([ix, iy, z0])
        else:
            ix, iy = oracle_intersec_bisect(x0, y0, x1, y1, bbox)
            out.append([ix, iy, z0])
    return np.array(out) if out else np.zeros((0, 3))


def test_crop_matches_bisection_oracle(rng):
    for _ in range(20):
        # Random walk crossing the box boundary repeatedly.
        steps = rng.normal(size=(30, 3)) * 15.0
        traj = np.cumsum(steps, axis=0)
        expected = oracle_crop_trajectory(traj, V)
        got = tr.crop_trajectory(traj, V)
        assert got.shape == expected.shape
        if expected.shape[0]:
            np.testing.assert_allclose(got, expected, atol=2e-4)


def test_crop_fully_inside_drops_last_point():
    """Reference quirk: the loop never appends the final pose
    (bev_generator.py:274-307)."""
    traj = np.array([[0.0, 0, 0], [1, 1, 1], [2, 2, 2]])
    got = tr.crop_trajectory(traj, V)
    np.testing.assert_allclose(got, traj[:2])


def test_crop_fully_outside_returns_empty():
    traj = np.array([[100.0, 100, 0], [120, 120, 0]])
    got = tr.crop_trajectory(traj, V)
    assert got.shape == (0, 3)


def test_single_point_returns_empty():
    traj = np.array([[0.0, 0, 0]])
    assert tr.crop_trajectory(traj, V).shape == (0, 3)


def test_geometric_transform_traj(rng):
    traj = rng.normal(size=(10, 3)) * 5.0
    got = tr.geometric_transform_traj(traj, 0.0, 0.0, 0.0, V)
    np.testing.assert_allclose(got, traj[:-1], atol=1e-12)


def test_pos2grid_traj():
    traj = np.array([[0.0, 0.0, 1.5], [-40.0, 39.9, 2.0]])
    got = tr.pos2grid_traj(traj, V, 256)
    np.testing.assert_allclose(got[:, 2], [1.5, 2.0])
    np.testing.assert_allclose(got[0, :2], [128, 128])
    np.testing.assert_allclose(got[1, :2], [0, 255])
