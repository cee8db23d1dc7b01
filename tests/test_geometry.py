"""Geometry ops vs numpy oracles re-implemented from the reference semantics
(sem_pc_accum.py:347-402, bev_generator.py:207-255,737-747,
nuscenes_utils.py:46-60)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu.ops import geometry as geo


def np_velo2img_oracle(pc_velo, P, img_h, img_w, max_depth=np.inf):
    """Numpy oracle for sem_pc_accum.velo2img (sem_pc_accum.py:367-402)."""
    n = pc_velo.shape[0]
    homo = np.concatenate([pc_velo[:, :3], np.ones((n, 1))], axis=1)
    frame = (P @ homo.T).T
    depth = frame[:, 2].copy()
    depth[depth == 0] = -1e-6
    u = np.round(frame[:, 0] / np.abs(depth)).astype(int)
    v = np.round(frame[:, 1] / np.abs(depth)).astype(int)
    mask = (u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)
    mask &= (frame[:, 2] > 0) & (frame[:, 2] < max_depth)
    return u, v, mask


@pytest.fixture
def proj_matrix(rng):
    # Plausible pinhole intrinsics + velo->cam extrinsics.
    K = np.array([[700.0, 0, 620.0], [0, 700.0, 187.0], [0, 0, 1.0]])
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    # Camera looks along +x of velodyne: permute axes.
    perm = np.array([[0, -1.0, 0], [0, 0, -1.0], [1.0, 0, 0]])
    T = np.eye(4)
    T[:3, :3] = perm @ R
    T[:3, 3] = [0.1, -0.2, 0.3]
    return K @ T[:3]


def test_homo_transform_matches_matmul(rng):
    T = np.eye(4)
    ang = 0.7
    T[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    T[:3, 3] = [1.0, -2.0, 3.0]
    pts = rng.normal(size=(100, 3))
    homo = np.concatenate([pts, np.ones((100, 1))], axis=1)
    expected = (T @ homo.T).T[:, :3]
    got = geo.homo_transform(jnp.asarray(T), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_rigid_inverse_matches_f64_inverse(rng):
    """geo.rigid_inverse is the exact (R^T, -R^T t) form used on the
    per-frame pose chain instead of jnp.linalg.inv (whose LU runs at the
    TPU's truncating default matmul precision — CLAUDE.md gotcha)."""
    ang = 0.53
    T = np.eye(4)
    T[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    T[:3, 3] = [102.5, -37.25, 1.75]   # ~100 m travelled world pose
    got = np.asarray(geo.rigid_inverse(jnp.asarray(T, jnp.float32)),
                     np.float64)
    np.testing.assert_allclose(got, np.linalg.inv(T), atol=1e-4)
    np.testing.assert_allclose(got @ T, np.eye(4), atol=1e-4)


def test_project_to_image_matches_oracle(rng, proj_matrix):
    pc = rng.normal(size=(500, 3)) * 20.0
    u_o, v_o, m_o = np_velo2img_oracle(pc, proj_matrix, 376, 1408)
    u, v, m = geo.project_to_image(jnp.asarray(pc, jnp.float32),
                                   jnp.asarray(proj_matrix, jnp.float32),
                                   376, 1408)
    np.testing.assert_array_equal(np.asarray(m), m_o)
    np.testing.assert_array_equal(np.asarray(u)[m_o], u_o[m_o])
    np.testing.assert_array_equal(np.asarray(v)[m_o], v_o[m_o])


def test_project_max_depth(rng, proj_matrix):
    pc = rng.normal(size=(300, 3)) * 30.0
    _, _, m_o = np_velo2img_oracle(pc, proj_matrix, 376, 1408, max_depth=15.0)
    _, _, m = geo.project_to_image(jnp.asarray(pc, jnp.float32),
                                   jnp.asarray(proj_matrix, jnp.float32),
                                   376, 1408, max_depth=15.0)
    np.testing.assert_array_equal(np.asarray(m), m_o)


def test_paint_from_image_gathers_rgb(rng, proj_matrix):
    pc = rng.normal(size=(400, 3)) * 20.0
    img = rng.integers(0, 256, size=(376, 1408, 3)).astype(np.float32)
    u_o, v_o, m_o = np_velo2img_oracle(pc, proj_matrix, 376, 1408)
    feats, m = geo.paint_from_image(jnp.asarray(pc, jnp.float32),
                                    jnp.asarray(proj_matrix, jnp.float32),
                                    jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(m), m_o)
    expected = img[v_o[m_o], u_o[m_o]]
    np.testing.assert_array_equal(np.asarray(feats)[m_o], expected)


def test_semseg_filter_mask():
    sem = jnp.asarray([0, 10, 11, 13, 255, 5], jnp.float32)
    m = geo.semseg_filter_mask(sem, (10, 11, 12, 16, 18, 255))
    np.testing.assert_array_equal(np.asarray(m),
                                  [True, False, False, True, False, True])


def test_geometric_transform_oracle(rng):
    pts = rng.normal(size=(50, 3)) * 10.0
    ang, dx, dy = 1.1, 2.0, -3.0
    rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    expected = (rot @ pts.T).T
    expected[:, 0] += dx
    expected[:, 1] += dy
    got = geo.geometric_transform(jnp.asarray(pts), ang, dx, dy)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_crop_view_mask_strict():
    pts = jnp.asarray([[0.0, 0, 0], [40.0, 0, 0], [39.9, -39.9, 5],
                       [-40.0, 0, 0], [10, 41, 0]])
    m = geo.crop_view_mask(pts, 80.0)
    np.testing.assert_array_equal(np.asarray(m),
                                  [True, False, True, False, False])


def test_pos2grid_oracle(rng):
    xy = rng.uniform(-40, 40, size=(200, 2))
    expected = np.floor(xy / 80.0 * 256 + 0.5 * 256)
    got = geo.pos2grid(jnp.asarray(xy), 80.0, 256)
    np.testing.assert_array_equal(np.asarray(got), expected)


def test_grid_cell_index_matches_histogram_layout(rng):
    """Cell ids must agree with histogram2d(y, x) + flip(axis=0)
    (bev_generator.py:438-455)."""
    P = 16
    px = rng.integers(0, P, size=(300,))
    py = rng.integers(0, P, size=(300,))
    H, _, _ = np.histogram2d(py, px, range=[[0, P], [0, P]], bins=[P, P])
    H = np.flip(H, axis=0)
    cells = geo.grid_cell_index(jnp.asarray(px), jnp.asarray(py), P)
    got = np.bincount(np.asarray(cells), minlength=P * P).reshape(P, P)
    np.testing.assert_array_equal(got, H)


def test_heading_rot_ang():
    traj = jnp.asarray([[0.0, 0, 0], [1.0, 1.0, 0]])
    # rot_ang = pi - (pi/2 + atan2(1,1)) = pi/4
    got = geo.heading_rot_ang(traj)
    np.testing.assert_allclose(float(got), np.pi / 4, atol=1e-6)
    single = jnp.asarray([[0.0, 0, 0]])
    np.testing.assert_allclose(float(geo.heading_rot_ang(single)), np.pi / 2,
                               atol=1e-6)
