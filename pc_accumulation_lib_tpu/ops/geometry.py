"""Core geometry ops: homogeneous transforms, camera projection, point
painting, BEV view-frame mapping.

All functions are pure jnp with static shapes; point subsets are expressed as
boolean masks rather than gathers so everything stays jit/vmap/shard_map
friendly (SURVEY.md section 7 decision 1).

Reference semantics reproduced here (cited per function):
  - homogeneous transform        datasets/nuscenes_utils.py:46-60
  - velo->frame / velo->img      sem_pc_accum.py:347-402
  - point painting               sem_pc_accum.py:323-345
  - geometric transform + crop   bev_generator/bev_generator.py:207-255
  - pos2grid                     bev_generator/bev_generator.py:737-747
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose/projection matmuls are tiny but parity-critical: keep them in full
# f32 on the MXU (TPU default is bf16 passes, ~1e-2 error at 100 m scale).
_HIGHEST = jax.lax.Precision.HIGHEST


def rotation_matrix_z(ang):
    """3x3 rotation about +z (bev_generator.py:732-735)."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, zero]),
        jnp.stack([s, c, zero]),
        jnp.stack([zero, zero, one]),
    ])


def rigid_inverse(T):
    """Exact inverse of a rigid (4,4) transform: (R^T, -R^T t), matmul at
    precision=HIGHEST. A general ``jnp.linalg.inv`` runs its LU solve at
    the TPU's default (truncating, ~bf16) matmul precision — on a pose
    CHAIN composed every frame that error accumulates into world-pose
    drift vs the host-f64 trajectory overlays (CLAUDE.md precision
    gotcha), while the rigid form is both exact and cheaper."""
    R, t = T[:3, :3], T[:3, 3]
    out = jnp.zeros((4, 4), T.dtype)
    out = out.at[:3, :3].set(R.T)
    out = out.at[:3, 3].set(-jnp.matmul(R.T, t, precision=_HIGHEST))
    return out.at[3, 3].set(1.0)


def homo_transform(T, points):
    """Apply a (4,4) homogeneous transform to (N,3) points -> (N,3).

    Matches ``homo_transform`` (nuscenes_utils.py:46-60) / ``update_sem_pcs``
    (sem_pc_accum.py:167-183) math without materialising the homogeneous
    column: x' = R x + t.
    """
    return jnp.dot(points, T[:3, :3].T, precision=_HIGHEST) + T[:3, 3]


def velo2frame(points, P_velo_frame):
    """(N,3) velodyne coords -> (N,3) image-frame coords via (3,4) projection
    (sem_pc_accum.py:347-365)."""
    return jnp.dot(points, P_velo_frame[:, :3].T,
                   precision=_HIGHEST) + P_velo_frame[:, 3]


def project_to_image(points, P_velo_frame, img_h, img_w, max_depth=jnp.inf):
    """Project (N,3) velodyne points into pixel coords.

    Returns (u, v, mask): integer pixel coords (rounded like
    sem_pc_accum.py:386-387) and the in-image/in-front validity mask
    (sem_pc_accum.py:389-394). Fixed shape; callers combine ``mask`` with
    their own validity masks instead of dropping rows.
    """
    frame = velo2frame(points, P_velo_frame)
    depth = frame[:, 2]
    # Reference nudges exact zeros to -1e-6 before the |depth| divide
    # (sem_pc_accum.py:385).
    safe_depth = jnp.where(depth == 0.0, -1e-6, depth)
    abs_depth = jnp.abs(safe_depth)
    u = jnp.round(frame[:, 0] / abs_depth).astype(jnp.int32)
    v = jnp.round(frame[:, 1] / abs_depth).astype(jnp.int32)
    mask = ((u >= 0) & (u < img_w) & (v >= 0) & (v < img_h)
            & (depth > 0.0) & (depth < max_depth))
    return u, v, mask


def paint_from_image(points, P_velo_frame, feature_map, max_depth=jnp.inf):
    """Gather per-point features from an image by projection ("point
    painting", sem_pc_accum.py:323-345).

    Args:
      points: (N,3) velodyne xyz.
      P_velo_frame: (3,4) projection matrix.
      feature_map: (H,W,K) image-aligned features (RGB and/or semantics).

    Returns:
      feats: (N,K) gathered features (garbage where mask is False).
      mask: (N,) bool — point projects inside the image with depth > 0.
    """
    img_h, img_w = feature_map.shape[0], feature_map.shape[1]
    u, v, mask = project_to_image(points, P_velo_frame, img_h, img_w,
                                  max_depth)
    ui = jnp.clip(u, 0, img_w - 1)
    vi = jnp.clip(v, 0, img_h - 1)
    feats = feature_map[vi, ui]
    return feats, mask


def semseg_filter_mask(sem, filters):
    """True for points whose semantic class is NOT filtered out
    (sem_pc_accum.py:317-321).

    Args:
      sem: (N,) semantic class ids (float or int).
      filters: static tuple/list of class ids to remove.
    """
    mask = jnp.ones(sem.shape, dtype=bool)
    for f in filters:
        mask &= sem != f
    return mask


def geometric_transform(xyz, rot_ang, trans_dx, trans_dy):
    """Rotate about z then translate in xy (bev_generator.py:207-237, minus
    the crop which is a separate mask here)."""
    rot = rotation_matrix_z(rot_ang)
    out = jnp.dot(xyz, rot.T, precision=_HIGHEST)
    return out.at[:, 0].add(trans_dx).at[:, 1].add(trans_dy)


def crop_view_mask(xyz, view_size):
    """Strict open-interval view-frame crop (bev_generator.py:239-255)."""
    half = 0.5 * view_size
    return ((xyz[:, 0] > -half) & (xyz[:, 0] < half)
            & (xyz[:, 1] > -half) & (xyz[:, 1] < half))


def pos2grid(xy, view_size, pixel_size):
    """Metric xy -> integer pixel coords: floor(x/view*P + P/2)
    (bev_generator.py:737-747)."""
    return jnp.floor(xy / view_size * pixel_size + 0.5 * pixel_size)


def grid_cell_index(px, py, pixel_size):
    """Map integer pixel coords to a flat raster cell id.

    The reference writes rasters with row = P-1-y (Cartesian-to-image flip:
    histogram2d + flip(axis=0) at bev_generator.py:438-455; explicit
    ``j_rev = P-1-j`` loops at sem_bev.py:546, :648). Returns int32 ids in
    [0, P*P).
    """
    row = pixel_size - 1 - py.astype(jnp.int32)
    col = px.astype(jnp.int32)
    return row * pixel_size + col


def heading_rot_ang(ego_traj_present):
    """Heading-aligned BEV rotation angle (bev_generator.py:87-93).

    Args:
      ego_traj_present: (N,3) present ego trajectory, N >= 1.
    Returns the rot_ang scalar applied when no random augmentation is drawn.
    """
    rot_ang = 0.5 * jnp.pi
    n = ego_traj_present.shape[0]
    if n > 1:
        dx = ego_traj_present[-1, 0] - ego_traj_present[-2, 0]
        dy = ego_traj_present[-1, 1] - ego_traj_present[-2, 1]
        rot_ang = rot_ang + jnp.arctan2(dy, dx)
    return jnp.pi - rot_ang
