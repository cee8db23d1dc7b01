"""TPU-native ICP ego-motion registration.

Replaces Open3D's point-to-plane registration + normal estimation + KD-tree
(C++) used at kitti360_sem_pc_accum.py:123-126 / sem_pc_accum.py:310-315.

TPU-first design (SURVEY.md section 7 decision 7):
  * clouds are voxel-grid downsampled into a FIXED-capacity centroid set via
    hash scatter-means (no dynamic shapes);
  * nearest-neighbor search is a dense pairwise-distance computation — the
    cross term is a (M,3)x(3,M) matmul, i.e. MXU work, which at M~8k beats
    any host KD-tree by orders of magnitude;
  * normals are smallest-eigenvectors of k-NN covariance (batched eigh);
  * the 6-DoF point-to-plane solve is Gauss-Newton with a fixed iteration
    count under lax.scan, correspondences rejected beyond
    ``max_corr_dist`` (the reference's icp_threshold,
    run_kitti360_bev_gen.py:71).

Convention: ``register(source, target)`` returns T mapping source-frame
coords to target-frame coords, minimizing target-normal residuals — matching
o3d.registration_icp(source=prev, target=new) whose transformation is
T_new_prev (kitti360_sem_pc_accum.py:119-127).

Validation boundary (what is pinned vs what is not): this module is
validated against SYNTHETIC oracles — exact rigid-transform recovery on
randomized clouds, drift bounds over simulated drives, contamination /
degenerate-geometry behavior, and normal-direction correctness
(tests/test_icp.py) — NOT against Open3D's numerics, because Open3D is not
installable in the build environment. The reference's operating point
(threshold 1e3, kitti360_sem_pc_accum.py:123-126 via
run_kitti360_bev_gen.py:71) accepts nearly every correspondence, so both
solvers optimize the same point-to-plane objective and should agree to
local-quadratic-solver tolerance on well-conditioned scans — that claim is
ARGUED, not measured. tools/compare_icp_open3d.py is the ready-to-run
numerical comparison for any Open3D-capable host (same call sequence as
the reference, per-pair rotation/translation deltas + GT residuals).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


class ICPCloud(NamedTuple):
    """Fixed-capacity downsampled cloud with normals."""
    points: jax.Array    # (M,3)
    normals: jax.Array   # (M,3)
    valid: jax.Array     # (M,)


def strided_subsample(points, valid, max_out):
    """Fixed-shape uniform subsample of a prefix-packed padded cloud.

    Picks ``max_out`` evenly spaced valid points (indices floor(i*n/M));
    repeats points when n < M (harmless for registration). Unlike a hashed
    voxel merge, this never fabricates geometry — and point-to-plane
    residuals are first-order insensitive to in-surface sampling offsets, so
    subsampling does not bias the solve.

    Requires valid points to occupy a prefix of the buffer (true for raw
    frame padding).
    """
    n = jnp.sum(valid.astype(jnp.int32))
    idx = (jnp.arange(max_out) * n) // max_out
    idx = jnp.clip(idx, 0, points.shape[0] - 1)
    return points[idx], jnp.full((max_out,), n > 0)


def voxel_downsample(points, valid, voxel_size, max_out):
    """Voxel-grid downsample via hash scatter-mean into ``max_out`` slots.

    WARNING: hash collisions merge distinct voxels into fabricated
    centroids; only use with max_out several times the occupied voxel
    count. ICP preprocessing uses strided_subsample instead.
    """
    v = jnp.floor(points / voxel_size).astype(jnp.int32)
    h = (v[:, 0] * 73856093) ^ (v[:, 1] * 19349663) ^ (v[:, 2] * 83492791)
    slot = jnp.where(valid, jnp.abs(h) % max_out, max_out)
    w = valid.astype(jnp.float32)
    sums = jax.ops.segment_sum(points * w[:, None], slot,
                               num_segments=max_out + 1)[:max_out]
    cnts = jax.ops.segment_sum(w, slot, num_segments=max_out + 1)[:max_out]
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    return centroids, cnts > 0


def _pairwise_sqdist(a, b, b_valid):
    """(Na,Nb) squared distances; invalid b columns -> +inf. The cross term
    rides the MXU."""
    cross = jnp.dot(a, b.T, precision=_HIGHEST)
    d2 = (jnp.sum(a * a, axis=1)[:, None] - 2.0 * cross
          + jnp.sum(b * b, axis=1)[None, :])
    return jnp.where(b_valid[None, :], d2, jnp.inf)


def _smallest_eigvec_sym3(A):
    """Smallest eigenvector of a batch of symmetric (…,3,3) matrices via
    the closed-form trigonometric (Cardano) eigenvalue solution — pure
    vector ops, ~10x faster on TPU than batched LAPACK-style eigh for
    tiny matrices. The eigenvector is the strongest cross product of two
    rows of (A - lambda_min I) (rank-2, so any two independent rows span
    the orthogonal complement)."""
    q = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None] / 3.0
    B = A - q * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues q + 2p cos(phi + 2k pi/3); k=1 gives the smallest.
    lam_min = (q[..., 0, 0] + 2.0 * p
               * jnp.cos(phi + 2.0 * jnp.pi / 3.0))
    C = A - lam_min[..., None, None] * jnp.eye(3, dtype=A.dtype)
    # Cross products of row pairs; pick the largest-norm one.
    c01 = jnp.cross(C[..., 0, :], C[..., 1, :])
    c02 = jnp.cross(C[..., 0, :], C[..., 2, :])
    c12 = jnp.cross(C[..., 1, :], C[..., 2, :])
    cands = jnp.stack([c01, c02, c12], axis=-2)          # (...,3,3)
    norms = jnp.sum(cands * cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1),
                            axis=-2)[..., 0, :]
    # Degenerate (isotropic) neighborhoods: fall back to +z.
    ok = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)) > 1e-20
    v = jnp.where(ok, v, jnp.array([0.0, 0.0, 1.0], A.dtype))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _knn_indices(d2, k):
    """(M,k) nearest-neighbor indices by iterative argmin extraction.

    lax.top_k over a (M,M) distance matrix lowers to a per-row sort —
    batched sorts run ~2x slower than serial on TPU and sort 400x more
    elements than needed at k=10. k argmin sweeps are pure VPU reductions
    plus a tiny row scatter each."""
    rows = jnp.arange(d2.shape[0])
    idxs = []
    for _ in range(k):
        i = jnp.argmin(d2, axis=1)
        idxs.append(i)
        d2 = d2.at[rows, i].set(jnp.inf)
    return jnp.stack(idxs, axis=1)


def estimate_normals(points, valid, k=10):
    """k-NN covariance normals (replaces pcd.estimate_normals,
    sem_pc_accum.py:310-315). Smallest eigenvector of the neighborhood
    covariance, closed-form (see _smallest_eigvec_sym3)."""
    d2 = _pairwise_sqdist(points, points, valid)
    idx = _knn_indices(d2, k)                # (M,k) nearest (incl. self)
    nbrs = points[idx]                       # (M,k,3)
    mean = nbrs.mean(axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum('mki,mkj->mij', centered, centered,
                     precision=_HIGHEST) / k
    return _smallest_eigvec_sym3(cov)


def _so3_hat(w):
    return jnp.array([[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]],
                      [-w[1], w[0], 0.0]])


def se3_exp(delta):
    """SE(3) exponential: delta = [omega(3), v(3)] -> (4,4), with Taylor
    guards near theta = 0."""
    omega, v = delta[:3], delta[3:]
    theta = jnp.linalg.norm(omega)
    K = _so3_hat(omega)
    t2 = theta * theta
    small = theta < 1e-6
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / jnp.where(
        small, 1.0, theta))
    b = jnp.where(small, 0.5 - t2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, t2))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(small, 1.0,
                                                       t2 * theta))
    KK = jnp.matmul(K, K, precision=_HIGHEST)
    R = jnp.eye(3) + a * K + b * KK
    V = jnp.eye(3) + b * K + c * KK
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(
        jnp.matmul(V, v, precision=_HIGHEST))
    return T


def make_register_fn(num_iters=12, damping=1e-6, trim_ratio=0.9):
    """Build a jitted point-to-plane registration fn.

    ``trim_ratio`` drops the worst (1-ratio) correspondences by NN distance
    each iteration (trimmed ICP): frame boundaries have no true counterpart
    and would otherwise bias the solve — Open3D hides this behind cloud
    density the fixed-shape path cannot assume.

    fn(source: ICPCloud, target: ICPCloud, T_init (4,4), max_corr_dist)
      -> (T (4,4), rmse scalar, n_corr scalar)
    """

    def step(T, it, src, tgt, max_corr_dist):
        p = jnp.dot(src.points, T[:3, :3].T, precision=_HIGHEST) + T[:3, 3]
        d2 = _pairwise_sqdist(p, tgt.points, tgt.valid)
        nn_d2 = jnp.min(d2, axis=1)
        nn = jnp.argmin(d2, axis=1)
        q = tgt.points[nn]
        n = tgt.normals[nn]
        w = (src.valid & (nn_d2 < max_corr_dist**2)).astype(jnp.float32)
        if trim_ratio < 1.0:
            # Annealed trim: early iterations keep every correspondence (the
            # far ones carry the motion signal); once near-converged, drop
            # the worst tail — true matches are then tight and the tail is
            # frame-boundary points with no real counterpart.
            finite_d2 = jnp.where(w > 0, nn_d2, jnp.nan)
            cutoff = jnp.nanquantile(finite_d2, trim_ratio)
            trim_on = it >= num_iters // 2
            w = jnp.where(trim_on & (nn_d2 > cutoff), 0.0, w)
        r = jnp.sum((p - q) * n, axis=1)
        J = jnp.concatenate([jnp.cross(p, n), n], axis=1)    # (M,6)
        Jw = J * w[:, None]
        H = jnp.dot(Jw.T, J, precision=_HIGHEST) + damping * jnp.eye(6)
        g = jnp.matmul(Jw.T, r, precision=_HIGHEST)
        delta = -jnp.linalg.solve(H, g)
        T_new = jnp.matmul(se3_exp(delta), T, precision=_HIGHEST)
        n_corr = jnp.sum(w)
        rmse = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(n_corr, 1.0))
        # Degenerate guard: too few correspondences -> hold T.
        ok = n_corr >= 6
        T_new = jnp.where(ok, T_new, T)
        return T_new, (rmse, n_corr)

    @jax.jit
    def register(source: ICPCloud, target: ICPCloud, T_init, max_corr_dist):
        body = functools.partial(step, src=source, tgt=target,
                                 max_corr_dist=max_corr_dist)
        T, (rmse, n_corr) = jax.lax.scan(body, T_init.astype(jnp.float32),
                                         jnp.arange(num_iters))
        return T, rmse[-1], n_corr[-1]

    return register


def make_coarse_to_fine_register_fn(num_iters=16, damping=1e-6,
                                    trim_ratio=0.9, coarse_factor=8,
                                    coarse_iters=10):
    """Two-stage registration: a coarse solve on strided sub-clouds (cheap
    — the pairwise matrix shrinks by coarse_factor^2) seeds the full-
    resolution solve. Widens the convergence basin for large inter-frame
    motion, which neither identity init (the reference's setting,
    sem_pc_accum.py:88) nor a warm start can rescue after one bad frame.

    Same signature as make_register_fn.
    """
    coarse = make_register_fn(coarse_iters, damping, trim_ratio)
    fine = make_register_fn(num_iters, damping, trim_ratio)

    def strided(c: ICPCloud) -> ICPCloud:
        return ICPCloud(points=c.points[::coarse_factor],
                        normals=c.normals[::coarse_factor],
                        valid=c.valid[::coarse_factor])

    @jax.jit
    def register(source: ICPCloud, target: ICPCloud, T_init, max_corr_dist):
        T0, _, _ = coarse(strided(source), strided(target), T_init,
                          max_corr_dist)
        return fine(source, target, T0, max_corr_dist)

    return register


def make_preprocess_fn(voxel_size, max_out, normal_k=10):
    """Build a jitted cloud-preprocess fn: raw padded (N,>=3) + valid ->
    ICPCloud (strided subsample + k-NN covariance normals). ``voxel_size``
    is kept in the signature for config compatibility but unused."""
    del voxel_size

    @jax.jit
    def preprocess(points, valid):
        sub, v = strided_subsample(points[:, :3], valid, max_out)
        normals = estimate_normals(sub, v, k=normal_k)
        return ICPCloud(points=sub, normals=normals, valid=v)

    return preprocess
