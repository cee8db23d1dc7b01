"""Compare ops/icp.py against Open3D's point-to-plane ICP — run this on an
Open3D-capable host (Open3D is not installable in the build environment, so
the in-repo ICP validation is synthetic-oracle based; see ops/icp.py
"Validation boundary"). This script is the ready-to-run other half.

What it does, per frame pair:
  1. builds two clouds — consecutive synthetic KITTI-360-like scans
     (default) or two real `.bin` files passed on the CLI —
  2. registers the pair with the reference's exact Open3D call —
     registration_icp(pcd_prev, pcd_new, threshold=1e3, identity init,
     TransformationEstimationPointToPlane), whose result it names
     T_new_prev (/root/reference/kitti360_sem_pc_accum.py:119-127,
     sem_pc_accum.py:85-92) — normals from pcd.estimate_normals
     (sem_pc_accum.py:310-315),
  3. registers the same pair with this repo's jitted coarse-to-fine
     point-to-plane solve (ops/icp.py, CPU backend), and
  4. prints per-pair rotation (deg) and translation (m) deltas between the
     two transforms plus each solver's residual against the ground truth
     when one is known (synthetic mode knows it).

Interpretation: at threshold 1e3 Open3D accepts nearly every
correspondence, so both solvers see the same objective; expected agreement
on well-conditioned scans is <0.1 deg / <2 cm (sub-voxel — both are local
quadratic solvers on the same surface). Larger disagreement on a pair
flags a convergence-basin difference worth a look, not automatically an
error — compare each against GT first.

Usage:
  python tools/compare_icp_open3d.py                # synthetic, 8 pairs
  python tools/compare_icp_open3d.py a.bin b.bin    # one real KITTI pair
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def _require_open3d():
    try:
        import open3d as o3d  # noqa: F401
        return o3d
    except ImportError:
        print('open3d is not installed on this host. This comparison '
              'script is meant for an Open3D-capable machine; the build '
              'environment validates ICP against synthetic rigid oracles '
              'instead (tests/test_icp.py).', file=sys.stderr)
        raise SystemExit(2)


def open3d_register(o3d, pc_prev, pc_new, threshold=1e3):
    """The reference's exact call sequence (kitti360_sem_pc_accum.py:113-127
    + sem_pc_accum.py:310-315): returns T_new_prev."""
    def pc2pcd(pc):
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(pc[:, :3].astype(np.float64))
        pcd.estimate_normals()
        return pcd

    pcd_prev = pc2pcd(pc_prev)
    pcd_new = pc2pcd(pc_new)
    trans_init = np.eye(4)
    reg = o3d.pipelines.registration.registration_icp(
        pcd_prev, pcd_new, threshold, trans_init,
        o3d.pipelines.registration.TransformationEstimationPointToPlane())
    return np.asarray(reg.transformation)


def ours_register(pc_prev, pc_new, threshold=1e3, max_downsampled=4096,
                  num_iters=16):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from pc_accumulation_lib_tpu.ops import icp as icp_ops

    pre = icp_ops.make_preprocess_fn(None, max_downsampled)
    reg = icp_ops.make_coarse_to_fine_register_fn(num_iters)

    def cloud(pc):
        n = pc.shape[0]
        cap = int(2 ** np.ceil(np.log2(max(n, 2))))
        pad = np.zeros((cap, 3), np.float32)
        pad[:n] = pc[:, :3]
        return pre(jnp.asarray(pad), jnp.arange(cap) < n)

    T, rmse, n_corr = reg(cloud(pc_prev), cloud(pc_new), jnp.eye(4),
                          jnp.float32(threshold))
    return np.asarray(T, np.float64)


def pose_delta(Ta, Tb):
    """(rotation deg, translation m) between two 4x4 rigid transforms."""
    dR = Ta[:3, :3].T @ Tb[:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = float(np.linalg.norm(Ta[:3, 3] - Tb[:3, 3]))
    return float(ang), dt


def main(argv):
    o3d = _require_open3d()
    if len(argv) == 2:
        pairs = [(np.fromfile(argv[0], np.float32).reshape(-1, 4),
                  np.fromfile(argv[1], np.float32).reshape(-1, 4), None)]
        print(f'real pair: {argv[0]} -> {argv[1]}')
    else:
        from pc_accumulation_lib_tpu.dataloaders.synthetic import (
            SyntheticKitti360Stream)
        stream = SyntheticKitti360Stream(n_frames=9, step=2.0,
                                         lidar_range=60.0, seed=0,
                                         points_per_frame=45_000)
        frames = [stream.frame(i) for i in range(9)]
        pairs = []
        for i in range(8):
            # Both solvers register source=prev, target=new, i.e. T maps
            # prev-frame coords into the new ego frame. The ego advances
            # +step along x per frame, so a static point's x coordinate
            # DROPS by step: GT translation is -step along x.
            T_gt = np.eye(4)
            T_gt[0, 3] = -stream.step
            pairs.append((np.asarray(frames[i][1]),
                          np.asarray(frames[i + 1][1]), T_gt))
        print('synthetic KITTI-360-like stream, 8 consecutive pairs '
              '(GT: -2.0 m x-translation of prev coords per frame)')

    print(f'{"pair":>4} {"dR o3d-ours (deg)":>18} {"dt (m)":>8} '
          f'{"|o3d-GT| m":>11} {"|ours-GT| m":>12}')
    for k, (pc_prev, pc_new, T_gt) in enumerate(pairs):
        T_o3d = open3d_register(o3d, pc_prev, pc_new)
        T_ours = ours_register(pc_prev, pc_new)
        ang, dt = pose_delta(T_o3d, T_ours)
        if T_gt is not None:
            _, e_o3d = pose_delta(T_o3d, T_gt)
            _, e_ours = pose_delta(T_ours, T_gt)
            print(f'{k:>4} {ang:>18.4f} {dt:>8.4f} {e_o3d:>11.4f} '
                  f'{e_ours:>12.4f}')
        else:
            print(f'{k:>4} {ang:>18.4f} {dt:>8.4f} {"n/a":>11} {"n/a":>12}')


if __name__ == '__main__':
    main(sys.argv[1:])
