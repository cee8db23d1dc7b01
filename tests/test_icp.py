"""ICP tests: recover known rigid transforms on synthetic structured clouds
(SURVEY.md section 4), replacing Open3D registration parity."""
import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu.dataloaders.synthetic import SyntheticKitti360Stream
from pc_accumulation_lib_tpu.ops import icp

M = 2048


def make_cloud(seed=0):
    stream = SyntheticKitti360Stream(n_frames=2, seed=seed)
    _, pc, _ = stream.frame(0)
    return pc[:, :3]


def pad(pts, cap=16384):
    n = pts.shape[0]
    out = np.zeros((cap, 3), np.float32)
    out[:n] = pts[:cap]
    valid = np.arange(cap) < min(n, cap)
    return jnp.asarray(out), jnp.asarray(valid)


def rigid(ang_z, ang_y, t):
    cz, sz = np.cos(ang_z), np.sin(ang_z)
    cy, sy = np.cos(ang_y), np.sin(ang_y)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry
    T[:3, 3] = t
    return T


def test_voxel_downsample_centroids():
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.0, 5.0, 5.0]],
                   np.float32)
    p, v = pad(pts, cap=16)
    cent, valid = icp.voxel_downsample(p, v, 1.0, 64)
    cent = np.asarray(cent)[np.asarray(valid)]
    assert cent.shape[0] == 2
    assert any(np.allclose(c, [0.2, 0.2, 0.2], atol=1e-5) for c in cent)
    assert any(np.allclose(c, [5.0, 5.0, 5.0], atol=1e-5) for c in cent)


def test_estimate_normals_plane(rng):
    # Points on z=0 plane -> normals ~ +-z.
    pts = np.zeros((256, 3), np.float32)
    pts[:, :2] = rng.uniform(-5, 5, size=(256, 2))
    valid = jnp.ones(256, bool)
    normals = np.asarray(icp.estimate_normals(jnp.asarray(pts), valid, k=8))
    nz = np.abs(normals[:, 2])
    assert np.all(nz > 0.99)


def test_se3_exp_identity():
    T = np.asarray(icp.se3_exp(jnp.zeros(6)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-7)


def test_se3_exp_rotation():
    delta = jnp.asarray([0.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0], jnp.float32)
    T = np.asarray(icp.se3_exp(delta))
    np.testing.assert_allclose(T[:3, :3],
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-5)


def test_icp_recovers_transform():
    src_pts = make_cloud()
    T_true = rigid(0.03, 0.01, [0.8, 0.15, 0.02])
    tgt_pts = src_pts @ T_true[:3, :3].T + T_true[:3, 3]

    pre = icp.make_preprocess_fn(voxel_size=0.4, max_out=M, normal_k=10)
    reg = icp.make_register_fn(num_iters=15)
    src = pre(*pad(src_pts))
    tgt = pre(*pad(tgt_pts.astype(np.float32)))
    T, rmse, n_corr = reg(src, tgt, jnp.eye(4, dtype=jnp.float32),
                          jnp.float32(1e3))
    T = np.asarray(T)
    assert float(n_corr) > 100
    np.testing.assert_allclose(T[:3, 3], T_true[:3, 3], atol=0.1)
    np.testing.assert_allclose(T[:3, :3], T_true[:3, :3], atol=0.02)
    # Transform direction convention: T maps source -> target coords, i.e.
    # T_new_prev when (source=prev, target=new) as at
    # kitti360_sem_pc_accum.py:119-127.


def test_icp_identity_on_same_cloud():
    pts = make_cloud()
    pre = icp.make_preprocess_fn(voxel_size=0.4, max_out=M, normal_k=10)
    reg = icp.make_register_fn(num_iters=8)
    c = pre(*pad(pts))
    T, _, _ = reg(c, c, jnp.eye(4, dtype=jnp.float32), jnp.float32(1e3))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-3)


def test_icp_degenerate_empty_target():
    pts = make_cloud()
    pre = icp.make_preprocess_fn(voxel_size=0.4, max_out=M, normal_k=10)
    reg = icp.make_register_fn(num_iters=4)
    src = pre(*pad(pts))
    empty = icp.ICPCloud(points=jnp.zeros((M, 3)),
                         normals=jnp.zeros((M, 3)),
                         valid=jnp.zeros((M,), bool))
    T, _, n_corr = reg(src, empty, jnp.eye(4, dtype=jnp.float32),
                       jnp.float32(1e3))
    assert float(n_corr) == 0
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_warm_start_preserves_accuracy():
    """Constant-velocity warm start (ICPConfig.warm_start) must keep the
    standard-motion case accurate (it propagates the previous solve as the
    next init instead of the reference's identity)."""
    import numpy as np

    from pc_accumulation_lib_tpu import config as cfg2
    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticKitti360Stream, make_calib)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    stream = SyntheticKitti360Stream(n_frames=8, step=2.0, lidar_range=25.0,
                                     seed=11, points_per_frame=3000)
    accum = Kitti360SemanticPointCloudAccumulator(
        200.0, calib, 1e3, None, (255,), None, True,
        dict(type='sem', view_size=40, pixel_size=32),
        accum_cfg=cfg2.AccumConfig(max_points_per_frame=8192, max_frames=16),
        icp_cfg=cfg2.ICPConfig(max_downsampled=2048, num_iters=16,
                               warm_start=True))
    for obs in stream:
        accum.integrate(obs)
    steps = np.linalg.norm(np.diff(accum.get_pose(), axis=0), axis=1)
    np.testing.assert_allclose(steps, 2.0, atol=0.4)


def test_long_horizon_drift_bounded():
    """24-frame chained registration at the reference operating point
    (threshold 1e3, identity init, kitti360_sem_pc_accum.py:123-126 +
    sem_pc_accum.py:88): accumulated endpoint error stays under 0.5% of
    the travelled path (VERDICT weak #5)."""
    import numpy as np

    from pc_accumulation_lib_tpu import config as cfg2
    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticKitti360Stream, make_calib)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    n_frames, step = 24, 2.0
    stream = SyntheticKitti360Stream(n_frames=n_frames, step=step,
                                     lidar_range=25.0, seed=3,
                                     points_per_frame=4000,
                                     yaw_rate=0.01)   # gentle curve
    accum = Kitti360SemanticPointCloudAccumulator(
        1e9, calib, 1e3, None, (255,), None, True,
        dict(type='sem', view_size=40, pixel_size=32),
        accum_cfg=cfg2.AccumConfig(max_points_per_frame=16384,
                                   max_frames=32),
        icp_cfg=cfg2.ICPConfig(max_downsampled=4096, num_iters=16))
    for obs in stream:
        accum.integrate(obs)
    est = accum.get_pose()                       # world = first ego frame
    true = np.stack([stream.ego_pose(i) for i in range(n_frames)])
    true_rel = true - true[0]
    # Estimated chain starts at the first ego pose (identity world frame).
    est_rel = est - est[0]
    path_len = np.sum(np.linalg.norm(np.diff(true, axis=0), axis=1))
    endpoint_err = np.linalg.norm(est_rel[-1] - true_rel[-1])
    assert endpoint_err < 0.005 * path_len, (endpoint_err, path_len)
    # Per-frame error never explodes mid-sequence either.
    per_frame = np.linalg.norm(est_rel - true_rel, axis=1)
    assert per_frame.max() < 0.01 * path_len


def test_trimmed_matches_accept_all_on_overlapped_frames():
    """The default trim_ratio=0.9 is a deliberate divergence from the
    reference's accept-all correspondences (threshold 1e3). On
    well-overlapped consecutive frames the trimmed solver must be at
    least as accurate as accept-all (VERDICT weak #5)."""
    stream = SyntheticKitti360Stream(n_frames=2, step=1.5, lidar_range=25.0,
                                     seed=5, points_per_frame=4000)
    _, pc0, _ = stream.frame(0)
    _, pc1, _ = stream.frame(1)
    T_true = np.eye(4)
    T_true[0, 3] = -1.5    # prev -> new ego coords (ego moved +x)

    pre = icp.make_preprocess_fn(voxel_size=0.4, max_out=M, normal_k=10)
    src = pre(*pad(pc0[:, :3]))    # prev
    tgt = pre(*pad(pc1[:, :3]))    # new
    errs = {}
    for ratio in (0.9, 1.0):
        reg = icp.make_register_fn(num_iters=16, trim_ratio=ratio)
        T, _, n_corr = reg(src, tgt, jnp.eye(4, dtype=jnp.float32),
                           jnp.float32(1e3))
        assert float(n_corr) > 200
        errs[ratio] = np.linalg.norm(np.asarray(T) - T_true)
    assert errs[0.9] <= errs[1.0] + 1e-3, errs
    assert errs[1.0] < 0.08   # accept-all itself converges here too


def test_coarse_to_fine_recovers_large_step():
    """Coarse-to-fine registration (ICPConfig.coarse_to_fine) recovers 4 m
    inter-frame steps that single-scale identity-init ICP cannot."""
    import numpy as np

    from pc_accumulation_lib_tpu import config as cfg2
    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticKitti360Stream, make_calib)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    stream = SyntheticKitti360Stream(n_frames=8, step=4.0, lidar_range=25.0,
                                     seed=11, points_per_frame=3000)
    accum = Kitti360SemanticPointCloudAccumulator(
        200.0, calib, 1e3, None, (255,), None, True,
        dict(type='sem', view_size=40, pixel_size=32),
        accum_cfg=cfg2.AccumConfig(max_points_per_frame=16384,
                                   max_frames=16),
        icp_cfg=cfg2.ICPConfig(max_downsampled=2048, num_iters=16,
                               coarse_to_fine=True, warm_start=True))
    for obs in stream:
        accum.integrate(obs)
    steps = np.linalg.norm(np.diff(accum.get_pose(), axis=0), axis=1)
    np.testing.assert_allclose(steps, 4.0, atol=0.6)


def test_drift_bounded_under_moving_object_contamination():
    """20-frame drift chain with a translating car cluster (~8% of
    points): non-rigid contamination is the failure mode the annealed
    trim exists for (ops/icp.py make_register_fn trim_ratio) — pose error
    must stay bounded anyway (VERDICT r2 #7). Reference operating point:
    kitti360_sem_pc_accum.py:123-126 (accept-all would let the mover drag
    the solve)."""
    from pc_accumulation_lib_tpu import config as cfg2
    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import make_calib

    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    n_frames, step = 20, 2.0
    stream = SyntheticKitti360Stream(n_frames=n_frames, step=step,
                                     lidar_range=25.0, seed=3,
                                     points_per_frame=4000)
    rng = np.random.default_rng(11)
    n_car = 320                      # ~8% of a 4k-point frame
    template = np.stack([rng.uniform(-2.2, 2.2, n_car),
                         rng.uniform(-0.9, 0.9, n_car),
                         rng.uniform(0.1, 1.6, n_car)], 1)
    car_start = np.array([stream.lidar_range + 12.0, 2.5, 0.0])
    car_vel = np.array([-1.2, 0.0, 0.0])   # oncoming, 0.6x ego speed

    accum = Kitti360SemanticPointCloudAccumulator(
        1e9, calib, 1e3, None, (255,), None, True,
        dict(type='sem', view_size=40, pixel_size=32),
        accum_cfg=cfg2.AccumConfig(max_points_per_frame=16384,
                                   max_frames=32),
        icp_cfg=cfg2.ICPConfig(max_downsampled=4096, num_iters=16))
    for i in range(n_frames):
        img, pc, sem_gt = stream.frame(i)
        ego = stream.ego_pose(i)
        car_world = template + car_start + i * car_vel
        rel = (car_world - ego).astype(np.float32)
        keep = np.linalg.norm(rel[:, :2], axis=1) < stream.lidar_range
        car_rows = np.concatenate(
            [rel[keep], np.full((keep.sum(), 1), 0.6, np.float32)], axis=1)
        pc_i = np.concatenate([pc, car_rows])
        sem_i = np.concatenate(
            [sem_gt, np.full((keep.sum(), 1), 26, sem_gt.dtype)])  # car id
        accum.integrate([(img, pc_i, sem_i)])

    est = accum.get_pose()
    true = np.stack([stream.ego_pose(i) for i in range(n_frames)])
    est_rel, true_rel = est - est[0], true - true[0]
    path_len = np.sum(np.linalg.norm(np.diff(true, axis=0), axis=1))
    endpoint_err = np.linalg.norm(est_rel[-1] - true_rel[-1])
    assert endpoint_err < 0.01 * path_len, (endpoint_err, path_len)
    per_frame = np.linalg.norm(est_rel - true_rel, axis=1)
    assert per_frame.max() < 0.02 * path_len, per_frame.max()
