"""Accumulator state-machine tests: horizon eviction semantics
(sem_pc_accum.py:185-209 oracle), buffer window masking, and equivalence of
the state fast path vs the standalone generator API."""
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum.kitti360 import (
    Kitti360SemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.dataloaders.synthetic import (
    SyntheticKitti360Stream, make_calib)

ACCUM_CFG = cfg.AccumConfig(max_points_per_frame=8192, max_frames=32)
ICP_CFG = cfg.ICPConfig(max_downsampled=2048, num_iters=16,
                        downsample_voxel=0.4)
BEV_PARAMS = dict(type='sem', view_size=40, pixel_size=64,
                  max_trans_radius=0., zoom_thresh=0., do_warp=False,
                  int_scaler=20., int_sep_scaler=20., int_mid_threshold=0.5,
                  height_filter=None)


def make_accum(horizon=200.0, seed=0):
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    return Kitti360SemanticPointCloudAccumulator(
        horizon, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True, BEV_PARAMS, accum_cfg=ACCUM_CFG,
        icp_cfg=ICP_CFG, seed=seed)


@pytest.fixture(scope='module')
def stream():
    return SyntheticKitti360Stream(n_frames=12, step=2.0, lidar_range=25.0,
                                   seed=1)


def test_integrate_accumulates_poses(stream):
    accum = make_accum()
    for obs in stream:
        accum.integrate(obs)
    assert len(accum.poses) == 12
    # ICP should recover ~2 m forward steps.
    poses = accum.get_pose()
    steps = np.linalg.norm(np.diff(poses, axis=0), axis=1)
    np.testing.assert_allclose(steps, 2.0, atol=0.3)
    # Path-distance bookkeeping is consistent.
    incr = accum.get_incremental_path_dists()
    assert len(incr) == 11
    np.testing.assert_allclose(incr[-1], np.sum(accum.seg_dists))


def test_horizon_eviction_matches_reference_semantics(stream):
    accum = make_accum(horizon=10.0)
    removed_total = 0
    for obs in stream:
        removed_total += accum.integrate(obs)
    # Oracle (sem_pc_accum.py:185-209): keep frames whose incremental path
    # distance exceeds the overshoot.
    assert removed_total > 0
    path_length = float(np.sum(accum.seg_dists))
    assert path_length <= 10.0 + 2.5  # one step of slack past horizon
    assert accum.window_start == removed_total
    assert len(accum.poses) == accum.frame_count - accum.window_start


def test_eviction_oracle_exact():
    """Drive remove_observations directly with fabricated poses and compare
    to the reference algorithm."""
    accum = make_accum(horizon=5.0)
    # Fabricate bookkeeping: 8 poses, 1m apart.
    accum.poses = [[float(i), 0., 0.] for i in range(8)]
    accum.seg_dists = [1.0] * 6  # distances between first 7 poses
    accum.T_world_velo = [np.eye(4)] * 8
    accum.rgbs = [None] * 8
    accum.semsegs = [None] * 8
    accum.frame_count = 8
    idx, path_length = accum.remove_observations()
    # seg_dists becomes 7x1m, path=7 > 5, overshoot=2; incremental dists
    # [1..7]-2 -> first positive at idx 2.
    assert path_length == 7.0
    assert idx == 2
    assert len(accum.poses) == 6
    assert accum.window_start == 2


def test_generate_bev_schema(stream):
    accum = make_accum()
    for obs in stream:
        accum.integrate(obs)
    bevs = accum.generate_bev(present_idx=6, bev_num=2, gen_future=True)
    assert len(bevs) == 2
    bev = bevs[0]
    expected_keys = set()
    for s in ('present', 'future', 'full'):
        expected_keys |= {f'road_{s}', f'intensity_{s}', f'rgb_{s}',
                          f'dynamic_{s}', f'elevation_{s}', f'trajs_{s}'}
    assert expected_keys == set(bev.keys())
    P = BEV_PARAMS['pixel_size']
    for s in ('present', 'future', 'full'):
        assert bev[f'road_{s}'].dtype == np.float16
        assert bev[f'road_{s}'].shape == (P, P)
        assert bev[f'rgb_{s}'].shape == (3, P, P)
        assert 0 <= float(bev[f'road_{s}'].min())
        assert float(bev[f'road_{s}'].max()) <= 1
    # Present trajectory excludes the present pose itself
    # (kitti360_sem_pc_accum.py:189-190: sem_pcs[:present_idx]).
    assert len(bev['trajs_present']) == 1


def test_generate_bev_present_only(stream):
    accum = make_accum()
    for obs in stream:
        accum.integrate(obs)
    bevs = accum.generate_bev(present_idx=None, bev_num=1, gen_future=False)
    bev = bevs[0]
    assert 'road_present' in bev and 'road_future' not in bev


def test_state_path_matches_standalone_generator(stream):
    """The fused buffer raster must equal the standalone numpy-dict API on
    identical content."""
    accum = make_accum()
    for obs in stream:
        accum.integrate(obs)
    pi = 6
    bev_state = accum.generate_bev(present_idx=pi, bev_num=1,
                                   gen_future=True)[0]

    # Rebuild the reference-style pcs/trajs dicts from the device buffer.
    T_ref = np.linalg.inv(accum.T_world_velo[-1])
    poses_ref = np.array(accum.poses) @ T_ref[:3, :3].T + T_ref[:3, 3]
    bev_coords = poses_ref[pi]
    pts = np.asarray(accum.state.points).reshape(-1, 10)
    valid = np.asarray(accum.state.valid).reshape(-1)
    fids = np.repeat(np.asarray(accum.state.frame_ids),
                     accum.state.points.shape[1])
    keep = valid & (fids >= accum.window_start)
    pts, fids = pts[keep], fids[keep]
    pts_ref = pts.copy()
    pts_ref[:, :3] = (pts[:, :3] @ T_ref[:3, :3].T + T_ref[:3, 3]
                      - bev_coords)
    present_rows = fids < accum.window_start + pi
    pcs = {'pc_present': pts_ref[present_rows],
           'pc_future': pts_ref[~present_rows],
           'pc_full': pts_ref}
    trajs = {'ego_traj_present': poses_ref[:pi] - bev_coords,
             'other_trajs_present': [],
             'ego_traj_future': poses_ref[pi:] - bev_coords,
             'other_trajs_future': [],
             'ego_traj_full': poses_ref - bev_coords,
             'other_trajs_full': []}
    bev_alone = accum.sem_bev_generator.generate(pcs, trajs)

    for k in bev_state:
        if k.startswith('trajs'):
            assert len(bev_state[k]) == len(bev_alone[k])
            for a, b in zip(bev_state[k], bev_alone[k]):
                np.testing.assert_allclose(a, b, atol=1e-3)
        else:
            a = np.asarray(bev_state[k], np.float32)
            b = np.asarray(bev_alone[k], np.float32)
            # f64-host vs f32-device transforms may push single borderline
            # points across a cell edge: allow a tiny fraction of cells to
            # differ. Count-derived channels step by at most a one-count
            # ratio; min-z elevation can jump by the z-gap between points
            # when a boundary point changes cells, so it only gets the
            # fraction bound.
            mismatched = np.abs(a - b) > 2e-3
            assert mismatched.mean() < 0.005, k
            if not k.startswith('elevation'):
                assert np.abs(a - b).max() < 0.75, k


def test_frame_overflow_raises(stream):
    small = cfg.AccumConfig(max_points_per_frame=8192, max_frames=4)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum = Kitti360SemanticPointCloudAccumulator(
        1e9, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True, BEV_PARAMS, accum_cfg=small,
        icp_cfg=ICP_CFG)
    with pytest.raises(RuntimeError, match='overflow'):
        for obs in stream:
            accum.integrate(obs)


def test_curved_trajectory_rotation_recovery():
    """Curved path: ICP must recover per-frame yaw and the world pose chain
    must reproduce the true arc (tests rotation handling end-to-end)."""
    yaw_rate = 0.05  # rad/frame (~2.9 deg)
    stream = SyntheticKitti360Stream(n_frames=10, step=2.0,
                                     lidar_range=25.0, seed=5,
                                     yaw_rate=yaw_rate,
                                     points_per_frame=3000)
    accum = make_accum()
    from pc_accumulation_lib_tpu.dataloaders.kitti360 import (ID2TRAINID,
                                                              conv_semantic_ids)
    for obs in stream:
        img, pc, sem_gt = obs[0]
        sem_gt = conv_semantic_ids(sem_gt.astype(np.int64), ID2TRAINID)
        accum.integrate([(img, pc, sem_gt)])
    poses = accum.get_pose()
    true_poses = np.stack([stream.ego_pose(i) for i in range(10)])
    # World frame = first ego frame: true arc relative to frame 0.
    rel_true = true_poses - true_poses[0]
    np.testing.assert_allclose(poses, rel_true, atol=0.5)
    # Recovered yaw from the velo->world chain matches the commanded arc.
    yaws = [np.arctan2(T[1, 0], T[0, 0]) for T in accum.T_world_velo]
    np.testing.assert_allclose(yaws, yaw_rate * np.arange(10), atol=0.05)
    # BEV generation on the curved window produces valid maps with the
    # heading-aligned rotation.
    bev = accum.generate_bev(present_idx=6, bev_num=1, gen_future=True)[0]
    road = np.asarray(bev['road_full'], np.float32)
    assert road.max() > 0.8


def test_ring_buffer_wraparound():
    """Slot reuse: with max_frames=8 and a sliding horizon, global frame
    ids exceed the slot count and wrap (slot = fid % 8). Stale points from
    overwritten frames must never leak into rasters."""
    small = cfg.AccumConfig(max_points_per_frame=8192, max_frames=8)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum = Kitti360SemanticPointCloudAccumulator(
        8.0, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True, BEV_PARAMS, accum_cfg=small,
        icp_cfg=ICP_CFG, seed=0)
    stream = SyntheticKitti360Stream(n_frames=20, step=2.0,
                                     lidar_range=20.0, seed=7,
                                     points_per_frame=2500)
    from pc_accumulation_lib_tpu.dataloaders.kitti360 import (ID2TRAINID,
                                                              conv_semantic_ids)

    def remapped(i):
        img, pc, sem_gt = stream.frame(i)
        return (img, pc, conv_semantic_ids(sem_gt.astype(np.int64),
                                           ID2TRAINID))

    for i in range(20):
        accum.integrate([remapped(i)])
    # 20 global frames through 8 slots: wrapped at least once.
    assert accum.frame_count == 20
    assert accum.window_start > 12 - 8  # horizon 8m at 2m steps
    assert len(accum.poses) <= 8
    # Buffer slots hold only the latest generation of frame ids.
    fids = np.asarray(accum.state.frame_ids)
    assert sorted(fids) == sorted((np.arange(12, 20)))
    # Raster only covers in-window frames: points transformed to the
    # latest ego frame must lie within the lidar radius of the window path
    # (stale world-frame points from early frames would appear far behind).
    bev = accum.generate_bev(present_idx=len(accum.poses) - 2, bev_num=1,
                             gen_future=True)[0]
    road = np.asarray(bev['road_full'], np.float32)
    assert road.max() > 0.8  # window content present
    # Compare against a fresh accumulator fed only the window frames
    # (identical world content => near-identical rasters).
    accum2 = Kitti360SemanticPointCloudAccumulator(
        1e9, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True, BEV_PARAMS, accum_cfg=small,
        icp_cfg=ICP_CFG, seed=0)
    for i in range(accum.window_start, 20):
        accum2.integrate([remapped(i)])
    bev2 = accum2.generate_bev(present_idx=len(accum2.poses) - 2,
                               bev_num=1, gen_future=True)[0]
    a = np.asarray(bev['road_full'], np.float32)
    b = np.asarray(bev2['road_full'], np.float32)
    # ICP pose chains start at different anchors; allow small drift-induced
    # cell shifts but require overwhelming agreement.
    assert (np.abs(a - b) > 0.05).mean() < 0.05
