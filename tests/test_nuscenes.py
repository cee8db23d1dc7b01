"""NuScenes path tests: fake tracker semantics (oracles re-implemented from
nuscenes_oracle_sem_pc_accum.py:272-414), oracle accumulator end-to-end on
synthetic obs dicts, dynamic-object exclusion/relabelling, GT lanes, and
the (un-gated) ICP variant."""
import numpy as np
import pytest

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum.nuscenes import (
    NuScenesSemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.accum.nuscenes_oracle import (
    NuScenesOracleSemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.accum.tracking import InstanceTracker
from pc_accumulation_lib_tpu.dataloaders.synthetic import (
    SyntheticNuScenesStream)
from pc_accumulation_lib_tpu.models.semseg import SemSegTPU

ACCUM_CFG = cfg.AccumConfig(max_points_per_frame=16384, max_frames=32,
                            max_painted_points_per_frame=16384,
                            max_instances=64)
BEV_PARAMS = dict(type='sem', view_size=40, pixel_size=64,
                  int_scaler=1., int_sep_scaler=30., int_mid_threshold=0.12)


# ----------------------------------------------------------------------
# Tracker semantics
# ----------------------------------------------------------------------
def test_find_nearest_idx_semantics():
    arr = [0, 1, 2, 3, 4, 6, 8, 9, 10]
    assert InstanceTracker.find_nearest_ge_idx(arr, 5) == 5
    assert InstanceTracker.find_nearest_le_idx(arr, 5) == 4
    assert InstanceTracker.find_nearest_le_idx(arr, 10) == 8
    with pytest.raises(ValueError):
        InstanceTracker.find_nearest_ge_idx(arr, 11)
    with pytest.raises(ValueError):
        InstanceTracker.find_nearest_le_idx([3, 4], 2)


def test_parse_seq_into_coherent_seqs():
    """(reference :390-414): runs of consecutive ts -> local idx lists."""
    got = InstanceTracker.parse_seq_into_coherent_seqs([0, 1, 3, 4, 5, 9])
    assert got == [[0, 1], [2, 3, 4], [5]]
    got = InstanceTracker.parse_seq_into_coherent_seqs([2, 3])
    assert got == [[0, 1]]


def test_tracker_dynamic_flagging():
    tr = InstanceTracker(dyn_trans_thresh=1.0)
    center = np.array([0.0, 0.0, 0.0])
    for ts in range(4):
        # moving: +0.6 m/step -> crosses 1.0 m between first/last at ts 2
        f2g, newly = tr.update(ts, ['mov', 'park'], [0, 0],
                               [center + [0.6 * ts, 0, 0], center])
        if ts < 2:
            assert newly == []
    assert 'mov' in tr.dyn_instances
    assert 'park' not in tr.dyn_instances
    # untracked class never tracked
    f2g, _ = tr.update(5, ['tr'], [4], [center])  # class 4 = trailer
    assert f2g == {}


def test_tracker_traj_split():
    tr = InstanceTracker(dyn_trans_thresh=0.5)
    for ts in range(6):
        tr.update(ts, ['mov'], [0], [np.array([1.0 * ts, 0, 0])])
    past, future, full = tr.get_split_dyn_obj_trajs(3)
    assert len(full) == 1 and len(full[0]) == 6
    assert len(past) == 1 and len(past[0]) == 4   # ts 0..3 inclusive
    assert len(future) == 1 and len(future[0]) == 3  # ts 3..5


# ----------------------------------------------------------------------
# Oracle accumulator end-to-end
# ----------------------------------------------------------------------
@pytest.fixture(scope='module')
def oracle_accum():
    stream = SyntheticNuScenesStream(n_frames=10, step=2.0, lidar_range=20.0,
                                     seed=2)
    model = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))
    lanes = [np.stack([np.linspace(0, 100, 101),
                       np.zeros(101), np.zeros(101)], 1)]
    accum = NuScenesOracleSemanticPointCloudAccumulator(
        semseg_model=model, bev_params=BEV_PARAMS, loc='synth-map',
        get_gt_lanes=True, gt_lane_poses=lanes, accum_cfg=ACCUM_CFG, seed=0)
    for obs in stream:
        accum.integrate(obs)
    return accum


def test_oracle_poses_world_frame(oracle_accum):
    poses = oracle_accum.get_pose()
    assert poses.shape == (10, 3)
    # World frame = first ego frame: first pose at origin + z-lift 1.0.
    np.testing.assert_allclose(poses[0], [0, 0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.diff(poses[:, 0]), 2.0, atol=1e-6)
    assert len(oracle_accum.ego_global_xs) == 10


def test_oracle_detects_moving_car(oracle_accum):
    tr = oracle_accum.tracker
    assert 'car_moving' in tr.dyn_instances
    assert 'car_parked' not in tr.dyn_instances
    # Device dyn table has the moving car's global id flagged.
    gid = tr.token2global['car_moving']
    assert float(oracle_accum.state.inst_dyn[gid]) == 1.0
    assert float(oracle_accum.state.inst_dyn[
        tr.token2global['car_parked']]) == 0.0


def test_oracle_generate_bev_schema(oracle_accum):
    bevs = oracle_accum.generate_bev(present_idx=5, bev_num=1,
                                     gen_future=True)
    bev = bevs[0]
    for s in ('present', 'future', 'full'):
        for k in ('road', 'intensity', 'rgb', 'dynamic', 'elevation',
                  'trajs'):
            assert f'{k}_{s}' in bev
    assert 'gt_lanes' in bev
    assert len(bev['gt_lanes']) >= 1
    # Other-agent (moving car) trajectories present in full split:
    # ego + at least one dyn-object traj.
    assert len(bev['trajs_full']) >= 2
    # Points were rasterized (random-weight semseg yields arbitrary
    # classes, so assert on occupancy rather than the road class): cells
    # with non-road points push the Dirichlet below the 0.5 prior, and
    # observed cells carry colour/elevation.
    road = np.asarray(bev['road_full'], np.float32)
    assert float(road.min()) < 0.4
    assert (np.asarray(bev['rgb_full'], np.float32) > 0).any()
    assert (np.asarray(bev['elevation_full'], np.float32) != 0).any()


def test_oracle_run_script_metadata(oracle_accum):
    bev = oracle_accum.generate_bev(present_idx=5, bev_num=1,
                                    gen_future=True)[0]
    bev['scene_idx'] = 0
    bev['map'] = oracle_accum.map
    bev['ego_global_x'] = oracle_accum.ego_global_xs[5]
    bev['ego_global_y'] = oracle_accum.ego_global_ys[5]
    assert bev['map'] == 'synth-map'


# ----------------------------------------------------------------------
# ICP (estimated-pose) variant
# ----------------------------------------------------------------------
def test_nuscenes_icp_accumulator_runs():
    stream = SyntheticNuScenesStream(n_frames=8, step=2.0, lidar_range=25.0,
                                     seed=3)
    model = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))
    accum = NuScenesSemanticPointCloudAccumulator(
        horizon_dist=100.0, icp_threshold=1e3, semseg_model=model,
        bev_params=BEV_PARAMS, loc='synth-map', accum_cfg=ACCUM_CFG,
        icp_cfg=cfg.ICPConfig(max_downsampled=2048, num_iters=16), seed=0)
    for obs in stream:
        accum.integrate(obs)
    poses = accum.get_pose()
    steps = np.linalg.norm(np.diff(poses, axis=0), axis=1)
    np.testing.assert_allclose(steps, 2.0, atol=0.4)
    bev = accum.generate_bev(present_idx=4, bev_num=1, gen_future=True)[0]
    assert 'road_full' in bev


def test_nuscenes_icp_quantized_transfer_matches_float32():
    """transfer_dtype='quantized' on the ICP (estimated-pose) path: the
    13 B/point packed upload must reproduce the float32 path's poses to
    quantization-propagated tolerance and its painted buffer semantics
    (same contract the oracle path pins in tests/test_pointpack.py; the
    runner gate that used to raise here is removed)."""
    stream = SyntheticNuScenesStream(n_frames=6, step=2.0, lidar_range=25.0,
                                     seed=7)
    obs_list = [o for batch in stream for o in batch]
    model = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))

    def make(transfer_dtype):
        return NuScenesSemanticPointCloudAccumulator(
            horizon_dist=100.0, icp_threshold=1e3, semseg_model=model,
            bev_params=BEV_PARAMS, loc='synth-map', accum_cfg=ACCUM_CFG,
            icp_cfg=cfg.ICPConfig(max_downsampled=2048, num_iters=16),
            seed=0, transfer_dtype=transfer_dtype)

    a, b = make('float32'), make('quantized')
    for obs in obs_list:
        a.integrate([obs])
        b.integrate([obs])
    # ICP consumed 5 mm-quantized coords on the quantized path; the pose
    # chain must agree to well under the downsample voxel.
    pa, pb = np.asarray(a.get_pose()), np.asarray(b.get_pose())
    assert pa.shape == pb.shape
    assert np.max(np.abs(pa - pb)) < 0.05
    va, vb = np.asarray(a.state.valid), np.asarray(b.state.valid)
    np.testing.assert_array_equal(va, vb)
    qa, qb = np.asarray(a.state.points)[va], np.asarray(b.state.points)[vb]
    # World xyz: 5 mm quantization + the (small) pose-chain difference.
    assert np.max(np.abs(qa[:, :3] - qb[:, :3])) < 0.06
    # Painted sem/inst/dyn columns agree except where a u/v half-pixel
    # round crossed a pixel boundary.
    same = np.mean(np.all(qa[:, 7:10] == qb[:, 7:10], axis=1))
    assert same > 0.995


def test_nuscenes_icp_yuv420h_image_transfer_runs():
    """img_transfer='yuv420h' (0.75 B/px camera wire codec) through the
    estimated-pose NuScenes path: geometry/poses must match the rgb8 run
    (the codec touches colors only) and painted colors stay bounded on
    the synthetic stream's smooth gradient images."""
    stream = SyntheticNuScenesStream(n_frames=4, step=2.0, lidar_range=25.0,
                                     seed=5)
    obs_list = [o for batch in stream for o in batch]
    model = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))

    def make(img_transfer):
        return NuScenesSemanticPointCloudAccumulator(
            horizon_dist=100.0, icp_threshold=1e3, semseg_model=model,
            bev_params=BEV_PARAMS, loc='synth-map', accum_cfg=ACCUM_CFG,
            icp_cfg=cfg.ICPConfig(max_downsampled=2048, num_iters=16),
            seed=0, img_transfer=img_transfer)

    a, b = make('rgb8'), make('yuv420h')
    for obs in obs_list:
        a.integrate([obs])
        b.integrate([obs])
    # Ego-motion is color-independent (ICP registers geometry).
    np.testing.assert_allclose(np.asarray(a.get_pose()),
                               np.asarray(b.get_pose()), atol=1e-4)
    # The lossy codec may flip a few semseg argmax classes (random-weight
    # test model), changing the class-filtered point set slightly — the
    # populations must stay near-identical, and the painted colors close
    # in distribution (the codec touches colors only).
    na = int(np.asarray(a.state.valid).sum())
    nb = int(np.asarray(b.state.valid).sum())
    assert na > 0 and abs(na - nb) <= 0.03 * na
    qa = np.asarray(a.state.points)[np.asarray(a.state.valid)]
    qb = np.asarray(b.state.points)[np.asarray(b.state.valid)]
    assert np.abs(qa[:, 4:7].mean(0) - qb[:, 4:7].mean(0)).max() < 8.0


def test_nuscenes_icp_rejects_bad_transfer_dtype():
    with pytest.raises(ValueError):
        NuScenesSemanticPointCloudAccumulator(
            horizon_dist=100.0, icp_threshold=1e3,
            semseg_model=SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1)),
            bev_params=BEV_PARAMS, accum_cfg=ACCUM_CFG,
            transfer_dtype='int8')


def test_oracle_upload_obs_matches_raw():
    """Pre-uploaded OracleDeviceObs (upload_obs — the double-buffered
    6-camera transfer used by bench.py's oracle mode) must be equivalent
    to integrating raw obs dicts: same poses, tracker state, and BEV."""
    from pc_accumulation_lib_tpu.accum.nuscenes_oracle import OracleDeviceObs
    stream = SyntheticNuScenesStream(n_frames=6, step=2.0, lidar_range=20.0,
                                     seed=5)
    obs_list = [o for batch in stream for o in batch]
    model = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))

    def make():
        return NuScenesOracleSemanticPointCloudAccumulator(
            semseg_model=model, bev_params=BEV_PARAMS, loc='synth-map',
            accum_cfg=ACCUM_CFG, seed=0)

    a_raw, a_dev = make(), make()
    for obs in obs_list:
        a_raw.integrate([obs])
        dob = a_dev.upload_obs(obs)
        assert isinstance(dob, OracleDeviceObs)
        assert a_dev.upload_obs(dob) is dob   # idempotent
        a_dev.integrate([dob])
    np.testing.assert_array_equal(np.asarray(a_raw.poses),
                                  np.asarray(a_dev.poses))
    assert a_raw.tracker.dyn_instances == a_dev.tracker.dyn_instances
    br = a_raw.generate_bev(present_idx=3, bev_num=1, gen_future=True)[0]
    bd = a_dev.generate_bev(present_idx=3, bev_num=1, gen_future=True)[0]
    for k in br:
        if k.startswith('trajs') or k == 'gt_lanes':
            continue
        np.testing.assert_array_equal(np.asarray(br[k]), np.asarray(bd[k]),
                                      err_msg=k)
