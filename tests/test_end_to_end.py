"""Full-pipeline integration test on a synthetic KITTI-360-layout dataset:
dataloader -> ICP accumulation -> sampling policy -> BEV pkl.gz + viz PNG,
with output dict schema checked against the reference format
(README.md:69-98, SURVEY.md section 4)."""
import glob
import os

import numpy as np
import pytest

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.dataloaders.synthetic import write_kitti360_layout
from pc_accumulation_lib_tpu.runners import kitti360_bev_gen
from pc_accumulation_lib_tpu.utils.io import read_compressed_pickle

ACCUM_CFG = cfg.AccumConfig(max_points_per_frame=8192, max_frames=64)
ICP_CFG = cfg.ICPConfig(max_downsampled=2048, num_iters=16)

EXPECTED_KEYS = set()
for s in ('present', 'future', 'full'):
    EXPECTED_KEYS |= {f'road_{s}', f'intensity_{s}', f'rgb_{s}',
                      f'dynamic_{s}', f'elevation_{s}', f'trajs_{s}'}


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti360'))
    seq = '2013_05_28_drive_0000_sync'
    write_kitti360_layout(root, seq=seq, n_frames=20, step=2.0,
                          lidar_range=20.0, seed=3)
    return root, seq


def test_kitti360_gt_sem_end_to_end(dataset, tmp_path):
    root, seq = dataset
    out_dir = str(tmp_path / 'bevs')
    stats = kitti360_bev_gen.run(
        root, semseg_model=None, use_gt_sem=True, sequences=[seq],
        start_idxs=[0], end_idxs=[20],
        accum_horizon_dist=16.0,
        bev_params={'type': 'sem', 'view_size': 30, 'pixel_size': 64,
                    'max_trans_radius': 0., 'zoom_thresh': 0.,
                    'do_warp': False, 'int_scaler': 20.,
                    'int_sep_scaler': 20., 'int_mid_threshold': 0.5,
                    'height_filter': None},
        sampling=cfg.SamplingConfig(bev_horizon_dist=6.0,
                                    bev_dist_between_samples=1.0,
                                    bevs_per_sample=1),
        output=cfg.OutputConfig(output_dir=out_dir, viz_to_disk=True),
        accum_cfg=ACCUM_CFG, icp_cfg=ICP_CFG, seed=0)

    assert stats['frames'] == 20
    assert stats['bevs'] >= 2

    pkls = sorted(glob.glob(os.path.join(out_dir, 'subdir*', 'bev_*.pkl.gz')))
    assert len(pkls) == stats['bevs']
    pngs = glob.glob(os.path.join(out_dir, 'subdir*', 'viz_*.png'))
    assert len(pngs) == stats['bevs']

    bev = read_compressed_pickle(pkls[0])
    assert set(bev.keys()) == EXPECTED_KEYS
    for s in ('present', 'future', 'full'):
        assert bev[f'road_{s}'].dtype == np.float16
        assert bev[f'road_{s}'].shape == (64, 64)
        assert bev[f'rgb_{s}'].shape == (3, 64, 64)
        assert isinstance(bev[f'trajs_{s}'], list)
        for t in bev[f'trajs_{s}']:
            assert t.shape[1] == 3
    # The synthetic world has road beneath the ego: the road probmap must
    # show confident road cells near the center.
    road = np.asarray(bev['road_full'], np.float32)
    assert road.max() > 0.8
    # Elevation: road plane sits ~EGO_Z below the ego lidar.
    elev = np.asarray(bev['elevation_full'], np.float32)
    observed = elev[elev != 0]
    assert observed.size > 0
    assert -2.2 < np.median(observed) < -1.2


def test_dataloader_reads_layout(dataset):
    from pc_accumulation_lib_tpu.dataloaders.kitti360 import Kitti360Dataloader
    root, seq = dataset
    dl = Kitti360Dataloader(root, 1, [seq], [0], [20])
    assert len(dl) == 20
    img, pc, sem_gt = dl.read_obs(0)
    assert pc.shape[1] == 4
    assert sem_gt.shape == (pc.shape[0], 1)
    # trainId remap happened: raw road id 7 -> 0, building 11 -> 2.
    assert set(np.unique(sem_gt)) <= {0, 1, 2, 5, 8, 9, 13, 255}
    assert img.size[0] > 0


def test_calib_roundtrip(dataset):
    root, _ = dataset
    params = kitti360_bev_gen.build_calib_params(root)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import make_calib
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    np.testing.assert_allclose(params['h_velo_cam'], H_velo_cam, atol=1e-6)
    np.testing.assert_allclose(params['p_cam_frame'], P_cam_frame, atol=1e-6)
