"""NuScenes observation dataloader.

Counterpart of obs_dataloaders/nuscenes_obs_dataloader.py:12-220: walks the
scene->sample token chain and emits per-keyframe obs dicts with multi-sweep
instance-labelled points (ego frame), 6-camera projections, GT boxes and
global ego positions. The devkit stays host-side (SURVEY.md section 7
decision 8); torch is not used (reference load_data_to_tensor dropped —
downstream consumers take numpy).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from pc_accumulation_lib_tpu.dataloaders import nuscenes_utils as nu
from pc_accumulation_lib_tpu.dataloaders.base import ObservationDataloader

CAM_CHANNELS = ['CAM_FRONT', 'CAM_FRONT_LEFT', 'CAM_FRONT_RIGHT',
                'CAM_BACK', 'CAM_BACK_LEFT', 'CAM_BACK_RIGHT']


class NuScenesDataloader(ObservationDataloader):

    def __init__(self, nusc, scene_ids: Optional[List[int]] = None,
                 batch_size: int = 1, num_sweeps: int = 5):
        """Args mirror the reference (nuscenes_obs_dataloader.py:14-23):
        ``nusc`` is a NuScenes devkit instance."""
        super().__init__(None, batch_size)
        self.nusc = nusc
        self.num_sweeps = num_sweeps
        self.cam_channels = list(CAM_CHANNELS)
        if scene_ids is None:
            scene_ids = range(len(self.nusc.scene))
        self.sample_tokens = []
        for scene_idx in scene_ids:
            scene = self.nusc.scene[scene_idx]
            sample_token = scene['first_sample_token']
            while sample_token != '':
                self.sample_tokens.append(sample_token)
                sample_token = self.nusc.get('sample', sample_token)['next']

        # PC matrix column indices (reference :90-98).
        self.int_idx = 3
        self.sweep_idx = 5
        self.inst_idx = 6
        self.cls_idx = 7
        VAL = 1000
        self.pc_range = [-VAL, -VAL, -VAL, VAL, VAL, VAL]

    def __len__(self):
        return len(self.sample_tokens)

    def read_obs(self, idx: int) -> dict:
        """Obs dict (reference :103-220): images, pc (N,7 =
        [xyz_ego, intensity, u, v, inst_idx]), pc_cam_idx, ego_at_lidar_ts,
        inst_tokens/cls/center, ego_global_x/y, meta."""
        sample_token = self.sample_tokens[idx]
        sample = self.nusc.get('sample', sample_token)
        obs = {'meta': {
            'sample_token': sample_token,
            'scene_token': sample['scene_token'],
            'cam_channels': self.cam_channels,
        }}

        out = nu.inst_centric_get_sweeps(
            self.nusc, sample_token,
            n_sweeps=self.num_sweeps, center_radius=2.0,
            in_box_tolerance=5e-2, return_instances_last_box=True,
            point_cloud_range=self.pc_range,
            detection_classes=nu.DETECTION_CLASSES,
            map_point_feat2idx={
                'sweep_idx': self.sweep_idx,
                'inst_idx': self.inst_idx,
                'cls_idx': self.cls_idx,
            })
        pc = np.asarray(out['points'], np.float64)  # lidar frame

        lidar = nu.NuScenesLidar(
            self.nusc,
            self.nusc.get('sample_data', sample['data']['LIDAR_TOP']))
        obs['ego_at_lidar_ts'] = lidar.glob_from_ego
        pc_in_ego = nu.homo_transform(lidar.ego_from_self, pc[:, :3])
        pc_int = pc[:, self.int_idx:self.int_idx + 1]
        pc_inst = pc[:, self.inst_idx:self.inst_idx + 1]

        # Project onto the 6 cameras; last projection wins for points seen
        # by two cameras (reference :178-199).
        pc_in_glob = nu.homo_transform(lidar.glob_from_ego, pc_in_ego)
        cameras = [
            nu.NuScenesCamera(
                self.nusc,
                self.nusc.get('sample_data', sample['data'][ch]))
            for ch in self.cam_channels
        ]
        obs['images'] = [cam.img for cam in cameras]
        pc_uv = np.zeros((pc.shape[0], 2), dtype=float)
        pc_cam_idx = -np.ones(pc.shape[0], dtype=int)
        for j, cam in enumerate(cameras):
            pc_in_cam = nu.homo_transform(np.linalg.inv(cam.glob_from_self),
                                          pc_in_glob)
            uv, mask_in = cam.project_pts3d(pc_in_cam)
            pc_uv[mask_in] = uv[mask_in]
            pc_cam_idx[mask_in] = j
        obs['pc_cam_idx'] = pc_cam_idx
        obs['pc'] = np.concatenate([pc_in_ego, pc_int, pc_uv, pc_inst],
                                   axis=1)

        obs['inst_tokens'] = out['instances_token']
        obs['inst_cls'] = [int(c) for c in out['instances_name']]
        obs['inst_center'] = out['instances_center']

        sd = self.nusc.get('sample_data', sample['data']['LIDAR_TOP'])
        pose = self.nusc.get('ego_pose', sd['ego_pose_token'])
        obs['ego_global_x'], obs['ego_global_y'], _ = pose['translation']
        return obs
