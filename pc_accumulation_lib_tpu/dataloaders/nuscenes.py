"""NuScenes observation dataloader.

Produces the per-keyframe observation dicts the NuScenes accumulators
consume (contract of the reference loader, obs_dataloaders/
nuscenes_obs_dataloader.py:103-220): multi-sweep instance-labelled points
in the ego frame, the 6 camera images with per-point (u, v) + camera
assignment, GT box instances, and the global ego position.

Structural differences from the reference by design:
  * the per-camera projection loop becomes ONE batched all-camera einsum
    (nuscenes_utils.project_points_to_rig) with identical assignment
    semantics;
  * torch is not used (the reference's load_data_to_tensor is dropped —
    every downstream consumer here takes numpy);
  * the devkit stays host-side (SURVEY.md section 7 decision 8) and is
    only touched through the small query helpers below, so the whole
    host path is testable against a recorded fake (tests/fake_nusc.py).
"""
from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np

from pc_accumulation_lib_tpu.dataloaders import nuscenes_utils as nu
from pc_accumulation_lib_tpu.dataloaders.base import ObservationDataloader

CAM_CHANNELS = ('CAM_FRONT', 'CAM_FRONT_LEFT', 'CAM_FRONT_RIGHT',
                'CAM_BACK', 'CAM_BACK_LEFT', 'CAM_BACK_RIGHT')

# Feature column layout of the (N, 8) multi-sweep point rows produced by
# inst_centric_get_sweeps: [x, y, z, intensity, time_lag, sweep, inst, cls].
SWEEP_COLS = dict(int_idx=3, time_idx=4, sweep_idx=5, inst_idx=6, cls_idx=7)

# "Large enough" extraction range — the reference keeps every point and
# relies on the BEV view crop downstream (nuscenes_obs_dataloader.py:96-98).
_UNBOUNDED_M = 1000.0


def keyframe_tokens(nusc, scene_ids: Iterable[int]) -> List[str]:
    """Flatten the chosen scenes into their ordered keyframe sample-token
    chains (first_sample_token -> ... -> '')."""
    tokens = []
    for scene_idx in scene_ids:
        tok = nusc.scene[scene_idx]['first_sample_token']
        while tok:
            tokens.append(tok)
            tok = nusc.get('sample', tok)['next']
    return tokens


class NuScenesDataloader(ObservationDataloader):
    """Index-based keyframe loader over one or more NuScenes scenes."""

    def __init__(self, nusc, scene_ids: Optional[List[int]] = None,
                 batch_size: int = 1, num_sweeps: int = 5):
        """``nusc``: a NuScenes devkit instance (or an API-compatible
        recorded fake); ``num_sweeps``: how many preceding non-keyframe
        lidar sweeps merge into each keyframe cloud."""
        super().__init__(None, batch_size)
        self.nusc = nusc
        self.num_sweeps = num_sweeps
        self.cam_channels = list(CAM_CHANNELS)
        self.sample_tokens = keyframe_tokens(
            nusc, range(len(nusc.scene)) if scene_ids is None else scene_ids)
        # Column-layout attributes kept for reference API compatibility.
        self.int_idx = SWEEP_COLS['int_idx']
        self.sweep_idx = SWEEP_COLS['sweep_idx']
        self.inst_idx = SWEEP_COLS['inst_idx']
        self.cls_idx = SWEEP_COLS['cls_idx']
        v = _UNBOUNDED_M
        self.pc_range = [-v, -v, -v, v, v, v]

    def __len__(self) -> int:
        return len(self.sample_tokens)

    # ------------------------------------------------------------------
    def _fetch_sweeps(self, sample_token: str) -> dict:
        """Multi-sweep instance-labelled cloud in the lidar frame."""
        return nu.inst_centric_get_sweeps(
            self.nusc, sample_token,
            n_sweeps=self.num_sweeps,
            center_radius=2.0,
            in_box_tolerance=5e-2,
            return_instances_last_box=True,
            point_cloud_range=self.pc_range,
            detection_classes=nu.DETECTION_CLASSES,
            map_point_feat2idx={k: SWEEP_COLS[k] for k in
                                ('sweep_idx', 'inst_idx', 'cls_idx')})

    def _rig(self, sample: dict):
        """The six camera sensors of one sample."""
        return [
            nu.NuScenesCamera(self.nusc,
                              self.nusc.get('sample_data', sample['data'][c]))
            for c in self.cam_channels
        ]

    # ------------------------------------------------------------------
    def read_obs(self, idx: int) -> dict:
        """One keyframe observation dict:

          images:          list of 6 PIL images
          pc:              (N, 7) [x, y, z (ego frame), intensity, u, v,
                           instance idx (-1 = background)]
          pc_cam_idx:      (N,) camera a point projects into (-1 = none)
          ego_at_lidar_ts: (4, 4) global <- ego at the lidar timestamp
          inst_tokens / inst_cls / inst_center: GT box instances
          ego_global_x/y:  ego map position
          meta:            sample/scene tokens + camera channel names
        """
        token = self.sample_tokens[idx]
        sample = self.nusc.get('sample', token)
        sweeps = self._fetch_sweeps(token)
        pts = np.asarray(sweeps['points'], np.float64)   # lidar frame, (N,8)

        lidar = nu.NuScenesLidar(
            self.nusc,
            self.nusc.get('sample_data', sample['data']['LIDAR_TOP']))
        xyz_ego = nu.homo_transform(lidar.ego_from_self, pts[:, :3])
        xyz_glob = nu.homo_transform(lidar.glob_from_ego, xyz_ego)

        cameras = self._rig(sample)
        uv, cam_idx = nu.project_points_to_rig(
            xyz_glob,
            np.linalg.inv(np.stack([c.glob_from_self for c in cameras])),
            np.stack([c.cam_K for c in cameras]),
            np.stack([c.img_wh for c in cameras]))

        feature_rows = np.column_stack([
            xyz_ego,
            pts[:, SWEEP_COLS['int_idx']],
            uv,
            pts[:, SWEEP_COLS['inst_idx']],
        ])
        # inst_tokens / inst_center are per box OCCURRENCE (a token repeats
        # once per sweep that saw it). The reference emits inst_cls per
        # UNIQUE instance yet indexes all three lists in parallel
        # (nuscenes_oracle_sem_pc_accum.py:204-211) — an IndexError on any
        # multi-sweep scene. Here inst_cls is per-occurrence too, so the
        # three lists are actually parallel. (instances_name is ordered by
        # first appearance, which is also the first-appearance order of
        # tokens in instances_token.)
        uniq = {}
        for t in sweeps['instances_token']:
            uniq.setdefault(t, len(uniq))
        occ_cls = [int(sweeps['instances_name'][uniq[t]])
                   for t in sweeps['instances_token']]
        ego_xy = lidar.glob_from_ego[:2, 3]
        return {
            'images': [c.img for c in cameras],
            'pc': feature_rows,
            'pc_cam_idx': cam_idx,
            'ego_at_lidar_ts': lidar.glob_from_ego,
            'inst_tokens': sweeps['instances_token'],
            'inst_cls': occ_cls,
            'inst_center': sweeps['instances_center'],
            'ego_global_x': float(ego_xy[0]),
            'ego_global_y': float(ego_xy[1]),
            'meta': {
                'sample_token': token,
                'scene_token': sample['scene_token'],
                'cam_channels': self.cam_channels,
            },
        }
