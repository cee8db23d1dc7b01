"""KITTI-360 accumulator: 1 forward camera + 360-degree lidar, ICP ego-motion.

Counterpart of Kitti360SemanticPointCloudAccumulator
(kitti360_sem_pc_accum.py:8-243). Per-frame device work is fused into three
jitted calls: ICP preprocess+register (ops/icp.py), camera/GT painting
(accum/buffer.py), and the ring-buffer insert. Pose history is kept as a
world-frame chain (see accum/base.py) instead of re-transforming all stored
clouds every frame.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum import buffer
from pc_accumulation_lib_tpu.accum.base import SemanticPointCloudAccumulator
from pc_accumulation_lib_tpu.ops import icp as icp_ops


class Kitti360SemanticPointCloudAccumulator(SemanticPointCloudAccumulator):

    bev_ref_frame = 'latest'

    def __init__(self, horizon_dist: float, calib_params: dict,
                 icp_threshold: float, semseg_model=None,
                 semseg_filters=cfg.DEFAULT_SEMSEG_FILTERS,
                 sem_idxs: Optional[dict] = None, use_gt_sem: bool = False,
                 bev_params: Optional[dict] = None,
                 accum_cfg: Optional[cfg.AccumConfig] = None,
                 icp_cfg: Optional[cfg.ICPConfig] = None,
                 seed: Optional[int] = None):
        """Args mirror the reference constructor
        (kitti360_sem_pc_accum.py:9-39); ``semseg_model`` is any callable
        rgb(H,W,3)->class-map(H,W) (e.g. models.semseg.SemSegTPU) instead of
        an ONNX path."""
        super().__init__(horizon_dist, icp_threshold, semseg_model,
                         semseg_filters, sem_idxs, use_gt_sem, bev_params,
                         accum_cfg, seed)
        self.P_velo_frame = np.asarray(calib_params['p_velo_frame'],
                                       np.float32)
        self.H_velo_cam = np.asarray(calib_params['h_velo_cam'], np.float64)
        self.P_cam_frame = np.asarray(calib_params['p_cam_frame'],
                                      np.float64)

        self.icp_cfg = icp_cfg or cfg.ICPConfig(max_corr_dist=icp_threshold)
        self._icp_pre = icp_ops.make_preprocess_fn(
            self.icp_cfg.downsample_voxel, self.icp_cfg.max_downsampled,
            self.icp_cfg.normal_neighbors)
        self._icp_reg = icp_ops.make_register_fn(self.icp_cfg.num_iters)
        self._icp_prev_cloud = None
        self._T_world_velo_last = np.eye(4)

    def _pad_pc(self, pc: np.ndarray):
        n_cap = self.accum_cfg.max_points_per_frame
        n = pc.shape[0]
        if n > n_cap:
            raise RuntimeError(
                f'Frame has {n} points > max_points_per_frame={n_cap}; '
                'raise AccumConfig.max_points_per_frame.')
        out = np.zeros((n_cap, pc.shape[1]), np.float32)
        out[:n] = pc
        valid = np.arange(n_cap) < n
        return jnp.asarray(out), jnp.asarray(valid)

    def integrate(self, observations: list):
        """Integrate observations [(rgb, pc, sem_gt), ...]
        (kitti360_sem_pc_accum.py:41-88). Returns number of evicted frames."""
        num_removed = 0
        for obs in observations:
            rgb, pc, sem_gt = obs
            if self.use_gt_sem:
                self.obs2sem_vec_space(rgb, pc, sem_gt)
            else:
                self.obs2sem_vec_space(rgb, pc)
            if len(self.poses) > 1:
                idx, path_length = self.remove_observations()
                num_removed += idx
                print(f'    #pc {len(self.poses)} |',
                      f'path length {path_length:.2f}')
        return num_removed

    def obs2sem_vec_space(self, rgb, pc: np.ndarray,
                          sem_gt: Optional[np.ndarray] = None):
        """Paint one observation into the world-frame buffer
        (kitti360_sem_pc_accum.py:90-164)."""
        pc = np.asarray(pc, np.float32)
        pc_pad, valid = self._pad_pc(pc)

        # Ego-motion: point-to-plane ICP vs previous frame
        # (kitti360_sem_pc_accum.py:114-127). T_new_prev maps prev-ego ->
        # new-ego coords; the world chain is T_w_k = T_w_{k-1} @ inv(T_new_prev).
        new_cloud = self._icp_pre(pc_pad[:, :3], valid)
        if self._icp_prev_cloud is None:
            T_new_prev = np.eye(4)
        else:
            T, _, _ = self._icp_reg(self._icp_prev_cloud, new_cloud,
                                    jnp.eye(4, dtype=jnp.float32),
                                    jnp.float32(self.icp_cfg.max_corr_dist))
            T_new_prev = np.asarray(T, np.float64)
        self._icp_prev_cloud = new_cloud
        T_world_velo = self._T_world_velo_last @ np.linalg.inv(T_new_prev)
        self._T_world_velo_last = T_world_velo
        T_dev = jnp.asarray(T_world_velo, jnp.float32)

        if sem_gt is None:
            semseg = np.asarray(self.semseg_model(rgb))
            rgb_arr = jnp.asarray(np.asarray(rgb, np.float32)[..., :3])
            painted, valid_out = buffer.paint_frame_camera(
                pc_pad, valid, rgb_arr, jnp.asarray(semseg, jnp.int32),
                jnp.asarray(self.P_velo_frame), T_dev, self.semseg_filters)
        else:
            semseg = None
            sem_flat = np.zeros(self.accum_cfg.max_points_per_frame,
                                np.float32)
            sem_flat[:pc.shape[0]] = np.asarray(sem_gt).reshape(-1)
            painted, valid_out = buffer.paint_frame_gt(
                pc_pad, valid, jnp.asarray(sem_flat), T_dev,
                self.semseg_filters)

        self._append_frame(painted, valid_out, T_world_velo, rgb, semseg)
        return painted, self.poses[-1], semseg, T_new_prev
