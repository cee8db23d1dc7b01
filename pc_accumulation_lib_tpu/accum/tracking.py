"""Fake object detection + tracking system (host-side).

Counterpart of the tracking logic embedded in
NuScenesOracleSemanticPointCloudAccumulator (reference
nuscenes_oracle_sem_pc_accum.py:79-97, :191-250, :272-414): per-instance
pose histories keyed by annotation token, dynamic flagging when the (x,y)
displacement between first and last observation exceeds a threshold, and
past/future trajectory extraction split into temporally coherent segments.

Structural change: instead of retroactively rewriting past points' dyn
column (reference :243-250), each token gets a GLOBAL instance id and the
device keeps a per-id dyn table folded in at raster time
(accum/buffer.set_instance_dyn) — the relabel is O(1).
Global id 0 is reserved for "no instance".
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

TRACK_INST_CLASSES = (0, 1, 2, 3, 5)  # skips trailer/bicycle/pedestrian
                                      # (reference :92)


class InstanceTracker:

    def __init__(self, dyn_trans_thresh: float = 1.0,
                 track_inst_clss=TRACK_INST_CLASSES):
        self.dyn_obj_trans_thresh = dyn_trans_thresh
        self.track_inst_clss = tuple(track_inst_clss)
        # token -> [(pose_world (3,), ts), ...] (reference :80-83)
        self.instances: Dict[str, list] = {}
        self.dyn_instances: List[str] = []      # tokens flagged dynamic
        self.token2global: Dict[str, int] = {}  # token -> global inst id
        self._next_global = 1                   # 0 = no instance

    def global_id(self, token: str) -> int:
        if token not in self.token2global:
            self.token2global[token] = self._next_global
            self._next_global += 1
        return self.token2global[token]

    def update(self, ts: int, inst_tokens, inst_clss, inst_centers_world):
        """Track one frame's detections (reference :199-250).

        Args:
          inst_centers_world: (3,) world-frame object centers per token.
        Returns:
          frame_to_global: dict frame_inst_idx -> global id (for remapping
            the per-point instance column);
          newly_dynamic: list of global ids that became dynamic this frame
            (feed to buffer.set_instance_dyn — replaces the retroactive
            point rewrite).
        """
        frame_to_global = {}
        newly_dynamic = []
        for idx, token in enumerate(inst_tokens):
            if inst_clss[idx] not in self.track_inst_clss:
                continue
            pose = np.asarray(inst_centers_world[idx], np.float64)
            if token not in self.instances:
                self.instances[token] = []
            self.instances[token].append((pose, ts))
            gid = self.global_id(token)
            frame_to_global[idx] = gid

            if token in self.dyn_instances:
                continue
            poses = [p for p, _ in self.instances[token]]
            if len(poses) < 2:
                continue
            delta = np.linalg.norm(poses[-1][:2] - poses[0][:2])
            if delta > self.dyn_obj_trans_thresh:
                self.dyn_instances.append(token)
                newly_dynamic.append(gid)
        return frame_to_global, newly_dynamic

    # ------------------------------------------------------------------
    # Trajectory extraction (reference :272-414)
    # ------------------------------------------------------------------
    @staticmethod
    def find_nearest_ge_idx(array, target_val):
        """First index with value >= target (reference :342-354)."""
        for idx, val in enumerate(array):
            if val >= target_val:
                return idx
        raise ValueError(f'Value {target_val} not in array {array}')

    @staticmethod
    def find_nearest_le_idx(array, target_val):
        """Last index with value <= target (reference :356-374)."""
        if array[0] > target_val:
            raise ValueError(f'Value {target_val} not in array {array}')
        for idx in range(len(array) - 1):
            if array[idx + 1] > target_val:
                return idx
        return len(array) - 1

    @staticmethod
    def parse_seq_into_coherent_seqs(ts: list) -> List[List[int]]:
        """Split partially-sequential timestamps into runs of consecutive
        steps, as LOCAL indices (reference :390-414)."""
        seq_tss = [[]]
        t_prev = ts[0] - 1
        seq_idx = 0
        for t in ts:
            if t - t_prev != 1:
                seq_tss.append([])
            seq_tss[-1].append(seq_idx)
            t_prev = t
            seq_idx += 1
        return seq_tss

    def parse_coherent_pose_seqs(self, poses, tss):
        """(reference :376-388)"""
        seq_tss = self.parse_seq_into_coherent_seqs(tss)
        seq_poses = []
        for seq_ts in seq_tss:
            seq_poses.append([])
            for t in seq_ts:
                seq_poses[-1].append(np.asarray(poses[t]).tolist())
        return seq_poses

    def get_dyn_obj_trajs(self, ts_start: int = 0,
                          ts_end: Optional[int] = None,
                          ego_poses: Optional[list] = None) -> list:
        """Dynamic-object trajectories within a time interval as lists of
        (x,y,z) pose lists (reference :289-340)."""
        seq_poses_set = []
        for token, pose_obss in self.instances.items():
            if token not in self.dyn_instances:
                continue
            poses, tss = zip(*pose_obss)
            try:
                idx_start = self.find_nearest_ge_idx(tss, ts_start)
                idx_end = None
                if ts_end is not None:
                    idx_end = self.find_nearest_le_idx(tss, ts_end) + 1
            except ValueError:
                continue
            poses = poses[idx_start:idx_end]
            tss = tss[idx_start:idx_end]
            for seq_pose in self.parse_coherent_pose_seqs(poses, tss):
                if len(seq_pose) < 2:
                    continue
                seq_poses_set.append(seq_pose)
        if ego_poses is not None:
            seq_poses_set.append(ego_poses)
        return seq_poses_set

    def get_split_dyn_obj_trajs(self, split_idx: int) -> Tuple[list, list,
                                                               list]:
        """past/future/full trajectory sets (reference :272-287)."""
        past = self.get_dyn_obj_trajs(ts_end=split_idx)
        future = self.get_dyn_obj_trajs(ts_start=split_idx)
        full = self.get_dyn_obj_trajs()
        return past, future, full
