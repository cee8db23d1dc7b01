"""Semantic point cloud accumulator: host-side state machine around the
device point buffer.

API-parity counterpart of SemanticPointCloudAccumulator
(sem_pc_accum.py:14-477). Key behavioural equivalences:

  * The reference re-expresses every stored cloud/pose in the newest ego
    frame each integrate step (update_poses/update_sem_pcs,
    sem_pc_accum.py:156-183). We store everything ONCE in a fixed world
    frame (frame 0) and fold the world->newest-ego transform into the single
    fused raster pass at BEV time (bev_ref_frame='latest'), which is
    mathematically identical and deletes the O(frames^2 * points) loop.
    The oracle variant keeps bev_ref_frame='world'
    (nuscenes_oracle_sem_pc_accum.py:170-186).
  * Memory-horizon eviction (remove_observations, sem_pc_accum.py:185-209)
    trims host bookkeeping lists and advances the in-horizon window; device
    data is masked by frame id, never moved.
  * Pose distances are rigid-transform invariant, so path/segment distances
    computed from world-frame poses equal the reference's newest-ego-frame
    values.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum import buffer
from pc_accumulation_lib_tpu.bev import core as bev_core
from pc_accumulation_lib_tpu.bev.sem_bev import SemBEVGenerator
from pc_accumulation_lib_tpu.utils.io import (read_compressed_pickle,
                                              write_compressed_pickle)


class SemanticPointCloudAccumulator:
    """Base accumulator. Subclasses implement integrate()/obs2sem_vec_space
    per platform (KITTI-360, NuScenes, NuScenes oracle)."""

    # 'latest' = BEV in newest ego frame (ICP variants,
    # kitti360_sem_pc_accum.py:158-162); 'world' = fixed first-ego frame
    # (oracle variant).
    bev_ref_frame = 'latest'

    def __init__(self, horizon_dist: float, icp_threshold: float,
                 semseg_model=None, semseg_filters=cfg.DEFAULT_SEMSEG_FILTERS,
                 sem_idxs: Optional[dict] = None, use_gt_sem: bool = False,
                 bev_params: Optional[dict] = None,
                 accum_cfg: Optional[cfg.AccumConfig] = None,
                 seed: Optional[int] = None):
        self.horizon_dist = horizon_dist
        self.icp_threshold = icp_threshold
        self.semseg_model = semseg_model
        self.semseg_filters = tuple(int(f) for f in semseg_filters)
        self.sem_idxs = dict(sem_idxs or cfg.DEFAULT_SEM_IDXS)
        self.use_gt_sem = use_gt_sem
        self.accum_cfg = accum_cfg or cfg.AccumConfig(
            horizon_dist=horizon_dist, icp_threshold=icp_threshold,
            use_gt_sem=use_gt_sem, semseg_filters=self.semseg_filters)

        bev_params = bev_params or {}
        bev_type = bev_params.get('type', 'sem')
        self.sem_bev_generator = None
        if bev_type == 'sem':
            self.sem_bev_generator = SemBEVGenerator(
                self.sem_idxs,
                bev_params.get('view_size', 80),
                bev_params.get('pixel_size', 256),
                bev_params.get('max_trans_radius', 0.),
                bev_params.get('zoom_thresh', 0.),
                bev_params.get('do_warp', False),
                bev_params.get('int_scaler', 1.),
                bev_params.get('int_sep_scaler', 1.),
                bev_params.get('int_mid_threshold', 0.5),
                bev_params.get('height_filter'),
                seed=seed,
                mesh=bev_params.get('mesh'),  # point-sharded multi-chip
                fetch_dtype=bev_params.get('fetch_dtype', 'float16'),
                sparse_cap=bev_params.get('sparse_cap'),
                mesh_impl=bev_params.get('mesh_impl', 'auto'),
                fetch_group=bev_params.get('fetch_group', 4),
            )
        elif bev_type == 'rgb':
            from pc_accumulation_lib_tpu.bev.rgb_bev import RGBBEVGenerator
            self.sem_bev_generator = RGBBEVGenerator(
                bev_params.get('view_size', 80),
                bev_params.get('pixel_size', 256),
                bev_params.get('max_trans_radius', 0.),
                bev_params.get('zoom_thresh', 0.),
                bev_params.get('do_warp', False),
                bev_params.get('int_scaler', 1.),
                bev_params.get('int_sep_scaler', 1.),
                bev_params.get('int_mid_threshold', 0.5),
                seed=seed,
            )

        # Device buffer state.
        a = self.accum_cfg
        self.state = buffer.init_state(a.max_frames, a.painted_cap,
                                       a.max_instances)
        # Host bookkeeping (in-horizon window only, trimmed on eviction).
        self.frame_count = 0          # next global frame id
        self.window_start = 0         # global id of first in-horizon frame
        self.poses: List[list] = []   # world-frame ego positions [x,y,z]
        self.T_world_velo: List[np.ndarray] = []  # per-frame velo->world
        self.seg_dists: List[float] = []
        self.rgbs: List = []
        self.semsegs: List = []

    # ------------------------------------------------------------------
    # Abstract per-platform hooks
    # ------------------------------------------------------------------
    def integrate(self, observations: list):
        raise NotImplementedError()

    def obs2sem_vec_space(self, *args, **kwargs):
        raise NotImplementedError()

    # ------------------------------------------------------------------
    # Window / pose bookkeeping (sem_pc_accum.py:156-260)
    # ------------------------------------------------------------------
    def _append_frame(self, painted, valid_out, T_world_velo, rgb, semseg):
        self.state = buffer.insert_frame(self.state, painted, valid_out,
                                         jnp.int32(self.frame_count))
        self._append_frame_meta(T_world_velo, rgb, semseg)

    def _append_frame_meta(self, T_world_velo, rgb, semseg,
                           count_frame: bool = True):
        """Host bookkeeping for a frame already inserted on device.

        ``count_frame=False`` when the frame id was already reserved at
        dispatch time (pipelined integrate, accum/kitti360.py)."""
        if len(self.poses) >= self.accum_cfg.max_frames:
            raise RuntimeError(
                f'Point buffer frame overflow: window of {len(self.poses)} '
                f'frames exceeds max_frames={self.accum_cfg.max_frames}; '
                'raise AccumConfig.max_frames (points must not be silently '
                'dropped).')
        if count_frame:
            self.frame_count += 1
        self.T_world_velo.append(np.asarray(T_world_velo, np.float64))
        pose = list(np.asarray(T_world_velo, np.float64)[:3, 3])
        self.poses.append(pose)
        self.rgbs.append(rgb)
        self.semsegs.append(semseg)

    def remove_observations(self):
        """Evict frames beyond the travelled-path memory horizon
        (sem_pc_accum.py:185-209). Returns (num_removed, path_length)."""
        idx = 0
        seg_dist = self.dist(np.array(self.poses[-1]),
                             np.array(self.poses[-2]))
        self.seg_dists.append(seg_dist)
        path_length = float(np.sum(self.seg_dists))
        if path_length > self.horizon_dist:
            incr_path_dists = self.get_incremental_path_dists()
            overshoot = path_length - self.horizon_dist
            idx = int((incr_path_dists - overshoot > 0.).argmax())
            self.poses = self.poses[idx:]
            self.seg_dists = self.seg_dists[idx:]
            self.T_world_velo = self.T_world_velo[idx:]
            self.rgbs = self.rgbs[idx:]
            self.semsegs = self.semsegs[idx:]
            self.window_start += idx
        return idx, path_length

    @staticmethod
    def comp_incr_path_dist(seg_dists):
        """Cumulative path distances (sem_pc_accum.py:211-228)."""
        return np.cumsum(np.asarray(seg_dists, np.float64))

    def get_segment_dists(self) -> list:
        return self.seg_dists

    def get_incremental_path_dists(self) -> np.ndarray:
        return self.comp_incr_path_dist(self.seg_dists)

    def get_pose(self, idx: Optional[int] = None) -> np.ndarray:
        """World-frame ego positions. NOTE: the reference returns these in
        the newest ego frame (sem_pc_accum.py:253-260); all uses (pairwise
        distances) are rigid-invariant, so values here differ by a rigid
        transform but every distance matches."""
        if idx is None:
            return np.array(self.poses)
        return np.array(self.poses[idx])

    def get_rgb(self, idx: Optional[int] = None) -> list:
        return self.rgbs if idx is None else [self.rgbs[idx]]

    def get_semseg(self, idx: Optional[int] = None) -> list:
        return self.semsegs if idx is None else [self.semsegs[idx]]

    @staticmethod
    def dist(pose_0: np.ndarray, pose_1: np.ndarray) -> float:
        """Euclidean distance between poses (sem_pc_accum.py:404-415)."""
        return float(np.sqrt(np.sum((pose_1 - pose_0)**2)))

    # ------------------------------------------------------------------
    # BEV generation (kitti360_sem_pc_accum.py:166-243 analogue)
    # ------------------------------------------------------------------
    def _ref_transform(self) -> np.ndarray:
        """World -> BEV-reference-frame transform."""
        if self.bev_ref_frame == 'latest':
            return np.linalg.inv(self.T_world_velo[-1])
        return np.eye(4)

    def _poses_ref(self, T_ref_world: np.ndarray) -> np.ndarray:
        poses = np.array(self.poses, np.float64).reshape(-1, 3)
        return poses @ T_ref_world[:3, :3].T + T_ref_world[:3, 3]

    def _other_trajs(self, present_idx, gen_future):
        """Non-ego trajectories; platforms with tracking override
        (nuscenes_oracle_sem_pc_accum.py:272-340)."""
        return [], [], []

    def _gt_lanes(self):
        return None

    def generate_bev(self, present_idx: Optional[int] = None,
                     bev_num: int = 1, gen_future: bool = False,
                     async_fetch: bool = False):
        """Generate ``bev_num`` BEV dicts around pose ``present_idx``.

        With ``async_fetch=True`` all device work is dispatched but the
        device->host fetch is deferred: returns a zero-arg callable
        yielding the list, so the caller can dispatch the next frame's
        integrate/raster before paying the (tunnel-serialized) transfer."""
        n_frames = len(self.poses)
        T_ref_world = self._ref_transform()
        poses_ref = self._poses_ref(T_ref_world)
        pi = n_frames if present_idx is None else present_idx
        ref_idx = (n_frames - 1) if present_idx is None else present_idx
        bev_coords = poses_ref[ref_idx]

        trajs: Dict = {
            'ego_traj_present': poses_ref[:pi] - bev_coords,
        }
        other_p, other_f, other_full = self._other_trajs(pi, gen_future)
        trajs['other_trajs_present'] = other_p
        if gen_future:
            trajs['ego_traj_future'] = poses_ref[pi:] - bev_coords
            trajs['ego_traj_full'] = poses_ref - bev_coords
            trajs['other_trajs_future'] = other_f
            trajs['other_trajs_full'] = other_full
        lanes = self._gt_lanes()
        if lanes is not None:
            trajs['gt_lanes'] = [
                np.asarray(l, np.float64) @ T_ref_world[:3, :3].T
                + T_ref_world[:3, 3] - bev_coords for l in lanes
            ]

        params = bev_core.identity_params(
            T_ref_world=T_ref_world.astype(np.float32),
            bev_coords=bev_coords.astype(np.float32),
            window=(self.window_start, self.frame_count - 1),
            present_frame=self.window_start + pi)

        f, n, d = self.state.points.shape
        flat_pts = self.state.points.reshape(f * n, d)
        flat_valid = self.state.valid.reshape(f * n)
        pt_fids = jnp.repeat(self.state.frame_ids, n)
        return self.sem_bev_generator.generate_samples(
            flat_pts, flat_valid, pt_fids, self.state.inst_dyn, params,
            trajs, bev_num, gen_future, async_fetch=async_fetch)

    # ------------------------------------------------------------------
    # IO / viz parity helpers
    # ------------------------------------------------------------------
    write_compressed_pickle = staticmethod(write_compressed_pickle)
    read_compressed_pickle = staticmethod(read_compressed_pickle)

    def viz_bev(self, bev, file_path, rgbs: list = (), semsegs: list = ()):
        self.sem_bev_generator.viz_bev(bev, file_path, list(rgbs),
                                       list(semsegs))

    def get_vector_space(self):
        """Fetch the accumulated in-window world-frame cloud as a numpy
        (N,10) array (analogue of concatenating sem_pcs,
        sem_pc_accum.py:417-422)."""
        pts = np.asarray(self.state.points).reshape(-1, cfg.PT_DIM)
        valid = np.asarray(self.state.valid).reshape(-1)
        fids = np.repeat(np.asarray(self.state.frame_ids),
                         self.state.points.shape[1])
        keep = valid & (fids >= self.window_start)
        return pts[keep]

    def viz_sem_vec_space(self, file_path: str = 'sem_vec_space.ply',
                          color: str = 'rgb'):
        """Export the accumulated semantic vector space + ego path.

        Offscreen PLY replacement for the interactive Open3D viewer
        (sem_pc_accum.py:417-465, nuscenes_oracle_sem_pc_accum.py:612-698
        'dyn'/'rgb' colouring modes).
        """
        from pc_accumulation_lib_tpu.utils.ply import write_ply
        pts = self.get_vector_space()
        if color == 'dyn':
            # yellow = dynamic, blue = static (reference :646-657).
            dyn = np.maximum(
                pts[:, cfg.PT_DYN],
                np.asarray(self.state.inst_dyn)[
                    np.clip(pts[:, cfg.PT_INST].astype(int), 0,
                            self.state.inst_dyn.shape[0] - 1)])
            rgb = np.where(dyn[:, None] > 0.5,
                           np.array([[253, 231, 36]]),
                           np.array([[68, 2, 85]]))
        else:
            rgb = pts[:, cfg.PT_R:cfg.PT_B + 1]
        write_ply(file_path, pts[:, :3], rgb)
        np.savetxt(file_path + '.poses.txt', np.array(self.poses))
        return pts.shape[0]
