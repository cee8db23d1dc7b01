"""NuScenes oracle-pose accumulator: GT ego poses, 6-camera painting, fake
detection + tracking, optional GT lane centerlines.

Counterpart of NuScenesOracleSemanticPointCloudAccumulator
(nuscenes_oracle_sem_pc_accum.py:12-732). Key equivalences:
  * fixed world frame = first ego pose (T_global_world, reference
    :170-186) -> bev_ref_frame='world';
  * no memory-horizon eviction (the oracle never evicts);
  * fake tracking lives in accum/tracking.InstanceTracker; the retroactive
    dyn relabel of past points (reference :243-250) becomes a per-global-id
    device table update (buffer.set_instance_dyn) folded in at raster time;
  * all 6 cameras run one batched semseg forward + one gather paint
    (vs 6 serial session.run calls, reference :461-469).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum import buffer, tracking
from pc_accumulation_lib_tpu.accum.base import SemanticPointCloudAccumulator

_MAX_DYN_UPDATES = 64  # padded per-frame dynamic-flag update batch


class OracleDeviceObs(NamedTuple):
    """A pre-uploaded oracle observation (see ``upload_obs``): the 6-camera
    u8 image stack (~6.5 MB/frame — the dominant host->device transfer of
    the oracle mode) plus padded points start their upload early; the host
    ``obs`` dict rides along for the tracking/pose work that must run in
    dispatch order."""
    obs: dict
    pc: object        # host (N,C) float32 points (tracking remap sizing)
    pc_pad: object
    valid: object
    cam_idx: object
    imgs: object


class NuScenesOracleSemanticPointCloudAccumulator(
        SemanticPointCloudAccumulator):

    bev_ref_frame = 'world'

    def __init__(self, semseg_model=None,
                 semseg_filters=cfg.DEFAULT_SEMSEG_FILTERS,
                 sem_idxs: Optional[dict] = None, use_gt_sem: bool = False,
                 bev_params: Optional[dict] = None, loc: Optional[str] = None,
                 get_gt_lanes: bool = False, dataroot: Optional[str] = None,
                 accum_cfg: Optional[cfg.AccumConfig] = None,
                 gt_lane_poses: Optional[list] = None,
                 seed: Optional[int] = None,
                 img_transfer: str = 'rgb8',
                 transfer_dtype: str = 'float32'):
        """Args mirror the reference constructor (reference :15-102);
        ``gt_lane_poses`` may be injected directly (tests) instead of
        loading via the devkit map expansion.

        ``img_transfer``: camera wire encoding — 'rgb8' (u8, already 4x
        fewer bytes than the reference's float32 GPU tensors), 'yuv420'
        (1.5 B/px, halves the oracle mode's dominant 6-camera upload;
        NuScenes JPEGs are 4:2:0 at the source) or 'yuv420h' (0.75 B/px:
        4-bit-quantized 2x2 Haar luma + 4x4 chroma — a genuinely lossy
        step, bounded and measured in tests/test_imgcodec.py; see
        ops/imgcodec.py).

        ``transfer_dtype``: point wire encoding — 'float32' or 'quantized'
        (13 B/point vs 28; xyz at 5 mm fixed point, see accum/pointpack.py
        for the full envelope and loud range checks)."""
        if img_transfer not in ('rgb8', 'yuv420', 'yuv420h'):
            raise ValueError(f'img_transfer={img_transfer!r}')
        if transfer_dtype not in ('float32', 'quantized'):
            raise ValueError(f'transfer_dtype={transfer_dtype!r}')
        if use_gt_sem:
            raise NotImplementedError()
        super().__init__(horizon_dist=np.inf, icp_threshold=np.inf,
                         semseg_model=semseg_model,
                         semseg_filters=semseg_filters, sem_idxs=sem_idxs,
                         use_gt_sem=use_gt_sem, bev_params=bev_params,
                         accum_cfg=accum_cfg, seed=seed)
        self.ts = 0
        self.T_global_world = None
        self.ego_pose_z = 1.0                      # (reference :77)
        self.tracker = tracking.InstanceTracker()
        self.map = loc
        self.ego_global_xs: List[float] = []
        self.ego_global_ys: List[float] = []
        self.get_gt_lanes = get_gt_lanes
        self.gt_lane_poses = gt_lane_poses
        if self.get_gt_lanes and self.gt_lane_poses is None:
            from pc_accumulation_lib_tpu.dataloaders.lanemap import (
                get_centerlines)
            self.gt_lane_poses = get_centerlines(dataroot, loc)
        self.img_transfer = img_transfer
        self.transfer_dtype = transfer_dtype
        self.upload_bytes_total = 0   # host->device obs wire telemetry
        self.upload_frames = 0        # (bench oracle upload-floor line)
        self._fused = self._build_fused_step()

    def _build_fused_step(self):
        filters = self.semseg_filters
        model = self.semseg_model
        cap = self.accum_cfg.painted_cap
        n_pad = self.accum_cfg.max_points_per_frame

        def step(state, variables, pc_pad, valid, cam_idx, imgs,
                 T_world_ego, inst_remap, dyn_updates, frame_id):
            if pc_pad.dtype == jnp.uint8:  # quantized 13 B/point transfer
                from pc_accumulation_lib_tpu.accum import pointpack
                pc_pad = pointpack.unpack_points7(pc_pad, n_pad)
            if isinstance(imgs, tuple):  # yuv420/yuv420h wire encoding
                from pc_accumulation_lib_tpu.ops import imgcodec
                imgs = imgcodec.decode_wire(imgs)
            elif imgs.dtype == jnp.uint8:  # quantized transfer
                imgs = imgs.astype(jnp.float32)
            logits = model.model.apply(variables, imgs, train=False)
            semsegs = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            painted, valid_out = buffer.paint_frame_multicam(
                pc_pad, valid, cam_idx, imgs, semsegs, T_world_ego,
                inst_remap, filters)
            painted, valid_out, n_valid = buffer.compact_rows(
                painted, valid_out, cap)
            state = buffer.insert_frame(state, painted, valid_out, frame_id)
            state = state._replace(inst_dyn=state.inst_dyn.at[
                dyn_updates].max(jnp.where(dyn_updates > 0, 1.0, 0.0)))
            return state, n_valid, semsegs

        return jax.jit(step, donate_argnums=(0,))

    def integrate(self, observations: list):
        """Integrate obs dicts — or pre-uploaded ``OracleDeviceObs`` from
        ``upload_obs`` — (reference :139-270). No eviction; returns 0
        for API parity with the streaming accumulators."""
        for obs in observations:
            self._integrate_one(obs)
        return 0

    def upload_obs(self, obs) -> OracleDeviceObs:
        """Start the host->device upload of one observation's arrays and
        return an ``OracleDeviceObs`` accepted by ``integrate``.

        The oracle mode is UPLOAD-bound on a remote-TPU link (6 cameras of
        u8 bytes per frame); pre-uploading frame i+1 on a worker thread
        while frame i integrates overlaps the wire time with compute
        (bench.py bench_nuscenes_oracle). Tracking/pose state is untouched
        here — it must run in dispatch order (_integrate_one)."""
        if isinstance(obs, OracleDeviceObs):
            return obs
        pc = np.asarray(obs['pc'], np.float32)
        pc_cam_idx = np.asarray(obs['pc_cam_idx'], np.int32)
        n_pad = self.accum_cfg.max_points_per_frame
        if pc.shape[0] > n_pad:
            raise RuntimeError(
                f'Frame has {pc.shape[0]} points > max_points_per_frame='
                f'{n_pad}.')
        if self.transfer_dtype == 'quantized':
            from pc_accumulation_lib_tpu.accum import pointpack
            pc_p = pointpack.pack_points7_np(pc, n_pad)
        else:
            pc_p = np.zeros((n_pad, pc.shape[1]), np.float32)
            pc_p[:pc.shape[0]] = pc
        ci_p = -np.ones(n_pad, np.int32)
        ci_p[:pc.shape[0]] = pc_cam_idx
        valid = np.arange(n_pad) < pc.shape[0]
        # uint8 image upload (4x fewer bytes host->device; cast on device);
        # 'yuv420' halves that again (see ops/imgcodec.py).
        imgs = np.stack([np.asarray(im)[..., :3].astype(np.uint8)
                         for im in obs['images']])
        if self.img_transfer in ('yuv420', 'yuv420h'):
            from pc_accumulation_lib_tpu.ops import imgcodec
            enc = imgcodec.encode_wire(imgs, self.img_transfer)
            dev_imgs = tuple(jnp.asarray(p) for p in enc)
        else:
            dev_imgs = jnp.asarray(imgs)
        img_parts = dev_imgs if isinstance(dev_imgs, tuple) else (dev_imgs,)
        self.upload_bytes_total += (pc_p.nbytes + ci_p.nbytes + valid.size
                                    + sum(int(p.nbytes) for p in img_parts))
        self.upload_frames += 1
        return OracleDeviceObs(obs, pc, jnp.asarray(pc_p),
                               jnp.asarray(valid), jnp.asarray(ci_p),
                               dev_imgs)

    def _integrate_one(self, obs):
        dev = self.upload_obs(obs)
        obs, pc = dev.obs, dev.pc
        T_ego_global = np.asarray(obs['ego_at_lidar_ts'], np.float64)

        if self.T_global_world is None:
            # World frame := first ego frame (reference :170-177).
            self.T_global_world = np.linalg.inv(T_ego_global)
            if self.get_gt_lanes and self.gt_lane_poses is not None:
                self.gt_lane_poses = [
                    np.asarray(l) @ self.T_global_world[:3, :3].T
                    + self.T_global_world[:3, 3] for l in self.gt_lane_poses
                ]

        T_ego_world = self.T_global_world @ T_ego_global
        pose = T_ego_world[:3, -1].tolist()
        pose[2] += self.ego_pose_z                  # (reference :450-452)

        # ---- fake detection + tracking (host, reference :191-250) ----
        centers_world = [
            self.T_global_world[:3, :3] @ np.asarray(c)
            + self.T_global_world[:3, 3] for c in obs['inst_center']
        ]
        frame_to_global, newly_dynamic = self.tracker.update(
            self.ts, obs['inst_tokens'], obs['inst_cls'], centers_world)
        if self.tracker._next_global >= self.accum_cfg.max_instances:
            raise RuntimeError(
                f'Instance table overflow (> {self.accum_cfg.max_instances}'
                '); raise AccumConfig.max_instances.')
        max_fi = int(pc[:, 6].max()) if pc.shape[0] else -1
        remap = np.zeros(max(max_fi + 2, 2), np.int32)
        # The pc instance column holds the UNIQUE first-appearance index
        # (inst_centric_get_sweeps), while the tracker keys results by the
        # OCCURRENCE index into inst_tokens (a token repeats once per sweep
        # that saw it) — convert via the first-appearance map. NOTE: the
        # reference conflates the two (nuscenes_oracle_sem_pc_accum.py:
        # 225-230 masks the unique-index pc column with the occurrence
        # index), silently mislabelling dynamic points on multi-sweep
        # scenes; fixed here by construction.
        tokens = obs['inst_tokens']
        uniq: dict = {}
        for t in tokens:
            uniq.setdefault(t, len(uniq))
        for occ_idx, gid in frame_to_global.items():
            fi = uniq[tokens[occ_idx]]
            if fi + 1 < remap.shape[0]:
                remap[fi + 1] = gid
        # Newly-dynamic global ids -> device dyn table (covers both the
        # "flag new observations" and "retroactively relabel past points"
        # branches of reference :223-250, since the table applies to every
        # stored point at raster time). Padded; id 0 is a no-op slot.
        dyn_updates = np.zeros(_MAX_DYN_UPDATES, np.int32)
        for i, gid in enumerate(newly_dynamic[:_MAX_DYN_UPDATES]):
            dyn_updates[i] = gid

        # ---- fused device step: semseg + paint + insert ----
        self.state, n_valid, semsegs = self._fused(
            self.state, self.semseg_model.variables, dev.pc_pad,
            dev.valid, dev.cam_idx, dev.imgs,
            jnp.asarray(T_ego_world, jnp.float32), jnp.asarray(remap),
            jnp.asarray(dyn_updates), jnp.int32(self.frame_count))

        self._append_frame_meta(T_ego_world, obs['images'], semsegs)
        self.ego_global_xs.append(obs['ego_global_x'])
        self.ego_global_ys.append(obs['ego_global_y'])
        # Oracle pose: world-frame ego position with z-lift, NOT the velo
        # chain translation (reference :447-452).
        self.poses[-1] = pose

        if len(self.poses) > 1:
            seg_dist = self.dist(np.array(self.poses[-1]),
                                 np.array(self.poses[-2]))
            self.seg_dists.append(seg_dist)
            path_length = float(np.sum(self.seg_dists))
        else:
            path_length = 0.0
        print(f'    ts {self.ts} | #pc {len(self.poses)} |',
              f'path length {path_length:.2f}')
        self.ts += 1

    # ------------------------------------------------------------------
    # Trajectories + lanes for BEV generation
    # ------------------------------------------------------------------
    def _other_trajs(self, present_idx, gen_future):
        past, future, full = self.tracker.get_split_dyn_obj_trajs(
            present_idx)
        to_np = lambda ts: [np.asarray(t, np.float64) for t in ts]  # noqa
        if gen_future:
            return to_np(past), to_np(future), to_np(full)
        return to_np(past), [], []

    def _gt_lanes(self):
        if self.get_gt_lanes and self.gt_lane_poses is not None:
            return self.gt_lane_poses
        return None

    def get_split_dyn_obj_trajs(self, split_idx, skip_ego_traj=True):
        """Reference-parity accessor (reference :272-287)."""
        return self.tracker.get_split_dyn_obj_trajs(split_idx)

    def get_dyn_obj_trajs(self, ts_start: int = 0, ts_end=None,
                          skip_ego_traj: bool = True):
        """(reference :289-340)"""
        return self.tracker.get_dyn_obj_trajs(
            ts_start, ts_end,
            ego_poses=None if skip_ego_traj else self.poses)

    def viz_gt_lane_map(self, file_path: str = 'gt_lane_map.png',
                        grid_spacing: float = 50):
        """Lane-map plot (reference :104-137), saved to file instead of
        plt.show()."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        x0 = y0 = np.inf
        x1 = y1 = -np.inf
        for lane in self.gt_lane_poses or []:
            plt.plot(lane[:, 0], lane[:, 1])
            x0, y0 = min(x0, lane[:, 0].min()), min(y0, lane[:, 1].min())
            x1, y1 = max(x1, lane[:, 0].max()), max(y1, lane[:, 1].max())
        if np.isfinite(x0):
            x0, y0 = (x0 // 10) * 10, (y0 // 10) * 10
            x1 = (x1 // 10) * 10 + grid_spacing
            y1 = (y1 // 10) * 10 + grid_spacing
            plt.grid()
            plt.xticks(np.arange(x0, x1, grid_spacing))
            plt.yticks(np.arange(y0, y1, grid_spacing))
        plt.savefig(file_path)
        plt.clf()
        plt.close()
