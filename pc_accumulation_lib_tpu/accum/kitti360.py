"""KITTI-360 accumulator: 1 forward camera + 360-degree lidar, ICP ego-motion.

Counterpart of Kitti360SemanticPointCloudAccumulator
(kitti360_sem_pc_accum.py:8-243). Per-frame device work is fused into three
jitted calls: ICP preprocess+register (ops/icp.py), camera/GT painting
(accum/buffer.py), and the ring-buffer insert. Pose history is kept as a
world-frame chain (see accum/base.py) instead of re-transforming all stored
clouds every frame.
"""
from __future__ import annotations

import threading
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum import buffer
from pc_accumulation_lib_tpu.accum.base import SemanticPointCloudAccumulator
from pc_accumulation_lib_tpu.ops import geometry
from pc_accumulation_lib_tpu.ops import icp as icp_ops


def window_update(seg_ring, ws, T_world, T_world_prev, frame_id, horizon,
                  first):
    """Device mirror of base.remove_observations (sem_pc_accum.py:185-209):
    append this frame's path segment into the ring (slot = global frame id
    mod ring size), then advance the window start past the memory horizon.
    Exact same argmax-over-cumsum formulation as the host code; equivalence
    on random walks is pinned by tests/test_step_pipeline.py.

    Returns (seg_ring, new window_start, pre-eviction path length,
    ring_overflow flag). ring_overflow=1 means THIS frame's ring write
    overwrote a segment still inside the live window (the window reached
    more than R frames, e.g. a stationary stretch longer than max_frames)
    — the eviction sum is then corrupted, so the host raises with the
    right attribution (ring capacity, not a generic buffer overflow).
    Exactness: writing gid=frame_id to slot frame_id%%R destroys stale
    gid frame_id-R, which is inside the pre-write window
    [ws+1, frame_id-1] iff frame_id - ws > R."""
    R = seg_ring.shape[0]
    if first:
        return seg_ring, ws, jnp.float32(0), jnp.float32(0)
    overflow = (frame_id - ws > R).astype(jnp.float32)
    seg = jnp.linalg.norm(T_world[:3, 3] - T_world_prev[:3, 3])
    seg_ring = seg_ring.at[frame_id % R].set(seg)
    # Window segments in global-id order ws+1 .. frame_id.
    gids = ws + 1 + jnp.arange(R)
    segs = jnp.where(gids <= frame_id, seg_ring[gids % R], 0.0)
    path = jnp.sum(segs)
    overshoot = path - horizon
    cond = (jnp.cumsum(segs) - overshoot > 0.) & (gids <= frame_id)
    idx = jnp.where(path > horizon, jnp.argmax(cond).astype(jnp.int32), 0)
    return seg_ring, ws + idx, path, overflow


def pose_params_vec(T_world, T_world_prev, ws, frame_id):
    """(22,) pose-dependent half of bev/core.RasterParams.pack() for the
    'latest-1' present policy (present_idx = len-2): [T_ref_world(16),
    bev_coords(3), window_min, window_max, present_frame].

    Rigid inverse (R^T, -R^T t) instead of a general 4x4 inverse, at
    precision=HIGHEST: the TPU's default matmul precision truncates to
    ~bf16, which at |t| ~ 100 m of travelled world translation would
    shift the BEV reference by ~0.4 m (> 1 pixel at 80 m / 256 px) away
    from the host-f64 trajectory overlays (CLAUDE.md precision gotcha)."""
    R, t = T_world[:3, :3], T_world[:3, 3]
    hp = jax.lax.Precision.HIGHEST
    Rt_t = jnp.matmul(R.T, t, precision=hp)
    T_ref = jnp.zeros((4, 4), jnp.float32)
    T_ref = T_ref.at[:3, :3].set(R.T)
    T_ref = T_ref.at[:3, 3].set(-Rt_t)
    T_ref = T_ref.at[3, 3].set(1.0)
    bev_coords = jnp.matmul(R.T, T_world_prev[:3, 3] - t, precision=hp)
    f = frame_id.astype(jnp.float32)
    return jnp.concatenate([
        T_ref.reshape(-1), bev_coords,
        jnp.stack([ws.astype(jnp.float32), f, f - 1.0])])


class DeviceObs(NamedTuple):
    """A pre-uploaded observation (see ``upload_obs``).

    ``aux`` is the device camera image (estimated-sem path) or the padded
    per-point GT label vector (``use_gt_sem``); ``rgb_host`` keeps the host
    image reference for the accumulator's frame bookkeeping
    (get_rgb parity, sem_pc_accum.py:267-271)."""
    rgb_host: object
    pc_pad: object
    valid: object
    aux: object


class Kitti360SemanticPointCloudAccumulator(SemanticPointCloudAccumulator):

    bev_ref_frame = 'latest'

    def __init__(self, horizon_dist: float, calib_params: dict,
                 icp_threshold: float, semseg_model=None,
                 semseg_filters=cfg.DEFAULT_SEMSEG_FILTERS,
                 sem_idxs: Optional[dict] = None, use_gt_sem: bool = False,
                 bev_params: Optional[dict] = None,
                 accum_cfg: Optional[cfg.AccumConfig] = None,
                 icp_cfg: Optional[cfg.ICPConfig] = None,
                 seed: Optional[int] = None,
                 transfer_dtype: str = 'float32',
                 img_transfer: Optional[str] = None):
        """Args mirror the reference constructor
        (kitti360_sem_pc_accum.py:9-39); ``semseg_model`` is any callable
        rgb(H,W,3)->class-map(H,W) (e.g. models.semseg.SemSegTPU) instead of
        an ONNX path.

        ``transfer_dtype='quantized'`` uploads point clouds packed at
        7 B/point (xyz as 5 mm fixed-point int16, intensity as uint8 at
        the same x200 scale — identical quantized values, one byte less)
        and images as uint8 (~2.9x fewer host->device bytes than float32;
        matters on remote-TPU links), dequantized on device.

        ``img_transfer='yuv420'`` additionally ships the camera image as
        YUV 4:2:0 (1.5 B/px vs u8 RGB's 3 — the image is ~65% of the
        per-frame upload), decoded to RGB on device before semseg+paint;
        lossy by chroma quantization only (ops/imgcodec.py; grayscale is
        bit-exact). Default follows transfer_dtype: 'rgb8'."""
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
        if self.icp_cfg.coarse_to_fine:
            self._icp_reg = icp_ops.make_coarse_to_fine_register_fn(
                self.icp_cfg.num_iters,
                coarse_factor=self.icp_cfg.coarse_factor)
        else:
            self._icp_reg = icp_ops.make_register_fn(self.icp_cfg.num_iters)
        self._icp_prev_cloud = None
        self._T_world_velo_last = np.eye(4)
        self._T_new_prev_last = np.eye(4)
        self._T_world_dev = None     # device-side pose chain (see common())
        self._T_new_prev_dev = None
        # Device-side eviction-window state: seg_ring[g % F] = path segment
        # ending at global frame g; window_start scalar. The horizon logic
        # of base.remove_observations (sem_pc_accum.py:185-209) runs INSIDE
        # the fused step so BEV dispatch never waits on a host pose fetch
        # (see step()); host bookkeeping mirrors it at fetch time.
        self._seg_ring_dev = None
        self._ws_dev = None
        self._pose_vec_dev = None    # (22,) pose-dependent raster params
        self.max_live_rows = 0       # compact_window telemetry (step())
        self.upload_bytes_total = 0  # host->device obs wire telemetry
        self.upload_frames = 0       # (see upload_obs; bench bev1 floor)
        # Compact-rung ladder state (config.AccumConfig.compact_rungs):
        # _live_ub is a host-side UPPER BOUND on live buffer rows —
        # incremented by painted_cap per dispatched frame (live rows can
        # grow by at most that), tightened one step behind when step()'s
        # lazy n_live fetch lands. _cum_growth timestamps the bound so the
        # tightening accounts for frames dispatched since.
        self._live_ub = 0
        self._cum_growth = 0
        self._ub_lock = threading.Lock()   # dispatch (main thread) vs
        # finalize (drain worker) both update the bound
        self._rungs = None
        self.rungs_used = {}         # rung -> step count (telemetry)
        if self.accum_cfg.compact_cap and self.accum_cfg.compact_rungs:
            ccap = self.accum_cfg.compact_cap
            rungs = sorted(set(int(r) for r in
                               self.accum_cfg.compact_rungs if r < ccap))
            if any(r <= 0 for r in rungs):
                raise ValueError('compact_rungs must be positive')
            self._rungs = tuple(rungs) + (ccap,)
        self.transfer_dtype = transfer_dtype
        if img_transfer not in (None, 'rgb8', 'yuv420', 'yuv420h'):
            raise ValueError(f'img_transfer={img_transfer!r}')
        self.img_transfer = img_transfer or 'rgb8'
        self._fused = self._build_fused_step()

    def _build_fused_step(self):
        """One jitted device call per frame: ICP preprocess + register +
        pose-chain compose + semseg + paint + compact + ring insert.

        The reference's per-frame path crosses the host/device boundary
        once per stage (ONNX session, Open3D calls, numpy transforms);
        fusing matters doubly here because each dispatch-with-fetch costs
        ~33 ms over the remote-TPU tunnel. Returns a packed (37,) array
        [T_world_velo(16), T_new_prev(16), n_painted, icp_n_corr,
        window_start, path_len, ring_overflow] so the host needs exactly
        ONE fetch per frame (fetch() consumes indices 32-36).
        """
        cap = self.accum_cfg.painted_cap
        filters = self.semseg_filters
        model = self.semseg_model
        P_velo_frame = jnp.asarray(self.P_velo_frame)
        max_corr = jnp.float32(self.icp_cfg.max_corr_dist)
        horizon = jnp.float32(self.horizon_dist)

        n_cap = self.accum_cfg.max_points_per_frame

        def dequant(pc_pad):
            if pc_pad.dtype == jnp.uint8:
                # Packed quantized transfer (7 B/point): xyz as 5 mm i16
                # bytes, intensity as u8 at the SAME x200 scale (it is
                # [0,1], so u8 holds the identical quantized values the
                # old i16 column did — one byte less per point on the
                # tunnel, bit-identical decode).
                xyz = jax.lax.bitcast_convert_type(
                    pc_pad[:6 * n_cap].reshape(n_cap, 3, 2), jnp.int16)
                inten = pc_pad[6 * n_cap:]
                return jnp.concatenate(
                    [xyz.astype(jnp.float32), inten.astype(jnp.float32)
                     [:, None]], axis=1) * (1.0 / 200.0)
            if pc_pad.dtype == jnp.int16:   # legacy quantized (8 B/point)
                return pc_pad.astype(jnp.float32) * (1.0 / 200.0)
            return pc_pad

        warm = self.icp_cfg.warm_start

        def common(state, prev_cloud, T_world_prev, T_init, seg_ring, ws,
                   pc_pad, valid, frame_id, first, painted_fn):
            new_cloud = self._icp_pre(pc_pad[:, :3], valid)
            if first:
                T_new_prev = jnp.eye(4, dtype=jnp.float32)
                n_corr = jnp.float32(0)
            else:
                init = T_init if warm else jnp.eye(4, dtype=jnp.float32)
                T_new_prev, _, n_corr = self._icp_reg(
                    prev_cloud, new_cloud, init, max_corr)
            T_world = jnp.matmul(
                T_world_prev,
                geometry.rigid_inverse(T_new_prev.astype(jnp.float32)),
                precision=jax.lax.Precision.HIGHEST)
            painted, valid_out = painted_fn(T_world)
            painted, valid_out, n_valid = buffer.compact_rows(
                painted, valid_out, cap)
            state = buffer.insert_frame(state, painted, valid_out, frame_id)
            seg_ring, ws_new, path, ring_ovf = window_update(
                seg_ring, ws, T_world, T_world_prev, frame_id, horizon,
                first)
            pose_vec = pose_params_vec(T_world, T_world_prev, ws_new,
                                       frame_id)
            packed = jnp.concatenate([
                T_world.reshape(-1), T_new_prev.reshape(-1),
                jnp.stack([n_valid.astype(jnp.float32), n_corr,
                           ws_new.astype(jnp.float32), path, ring_ovf])])
            # T_world / T_new_prev / window state / pose_vec returned as
            # device arrays: the pose chain AND the BEV raster params thread
            # device->device between frames, so dispatching frame k+1's
            # integrate or frame k's rasters never waits on a host fetch
            # (the packed vector is fetched lazily for bookkeeping only).
            return (state, new_cloud, packed, T_world, T_new_prev, seg_ring,
                    ws_new, pose_vec)

        def camera_step(state, prev_cloud, T_world_prev, T_init, seg_ring,
                        ws, variables, pc_pad, valid, rgb_img, frame_id,
                        first):
            pc_pad = dequant(pc_pad)
            if isinstance(rgb_img, tuple):  # yuv420/yuv420h wire
                from pc_accumulation_lib_tpu.ops import imgcodec
                rgb_img = imgcodec.decode_wire(rgb_img)
            elif rgb_img.dtype == jnp.uint8:  # quantized transfer
                rgb_img = rgb_img.astype(jnp.float32)

            def painted_fn(T_world):
                logits = model.model.apply(variables, rgb_img[None],
                                           train=False)
                semseg = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)
                return buffer.paint_frame_camera(
                    pc_pad, valid, rgb_img, semseg, P_velo_frame, T_world,
                    filters)
            return common(state, prev_cloud, T_world_prev, T_init, seg_ring,
                          ws, pc_pad, valid, frame_id, first, painted_fn)

        def gt_step(state, prev_cloud, T_world_prev, T_init, seg_ring, ws,
                    pc_pad, valid, sem_gt, frame_id, first):
            pc_pad = dequant(pc_pad)

            def painted_fn(T_world):
                return buffer.paint_frame_gt(pc_pad, valid, sem_gt, T_world,
                                             filters)
            return common(state, prev_cloud, T_world_prev, T_init, seg_ring,
                          ws, pc_pad, valid, frame_id, first, painted_fn)

        if self.use_gt_sem or model is None:
            return jax.jit(gt_step, static_argnames=('first',),
                           donate_argnums=(0,))
        return jax.jit(camera_step, static_argnames=('first',),
                       donate_argnums=(0,))

    def _pad_pc(self, pc: np.ndarray):
        n_cap = self.accum_cfg.max_points_per_frame
        n = pc.shape[0]
        if n > n_cap:
            raise RuntimeError(
                f'Frame has {n} points > max_points_per_frame={n_cap}; '
                'raise AccumConfig.max_points_per_frame.')
        if self.transfer_dtype == 'quantized':
            # Packed 7 B/point: xyz as 5 mm i16, intensity as u8 at the
            # same x200 scale ([0,1] range -> 0..200 fits u8 exactly, so
            # the decode is bit-identical to the old (N,4) i16 column at
            # 12.5% fewer upload bytes). Inverse: dequant() in the fused
            # integrate.
            xyz = np.zeros((n_cap, 3), np.int16)
            xyz_scaled = np.round(pc[:, :3] * 200.0)
            if n and (xyz_scaled.min() < -32768 or xyz_scaled.max() > 32767):
                # i16 covers +-163.84 m at the 5 mm scale (KITTI lidar
                # tops out well under 120 m in the sensor frame). Points
                # beyond that must fail loudly, not silently clamp to the
                # boundary — use transfer_dtype='float32' for such data.
                raise ValueError(
                    f'quantized upload: coordinate range '
                    f'[{pc[:, :3].min():.4g}, {pc[:, :3].max():.4g}] m '
                    f'outside the i16-representable +-163.84 m')
            xyz[:n] = xyz_scaled
            inten = np.zeros(n_cap, np.uint8)
            scaled = np.round(pc[:n, 3] * 200.0)
            if n and (scaled.min() < 0 or scaled.max() > 255):
                # u8 covers intensity in [0, 1.275] at the x200 scale
                # (KITTI remission is [0,1]). A dataset with unnormalized
                # remission must fail loudly, not silently clamp —
                # use transfer_dtype='float32' for such data.
                raise ValueError(
                    f'quantized upload: intensity range '
                    f'[{pc[:n, 3].min():.4g}, {pc[:n, 3].max():.4g}] '
                    f'outside the u8-representable [0, 1.275]')
            inten[:n] = scaled
            out = np.concatenate([xyz.view(np.uint8).reshape(-1), inten])
        else:
            out = np.zeros((n_cap, pc.shape[1]), np.float32)
            out[:n] = pc
        valid = np.arange(n_cap) < n
        return jnp.asarray(out), jnp.asarray(valid)

    def _prep_rgb(self, rgb):
        arr = np.asarray(rgb)[..., :3]
        if self.img_transfer in ('yuv420', 'yuv420h'):
            from pc_accumulation_lib_tpu.ops import imgcodec
            enc = imgcodec.encode_wire(arr.astype(np.uint8),
                                       self.img_transfer)
            return tuple(jnp.asarray(p) for p in enc)
        if self.transfer_dtype == 'quantized':
            return jnp.asarray(arr.astype(np.uint8))
        return jnp.asarray(arr.astype(np.float32))

    def integrate(self, observations: list, async_fetch: bool = False):
        """Integrate observations [(rgb, pc, sem_gt), ...] — or pre-uploaded
        ``DeviceObs`` from ``upload_obs`` — (kitti360_sem_pc_accum.py:41-88).
        Returns number of evicted frames.

        All frames are dispatched to the device back-to-back (the pose
        chain threads device-side, so no dispatch waits on a host fetch).
        With ``async_fetch=True`` the per-frame bookkeeping fetch is
        deferred: returns a zero-arg callable yielding num_removed, letting
        the caller overlap a pending transfer with this integrate's
        compute."""
        handles = [self._dispatch_obs(obs) for obs in observations]

        def finalize() -> int:
            num_removed = 0
            for h in handles:
                _, _, idx, path_length = h()
                num_removed += idx
                if len(self.poses) > 1:
                    print(f'    #pc {len(self.poses)} |',
                          f'path length {path_length:.2f}')
            return num_removed

        return finalize if async_fetch else finalize()

    def upload_obs(self, obs) -> DeviceObs:
        """Start the host->device upload of one observation and return a
        ``DeviceObs`` that ``integrate``/``step`` accept in place of the raw
        (rgb, pc, sem_gt) tuple.

        The upload is the single largest host->device transfer of the
        per-frame path (~2.5 MB at full camera resolution: u8 image +
        7 B/point packed cloud) and on a remote-TPU link it bounds the
        ``bev_num=1`` operating point. Calling this on a worker thread for
        frame i+1 while frame i's step computes overlaps the wire time with
        device compute (the reverse of the fetch-side pipeline)."""
        if isinstance(obs, DeviceObs):
            return obs
        rgb, pc, sem_gt = obs
        pc = np.asarray(pc, np.float32)
        pc_pad, valid = self._pad_pc(pc)
        if self.use_gt_sem or self.semseg_model is None:
            sem_flat = np.zeros(self.accum_cfg.max_points_per_frame,
                                np.float32)
            sem_flat[:pc.shape[0]] = np.asarray(sem_gt).reshape(-1)
            aux = jnp.asarray(sem_flat)
        else:
            aux = self._prep_rgb(rgb)
        # Wire telemetry: the bool validity vector ships as one byte per
        # element; everything else is its device dtype's width. bench.py
        # divides this by frames to print the measured upload floor next
        # to the bev_num=1 line (the upload bounds that operating point).
        nb = int(pc_pad.nbytes) + int(valid.nbytes)
        nb += (sum(int(a.nbytes) for a in aux) if isinstance(aux, tuple)
               else int(aux.nbytes))
        self.upload_bytes_total += nb
        self.upload_frames += 1
        return DeviceObs(rgb, pc_pad, valid, aux)

    def _dispatch_obs(self, obs):
        """Dispatch one observation's fused device step; returns a zero-arg
        bookkeeping closure that performs the (lazy, async-copied) host
        fetch of the packed pose/count vector. ``obs`` may be a raw
        (rgb, pc, sem_gt) tuple or a pre-uploaded ``DeviceObs``."""
        rgb, pc_pad, valid, aux = self.upload_obs(obs)
        first = self._icp_prev_cloud is None
        prev_cloud = self._icp_prev_cloud
        if first:
            # Placeholder with matching shapes for the jitted signature.
            prev_cloud = icp_ops.ICPCloud(
                points=jnp.zeros((self.icp_cfg.max_downsampled, 3)),
                normals=jnp.zeros((self.icp_cfg.max_downsampled, 3)),
                valid=jnp.zeros((self.icp_cfg.max_downsampled,), bool))
            self._T_world_dev = jnp.asarray(self._T_world_velo_last,
                                            jnp.float32)
            self._T_new_prev_dev = jnp.asarray(self._T_new_prev_last,
                                               jnp.float32)
            self._seg_ring_dev = jnp.zeros((self.accum_cfg.max_frames,),
                                           jnp.float32)
            self._ws_dev = jnp.int32(self.window_start)
        fid = jnp.int32(self.frame_count)

        if self.use_gt_sem or self.semseg_model is None:
            out = self._fused(
                self.state, prev_cloud, self._T_world_dev,
                self._T_new_prev_dev, self._seg_ring_dev, self._ws_dev,
                pc_pad, valid, aux, fid, first)
        else:
            out = self._fused(
                self.state, prev_cloud, self._T_world_dev,
                self._T_new_prev_dev, self._seg_ring_dev, self._ws_dev,
                self.semseg_model.variables, pc_pad, valid, aux, fid,
                first)
        (state, new_cloud, packed, t_w, t_np, seg_ring, ws_new,
         pose_vec) = out

        self.state = state
        self._icp_prev_cloud = new_cloud
        self._T_world_dev = t_w
        self._T_new_prev_dev = t_np
        self._seg_ring_dev = seg_ring
        self._ws_dev = ws_new
        self._pose_vec_dev = pose_vec
        # Reserve the frame id now (dispatch order); meta appended at fetch.
        self.frame_count += 1
        # Rung-ladder growth bound: this frame adds at most painted_cap
        # live rows (compact_rows caps the insert); eviction only shrinks.
        cap_g = self.accum_cfg.painted_cap
        ring_max = self.accum_cfg.max_frames * cap_g
        with self._ub_lock:
            self._live_ub = min(self._live_ub + cap_g, ring_max)
            self._cum_growth += cap_g
        try:
            packed.copy_to_host_async()
        except Exception:
            pass

        def fetch():
            vec = np.asarray(packed, np.float64)
            T_world_velo = vec[:16].reshape(4, 4)
            T_new_prev = vec[16:32].reshape(4, 4)
            n_painted = int(vec[32])
            if n_painted > self.accum_cfg.painted_cap:
                raise RuntimeError(
                    f'Painted-point overflow: frame produced {n_painted} > '
                    f'cap {self.accum_cfg.painted_cap}; raise '
                    'AccumConfig.max_painted_points_per_frame (points must '
                    'not be silently dropped).')
            if vec[36] != 0.0:
                raise RuntimeError(
                    'Eviction-ring overflow: the live memory-horizon window '
                    f'spans more than max_frames={self.accum_cfg.max_frames} '
                    'frames (e.g. a stationary stretch), so the device '
                    'seg_ring would wrap and drop path segments. Raise '
                    'AccumConfig.max_frames to cover horizon_dist at the '
                    'slowest expected speed.')
            self._T_world_velo_last = T_world_velo
            self._T_new_prev_last = T_new_prev
            self._append_frame_meta(T_world_velo, rgb, None,
                                    count_frame=False)
            # Mirror the device eviction (window_update in the fused step):
            # trim host bookkeeping to the device-computed window.
            if len(self.poses) > 1:
                self.seg_dists.append(self.dist(
                    np.array(self.poses[-1]), np.array(self.poses[-2])))
            idx = int(vec[34]) - self.window_start
            path_length = float(vec[35])
            if idx > 0:
                self.poses = self.poses[idx:]
                self.seg_dists = self.seg_dists[idx:]
                self.T_world_velo = self.T_world_velo[idx:]
                self.rgbs = self.rgbs[idx:]
                self.semsegs = self.semsegs[idx:]
                self.window_start += idx
            return T_world_velo, T_new_prev, idx, path_length

        return fetch

    def step(self, observations: list, bev_num: int = 1,
             gen_future: bool = True, async_fetch: bool = False):
        """Fully pipelined integrate + BEV sampling at the 'latest-1'
        present policy (present_idx = len(poses)-2, the bench/run-script
        sampling point, run_kitti360_bev_gen.py:218-240).

        Unlike integrate() + generate_bev(), ALL device work — ICP, semseg,
        paint, insert, eviction-window update, and ``bev_num`` augmented
        rasters — is dispatched without a single host fetch: the raster's
        pose-dependent parameters (T_ref_world, bev_coords, window) come
        from the device pose chain (pose_params_vec in the fused step).
        The host pose fetch and the stack fetches all happen inside the
        returned finalize, so a caller thread can overlap them with the
        next step's compute. Returns the BEV dict list (or a zero-arg
        callable yielding it when ``async_fetch``).
        """
        gen = self.sem_bev_generator
        if not gen.do_aug:
            # The no-aug rotation is heading-aligned and needs host poses
            # at dispatch time (ADVICE r2 #2) — fall back to the classic
            # (unpipelined but equivalent) path instead of silently
            # producing differently-oriented BEVs.
            integrate_fn = self.integrate(observations, async_fetch=True)

            def finalize_classic():
                integrate_fn()
                return self.generate_bev(present_idx=len(self.poses) - 2,
                                         bev_num=bev_num,
                                         gen_future=gen_future)

            return finalize_classic if async_fetch else finalize_classic()
        # Exact-size the PREVIOUS step's sparse fetches first: the device
        # queue is empty right now, so their value slices run (and the
        # copies start) ahead of everything this step enqueues
        # (bev/sem_bev.resolve_ready_fetches; non-blocking).
        gen.resolve_ready_fetches()
        handles = [self._dispatch_obs(obs) for obs in observations]
        pose_vec = self._pose_vec_dev
        ccap = self.accum_cfg.compact_cap
        n_live = None
        cum_at_dispatch = self._cum_growth
        if ccap:
            # Once-per-step live-window compaction: every per-sample raster
            # below sweeps ccap rows instead of max_frames * painted_cap
            # (raster cost ~13 ms per M rows on v5e — dead slots and
            # per-frame padding are pure overhead x bev_num). With a rung
            # ladder, sweep the smallest rung the host-side growth bound
            # proves sufficient (bit-identical outputs; _live_ub already
            # includes this step's dispatches above).
            if self._rungs is not None:
                ub = min(self._live_ub, ccap)
                ax = (gen._mesh.shape['points'] if gen._mesh is not None
                      else 1)
                ccap = next((r for r in self._rungs
                             if r >= ub and r % ax == 0),
                            self.accum_cfg.compact_cap)
                self.rungs_used[ccap] = self.rungs_used.get(ccap, 0) + 1
            flat_pts, pt_fids, flat_valid, n_live = buffer.compact_window(
                self.state, self._ws_dev, ccap)
            try:
                n_live.copy_to_host_async()
            except Exception:
                pass
        else:
            f, n, d = self.state.points.shape
            flat_pts = self.state.points.reshape(f * n, d)
            flat_valid = self.state.valid.reshape(f * n)
            pt_fids = jnp.repeat(self.state.frame_ids, n)
        inst_dyn = self.state.inst_dyn
        if gen._mesh is not None:
            # Point-sharded mesh raster: lay the flat buffer out over the
            # 'points' axis ONCE per step (the integrate state machine
            # stays on its single device; only this snapshot crosses ICI)
            # — otherwise each of the bev_num raster dispatches would
            # re-lay-out the same ~tens-of-MB buffer. pose_vec/inst_dyn
            # replicate (tiny).
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            from pc_accumulation_lib_tpu.parallel.sharded import (
                shard_points_to_mesh)
            ax = gen._mesh.shape['points']
            if flat_pts.shape[0] % ax:
                raise ValueError(
                    f'step() on a mesh: flat point count {flat_pts.shape[0]}'
                    f' must be divisible by the points-axis size {ax} — '
                    'size AccumConfig.compact_cap (or max_frames * '
                    'painted_cap) to a multiple of the mesh points axis.')
            flat_pts, flat_valid, pt_fids = shard_points_to_mesh(
                gen._mesh, flat_pts, flat_valid, pt_fids)
            rep = NamedSharding(gen._mesh, P())
            pose_vec = jax.device_put(pose_vec, rep)
            inst_dyn = jax.device_put(inst_dyn, rep)
        prepped = None
        if gen._prepped_ok:
            # Hoist the aug-invariant per-point raster work (world->ref
            # transform, class masks, dyn partition, packed sort payloads)
            # to ONCE per step instead of once per augmented sample
            # (bev/core.make_prep_fn).
            prepped = gen.prep_points(flat_pts, self.state.inst_dyn,
                                      pose_vec)

        def trajs_fn():
            # Runs inside finalize, after the integrate fetch has synced
            # host poses/window for exactly this step.
            pi = len(self.poses) - 2
            T_ref_world = self._ref_transform()
            poses_ref = self._poses_ref(T_ref_world)
            bev_coords = poses_ref[pi]
            trajs = {'ego_traj_present': poses_ref[:pi] - bev_coords,
                     'other_trajs_present': []}
            if gen_future:
                trajs['ego_traj_future'] = poses_ref[pi:] - bev_coords
                trajs['ego_traj_full'] = poses_ref - bev_coords
                trajs['other_trajs_future'] = []
                trajs['other_trajs_full'] = []
            return trajs

        bev_handle = gen.generate_samples_device(
            flat_pts, flat_valid, pt_fids, inst_dyn, pose_vec,
            bev_num, gen_future, trajs_fn, prepped=prepped)

        def finalize():
            for h in handles:
                _, _, _, path_length = h()
                if len(self.poses) > 1:
                    print(f'    #pc {len(self.poses)} |',
                          f'path length {path_length:.2f}')
            if n_live is not None:
                nl = int(np.asarray(n_live))
                self.max_live_rows = max(self.max_live_rows, nl)
                if nl > ccap:
                    raise RuntimeError(
                        f'Live-window overflow: {nl} live buffer rows > '
                        f'the swept capacity {ccap} (compact_cap='
                        f'{self.accum_cfg.compact_cap}); raise '
                        'AccumConfig.compact_cap (points must not be '
                        'silently dropped).')
                # Tighten the rung-ladder growth bound: nl is exact for
                # the state as of this step's dispatch; frames dispatched
                # since add at most painted_cap each.
                with self._ub_lock:
                    self._live_ub = min(
                        self._live_ub,
                        nl + (self._cum_growth - cum_at_dispatch))
            return bev_handle()

        return finalize if async_fetch else finalize()

    def prewarm_rungs(self, fetch_group: Optional[int] = None,
                      gen_future: bool = True,
                      include_single: bool = True):
        """Compile (or load from the persistent compile cache) every
        compact-rung variant of the step() device pipeline — compact_window,
        the aug-invariant prep, the grouped raster scan, and (with
        ``include_single``) the single-sample raster used by bev_num=1.

        Call once during warmup: without it, each mid-run rung crossing
        pays a compile or a ~0.4 s executable load through a remote-TPU
        tunnel inside the steady-state loop. All pieces are pure — state
        and fetch bookkeeping are untouched; outputs are discarded after a
        tiny tail fetch that drains the (in-order) device queue."""
        gen = self.sem_bev_generator
        if (self._rungs is None or self._pose_vec_dev is None
                or gen._mesh is not None or not gen._prepped_ok):
            return
        G = max(1, fetch_group if fetch_group is not None
                else gen.fetch_group)
        hf = (np.inf if gen.height_filter is None else gen.height_filter)
        aug = np.zeros((G, 9), np.float32)
        aug[:, 3] = 1.0                      # identity zoom
        aug[:, 5] = 1.0                      # warp a2=1 (identity-ish)
        aug[:, 7] = 1.0                      # warp b2=1
        aug[:, 8] = hf
        gfn = gen._get_prepped_raster_group()
        sfn = gen._get_prepped_raster() if include_single else None
        last = None
        for rung in self._rungs:
            pts, fids, valid, _ = buffer.compact_window(
                self.state, self._ws_dev, rung)
            ref, packed, packed2 = gen.prep_points(
                pts, self.state.inst_dyn, self._pose_vec_dev)
            out = gfn(ref, valid, fids, packed, packed2,
                      self._pose_vec_dev, jnp.asarray(aug), gen_future)
            last = out[0] if isinstance(out, tuple) else out
            if sfn is not None:
                o = sfn(ref, valid, fids, packed, packed2,
                        (self._pose_vec_dev, jnp.asarray(aug[0])),
                        gen_future)
                last = o[0] if isinstance(o, tuple) else o
        if last is not None:
            np.asarray(jnp.sum(last))        # drain the in-order queue

    def obs2sem_vec_space(self, rgb, pc: np.ndarray,
                          sem_gt: Optional[np.ndarray] = None):
        """Paint one observation into the world-frame buffer
        (kitti360_sem_pc_accum.py:90-164) via the fused device step.

        Ego-motion: point-to-plane ICP vs previous frame
        (kitti360_sem_pc_accum.py:114-127). T_new_prev maps prev-ego ->
        new-ego coords; world chain T_w_k = T_w_{k-1} @ inv(T_new_prev).
        """
        fetch = self._dispatch_obs((rgb, pc, sem_gt))
        _, T_new_prev, _, _ = fetch()
        return None, self.poses[-1], None, T_new_prev
