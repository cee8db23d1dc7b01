"""Fixed-capacity device point buffer + frame painting pipeline.

The reference keeps a Python list of variable-length per-frame clouds and
re-transforms ALL of them into the newest ego frame every step
(sem_pc_accum.py:98-102, :156-183 — the O(frames^2 * points) hot loop). Here
(SURVEY.md section 7 decisions 1-2):

  * state is a slotted (MAX_FRAMES, MAX_PTS, 10) device buffer + validity
    masks; a frame occupies slot ``frame_id % MAX_FRAMES``;
  * points are stored ONCE in a fixed world frame (the first ego frame, as
    the oracle accumulator does at nuscenes_oracle_sem_pc_accum.py:170-186);
    re-expression in the newest ego frame happens only at BEV time as a
    single fused 4x4 transform;
  * memory-horizon eviction (sem_pc_accum.py:185-209) is a window-bound
    update on host — the device read path masks by frame id.

Per-point feature layout is config.PT_* :
  [x, y, z, intensity, r, g, b, sem, inst, dyn]
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.ops import geometry as geo


class BufferState(NamedTuple):
    """Accumulated semantic point cloud in world frame (device arrays)."""
    points: jax.Array      # (F, N, 10) float32
    valid: jax.Array       # (F, N) bool
    frame_ids: jax.Array   # (F,) int32, -1 = empty slot
    inst_dyn: jax.Array    # (MAX_INST,) float32 per-instance dynamic flag


def init_state(max_frames: int, max_points: int,
               max_instances: int) -> BufferState:
    return BufferState(
        points=jnp.zeros((max_frames, max_points, cfg.PT_DIM), jnp.float32),
        valid=jnp.zeros((max_frames, max_points), bool),
        frame_ids=jnp.full((max_frames,), -1, jnp.int32),
        inst_dyn=jnp.zeros((max_instances,), jnp.float32),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_frame(state: BufferState, pts: jax.Array, valid: jax.Array,
                 frame_id: jax.Array) -> BufferState:
    """Write one painted frame into its ring slot. ``pts`` (N,10), ``valid``
    (N,), ``frame_id`` scalar int32."""
    slot = frame_id % state.frame_ids.shape[0]
    return state._replace(
        points=jax.lax.dynamic_update_slice(state.points, pts[None],
                                            (slot, 0, 0)),
        valid=jax.lax.dynamic_update_slice(state.valid, valid[None],
                                           (slot, 0)),
        frame_ids=state.frame_ids.at[slot].set(frame_id),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def set_instance_dyn(state: BufferState, inst_idxs: jax.Array,
                     dyn_flags: jax.Array) -> BufferState:
    """Mark instances dynamic. Replaces the reference's retroactive rewrite
    of past points' dyn column (nuscenes_oracle_sem_pc_accum.py:243-250):
    the effective per-point dyn is resolved at raster time via this table."""
    return state._replace(
        inst_dyn=state.inst_dyn.at[inst_idxs].max(dyn_flags))


def compact_rows(painted, valid, cap_out):
    """Stable-sort valid rows to the front and truncate to ``cap_out``.

    Camera painting keeps ~20-25% of a 360-degree sweep, so compaction
    shrinks the buffer the per-sample raster sweeps by ~4x. Row order
    within the valid set is preserved (stable), though no output statistic
    depends on it. Returns (painted (cap_out, D), valid (cap_out,),
    n_valid scalar) — callers must check n_valid <= cap_out (overflow must
    not silently drop points).
    """
    key = (~valid).astype(jnp.int32)
    cols = tuple(painted[:, i] for i in range(painted.shape[1]))
    sorted_ops = jax.lax.sort((key,) + cols, num_keys=1, is_stable=True)
    out = jnp.stack(sorted_ops[1:], axis=1)[:cap_out]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    valid_out = jnp.arange(cap_out) < n_valid
    return out, valid_out, n_valid


@functools.partial(jax.jit, static_argnames=('cap_out',))
def compact_window(state: BufferState, wmin, cap_out: int):
    """Compact the live-window rows of the ring buffer into one dense
    prefix, once per step, so every per-sample raster sweeps ``cap_out``
    rows instead of F*N (raster cost is ~linear in rows; dead frame slots
    and per-frame padding are pure overhead 16x over on the
    bevs_per_sample fast path, accum/kitti360.step).

    No sort and no per-element gather (XLA scatter/gather run ~1e8 elem/s
    on TPU): each slot's valid rows already form a PREFIX (insert_frame
    stores compact_rows output), so compaction is F sequential
    dynamic_update_slice block copies at HBM copy speed — each live
    slot's full block lands at the running offset, and the next block
    overwrites the previous one's padding tail. Dead slots are parked in
    the [cap_out, cap_out+N) slack so they never touch live rows.

    Returns (points (cap_out, D), frame_ids (cap_out,), valid (cap_out,),
    n_live). Callers MUST check n_live <= cap_out (overflowing rows are
    silently parked in the slack region — correctness requires the raise,
    same contract as compact_rows/painted_cap).
    """
    F, N, D = state.points.shape
    counts = jnp.sum(state.valid, axis=1).astype(jnp.int32)        # (F,)
    live = (state.frame_ids >= wmin) & (state.frame_ids >= 0)      # (F,)
    out_p = jnp.zeros((cap_out + N, D), jnp.float32)
    out_f = jnp.full((cap_out + N,), -1, jnp.int32)

    def body(i, carry):
        out_p, out_f, off = carry
        # Dead slots (and overflow spill) write into the slack region.
        off_w = jnp.where(live[i], jnp.minimum(off, cap_out), cap_out)
        blk = jax.lax.dynamic_slice(state.points, (i, 0, 0), (1, N, D))[0]
        out_p = jax.lax.dynamic_update_slice(out_p, blk, (off_w, 0))
        out_f = jax.lax.dynamic_update_slice(
            out_f, jnp.full((N,), state.frame_ids[i], jnp.int32), (off_w,))
        return out_p, out_f, off + jnp.where(live[i], counts[i], 0)

    out_p, out_f, n_live = jax.lax.fori_loop(
        0, F, body, (out_p, out_f, jnp.int32(0)))
    valid = jnp.arange(cap_out) < n_live
    return out_p[:cap_out], out_f[:cap_out], valid, n_live


@functools.partial(jax.jit, static_argnames=('filters',))
def paint_frame_camera(pc, valid, rgb_img, semseg, P_velo_frame,
                       T_world_velo, filters):
    """Fused paint: project lidar into the camera, gather RGB + semantic
    class, filter classes, transform to world frame.

    Replaces the estimated-sem path of obs2sem_vec_space
    (kitti360_sem_pc_accum.py:129-156): gen_semantic_pc x2
    (sem_pc_accum.py:323-345) + filter_semseg_pc (:317-321) + inst/dyn pad.

    Args:
      pc: (N,4) [x,y,z,intensity] velodyne points (padded).
      valid: (N,) input validity (padding mask).
      rgb_img: (H,W,3) float32 image.
      semseg: (H,W) int32/float32 class-index map.
      P_velo_frame: (3,4) velo->image projection.
      T_world_velo: (4,4) velo->world transform.
      filters: static tuple of semantic class ids to drop.

    Returns (painted (N,10), valid_out (N,)).
    """
    feats = jnp.concatenate([rgb_img, semseg[..., None].astype(jnp.float32)],
                            axis=-1)
    gathered, proj_mask = geo.paint_from_image(pc[:, :3], P_velo_frame, feats)
    sem = gathered[:, 3]
    valid_out = valid & proj_mask & geo.semseg_filter_mask(sem, filters)
    world_xyz = geo.homo_transform(T_world_velo, pc[:, :3])
    zeros = jnp.zeros_like(sem)
    painted = jnp.concatenate([
        world_xyz, pc[:, 3:4], gathered[:, :3], sem[:, None],
        zeros[:, None], zeros[:, None]
    ], axis=1)
    return painted, valid_out


@functools.partial(jax.jit, static_argnames=('filters',))
def paint_frame_multicam(pc, valid, cam_idx, imgs, semsegs, T_world_ego,
                         inst_remap, filters):
    """Paint pre-projected multi-camera points (NuScenes layout).

    Counterpart of the oracle painting loop
    (nuscenes_oracle_sem_pc_accum.py:454-501): nearest-pixel RGB+semantic
    gather per camera (pts_feat_from_img 'nearest',
    nuscenes_utils.py:212-214), invalid/class filtering, intensity /255,
    ego->world transform — all six cameras in one gather instead of a
    Python loop.

    Args:
      pc: (N,7) [x,y,z ego-frame, intensity, u, v, frame_inst_idx(-1=none)].
      valid: (N,) padding mask.
      cam_idx: (N,) int32 camera index per point, -1 = no projection.
      imgs: (C,H,W,3) float32 camera images.
      semsegs: (C,H,W) int32 class maps.
      T_world_ego: (4,4) ego->world.
      inst_remap: (K,) int32 mapping frame_inst_idx+1 -> global instance id
        (0 = untracked; see accum/tracking.InstanceTracker).

    Returns (painted (N,10), valid_out (N,)).
    """
    H, W = imgs.shape[1], imgs.shape[2]
    u = jnp.clip(jnp.round(pc[:, 4]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(pc[:, 5]).astype(jnp.int32), 0, H - 1)
    ci = jnp.clip(cam_idx, 0, imgs.shape[0] - 1)
    rgb = imgs[ci, v, u]
    sem = semsegs[ci, v, u].astype(jnp.float32)
    valid_out = (valid & (cam_idx >= 0)
                 & geo.semseg_filter_mask(sem, filters))
    world_xyz = geo.homo_transform(T_world_ego, pc[:, :3])
    inten = pc[:, 3:4] / 255.0
    fi = jnp.clip(pc[:, 6].astype(jnp.int32) + 1, 0,
                  inst_remap.shape[0] - 1)
    inst = inst_remap[fi].astype(jnp.float32)
    zeros = jnp.zeros_like(sem)
    painted = jnp.concatenate([
        world_xyz, inten, rgb, sem[:, None], inst[:, None], zeros[:, None]
    ], axis=1)
    return painted, valid_out


@functools.partial(jax.jit, static_argnames=('filters',))
def paint_frame_gt(pc, valid, sem_gt, T_world_velo, filters):
    """GT-semantics paint path: zero RGB, keep all (unfiltered) points
    (kitti360_sem_pc_accum.py:138-144)."""
    sem = sem_gt.astype(jnp.float32)
    valid_out = valid & geo.semseg_filter_mask(sem, filters)
    world_xyz = geo.homo_transform(T_world_velo, pc[:, :3])
    zeros = jnp.zeros_like(sem)
    painted = jnp.concatenate([
        world_xyz, pc[:, 3:4], zeros[:, None], zeros[:, None],
        zeros[:, None], sem[:, None], zeros[:, None], zeros[:, None]
    ], axis=1)
    return painted, valid_out
