"""Point-sharded multi-chip BEV rasterization.

TPU-native analogue of the reference's "long context" problem: the
accumulated cloud (~10^7 points over a 200 m horizon) is the big axis.
Design (SURVEY.md section 5): shard the flat point buffer across devices on
the 'points' mesh axis, rasterize per-shard partial accumulators locally,
then combine the (P,P) partials over ICI — psum for counts/sums/histograms,
pmin for elevation. Only rasters cross the interconnect, never points.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.bev import core as bev_core
from pc_accumulation_lib_tpu.ops import geometry as geo
from pc_accumulation_lib_tpu.ops import rasterize as ras
from pc_accumulation_lib_tpu.ops import warp as warp_ops


def make_sharded_raster_fn(mesh: Mesh, view_size, pixel_size, sem_idxs,
                           int_scaler, int_sep_scaler, int_mid_threshold,
                           rgb_fill=0, points_axis: str = 'points',
                           pack=None, sparse_cap=None):
    """Build a jitted shard_map raster over ``mesh``.

    fn(points (M,10), valid (M,), pt_frame_ids (M,), inst_dyn (K,),
       params (RasterParams or packed vector), gen_future: static bool)
    -> replicated packed f16 channel stack — same contract as
    bev/core.make_raster_fn (unpack with bev_core.unpack_maps). M must be
    divisible by the points-axis size.

    ``pack='sparse'``: same fast transfer encoding as the single-chip
    raster — after the psum/pmin combine the per-split maps are
    replicated, so each device packs the identical (sparse_u8, dense_u8)
    pair (bev_core.sparse_outputs; host decode unchanged): a multi-chip
    BEV run ships occupied cells only instead of dense f16 stacks.
    Sparse outputs are PRE-warp, exactly like the single-chip contract.

    ``params`` may also be a (pose_vec (22,), aug9 (9,)) tuple — the same
    device-pose form the single-chip raster takes (bev/core.make_raster_fn):
    the concat happens inside the jit, so the accumulator's zero-host-sync
    step() pipeline (accum/kitti360.step -> generate_samples_device) can
    drive the mesh raster without fetching the pose chain.
    """
    if pack == 'sparse' and sparse_cap is None:
        sparse_cap = bev_core.default_sparse_cap(pixel_size)
    body = _make_shard_body(view_size, pixel_size, sem_idxs, int_scaler,
                            int_sep_scaler, int_mid_threshold, rgb_fill,
                            points_axis, pack=pack, sparse_cap=sparse_cap)

    pt_spec = P(points_axis)
    rep_spec = P()

    def build(gen_future, split_params=False):
        f = functools.partial(body, gen_future=gen_future)
        out_spec = (rep_spec, rep_spec) if pack == 'sparse' else rep_spec
        sm = jax.shard_map(
            f, mesh=mesh,
            in_specs=(pt_spec, pt_spec, pt_spec, rep_spec, rep_spec),
            out_specs=out_spec)
        if not split_params:
            return sm

        def with_pose_vec(points, valid, fids, inst_dyn, pose_vec, aug9):
            packed = jnp.concatenate(
                [pose_vec, jnp.asarray(aug9, jnp.float32)])
            return sm(points, valid, fids, inst_dyn, packed)

        return with_pose_vec

    fns = {True: jax.jit(build(True)), False: jax.jit(build(False))}
    tfns = {True: jax.jit(build(True, True)),
            False: jax.jit(build(False, True))}

    def raster(points, valid, pt_frame_ids, inst_dyn, params, gen_future):
        if isinstance(params, bev_core.RasterParams):   # NamedTuple first:
            packed = params.pack()                      # it IS a tuple
        elif isinstance(params, tuple):
            pose_vec, aug9 = params
            return tfns[bool(gen_future)](
                points, valid, pt_frame_ids, inst_dyn, pose_vec,
                jnp.asarray(aug9, jnp.float32))
        else:
            packed = params
        return fns[bool(gen_future)](points, valid, pt_frame_ids, inst_dyn,
                                     jnp.asarray(packed))

    return raster


def _make_shard_body(view_size, pixel_size, sem_idxs, int_scaler,
                     int_sep_scaler, int_mid_threshold, rgb_fill,
                     points_axis, pack=None, sparse_cap=None):
    """Per-shard raster pipeline closing over the static BEV config; the
    psum/pmin partial combination binds ``points_axis`` only, so the body
    works replicated (make_sharded_raster_fn) or vmapped over a stream
    axis (make_multistream_raster_fn)."""
    Px = pixel_size
    sem_idxs = dict(sem_idxs)

    def shard_body(points, valid, pt_frame_ids, inst_dyn, packed,
                   gen_future):
        # --- local (per-shard) pipeline: identical math to bev/core ---
        params = bev_core.unpack_params(packed)
        xyz = points[:, :3]
        ref = geo.homo_transform(params.T_ref_world, xyz) - params.bev_coords
        t = geo.geometric_transform(ref, params.rot_ang, params.trans_dx,
                                    params.trans_dy)
        aug_view = params.zoom * view_size
        in_window = ((pt_frame_ids >= params.window_min)
                     & (pt_frame_ids <= params.window_max))
        m = valid & in_window & geo.crop_view_mask(t, aug_view)
        m &= t[:, 2] < params.height_thresh
        grid = geo.pos2grid(t[:, :2], aug_view, Px)
        cells = jnp.clip(geo.grid_cell_index(grid[:, 0], grid[:, 1], Px), 0,
                         Px * Px - 1)
        inst = jnp.clip(points[:, cfg.PT_INST].astype(jnp.int32), 0,
                        inst_dyn.shape[0] - 1)
        dyn_eff = jnp.maximum(points[:, cfg.PT_DYN], inst_dyn[inst])
        static_m = m & (dyn_eff != 1.0)
        present_m = pt_frame_ids < params.present_frame
        z, inten = t[:, 2], points[:, cfg.PT_I]
        rgb, sem = points[:, cfg.PT_R:cfg.PT_B + 1], points[:, cfg.PT_SEM]

        splits = {'present': static_m & present_m}
        if gen_future:
            splits['future'] = static_m & ~present_m
            splits['full'] = static_m

        stack, counts = [], []
        for name, split_mask in splits.items():
            acc = ras.split_accumulators(cells, split_mask, z, inten, rgb,
                                         sem, sem_idxs, Px)
            # --- combine partial accumulators over ICI ---
            acc = {
                k: (jax.lax.pmin(v, points_axis) if k == 'z_min'
                    else jax.lax.psum(v, points_axis))
                for k, v in acc.items()
            }
            ch = ras.finalize_split(acc, Px, rgb_fill=rgb_fill)
            stack += [ch['road'], ch['intensity'], ch['rgb'][0],
                      ch['rgb'][1], ch['rgb'][2], ch['dynamic'],
                      ch['elevation']]
            counts.append(acc['c_road'] + acc['c_not_road'])
        maps = jnp.stack(stack)
        if pack != 'sparse':
            # Dense mode warps on device; sparse ships PRE-warp maps (the
            # host applies the warp after decode — bev/core contract).
            maps = warp_ops.warp_dense_maps(maps, params.warp_a1,
                                            params.warp_a2, params.warp_b1,
                                            params.warp_b2)
        # Same packed f16 channel-stack contract as bev/core.make_raster_fn
        # (unpack host-side with bev_core.unpack_maps).
        dense = bev_core.finalize_dense(maps, len(splits), int_scaler,
                                        int_sep_scaler, int_mid_threshold)
        if pack != 'sparse':
            return dense
        return bev_core.sparse_outputs(
            dense, jnp.stack(counts).reshape(len(splits), Px, Px), Px,
            sparse_cap, len(splits))

    return shard_body


def shard_points_to_mesh(mesh: Mesh, points, valid, pt_frame_ids,
                         points_axis: str = 'points'):
    """Place flat point arrays with the points axis sharded over the mesh."""
    s = NamedSharding(mesh, P(points_axis))
    return (jax.device_put(points, s), jax.device_put(valid, s),
            jax.device_put(pt_frame_ids, s))


def make_multistream_raster_fn(mesh: Mesh, view_size, pixel_size, sem_idxs,
                               int_scaler, int_sep_scaler, int_mid_threshold,
                               rgb_fill=0, data_axis: str = 'data',
                               points_axis: str = 'points'):
    """Batched multi-scene raster over a 2-D ('data','points') mesh.

    The 'data' axis carries INDEPENDENT accumulation streams (the
    TPU-native form of the reference's manual scene sharding across
    process launches, run_nuscenes_bev_gen.py:44-45): stream s runs
    entirely on data-row s mod data_size, its points shard over that
    row's 'points' axis, and psum/pmin partials stay within the row
    (vmap'd collectives bind only the points axis).

    fn(points (S,M,10), valid (S,M), pt_frame_ids (S,M), inst_dyn (S,K),
       packed (S,31), gen_future: static bool) -> (S, C, P, P) f16 stacks,
    one per stream, laid out P('data') so each row holds its own results.
    S must be divisible by the data-axis size, M by the points-axis size.
    """
    body = _make_shard_body(view_size, pixel_size, sem_idxs, int_scaler,
                            int_sep_scaler, int_mid_threshold, rgb_fill,
                            points_axis)

    def build(gen_future):
        def ms_body(points, valid, fids, inst_dyn, packed):
            one = functools.partial(body, gen_future=gen_future)
            # One stream per data row is the common case: call the body
            # unbatched (~8% faster than vmap over a batch of 1, measured
            # on the 8-CPU mesh). For >1 local streams, lax.map (a
            # compiled serial loop) rather than vmap: batching a raster
            # body risks the batched-sort/batched-scatter slow paths
            # (PERF_NOTES: a (K, N) jnp.sort measured ~2x K serial 1-D
            # sorts on v5e), and a serial loop per stream is exactly the
            # semantics the independent streams need.
            if points.shape[0] == 1:
                return one(points[0], valid[0], fids[0], inst_dyn[0],
                           packed[0])[None]
            return jax.lax.map(lambda a: one(*a),
                               (points, valid, fids, inst_dyn, packed))

        pt2 = P(data_axis, points_axis)
        row = P(data_axis)
        return jax.shard_map(
            ms_body, mesh=mesh,
            in_specs=(pt2, pt2, pt2, row, row),
            out_specs=row)

    fns = {True: jax.jit(build(True)), False: jax.jit(build(False))}

    def raster(points, valid, pt_frame_ids, inst_dyn, packed, gen_future):
        return fns[bool(gen_future)](points, valid, pt_frame_ids, inst_dyn,
                                     jnp.asarray(packed))

    return raster
