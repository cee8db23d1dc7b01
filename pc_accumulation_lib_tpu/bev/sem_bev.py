"""Semantic BEV generator: host orchestration around the fused device raster.

API-parity counterpart of SemBEVGenerator (bev_generator/sem_bev.py:7-262) /
BEVGenerator (bev_generator/bev_generator.py:10-196). Differences by design:

  * the per-point pipeline runs as ONE jitted device pass (bev/core.py);
  * ``bevs_per_sample`` augmentation fan-out is a loop of device launches
    with host-drawn parameters instead of a multiprocessing.Pool fork
    (kitti360_sem_pc_accum.py:236-241);
  * trajectories (tiny) are processed host-side with the closed-form crop
    (ops/trajectory.py).

The 'full' split is computed as present ∪ future — which is exactly what
every reference call site passes as pc_full (kitti360_sem_pc_accum.py:204,
nuscenes_oracle_sem_pc_accum.py:536).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.bev import core, native_decode
from pc_accumulation_lib_tpu.ops import trajectory as traj_ops
from pc_accumulation_lib_tpu.ops import warp as warp_ops

_MAP_KEYS = ('road', 'intensity', 'rgb', 'dynamic', 'elevation')


def _pad_bucket(n: int, minimum: int = 1024) -> int:
    """Round capacity up to a power of two to bound recompiles."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _to_rows10(pc: np.ndarray) -> np.ndarray:
    """Normalize point rows to the 10-column layout (config.PT_*).

    Accepts (N,8) [..sem] (+inst,dyn zeros appended), (N,9) [..sem,dyn]
    (zero inst inserted), or (N,10)."""
    n, c = pc.shape
    if c == 10:
        return pc
    if c == 8:
        return np.concatenate([pc, np.zeros((n, 2))], axis=1)
    if c == 9:
        return np.concatenate(
            [pc[:, :8], np.zeros((n, 1)), pc[:, 8:9]], axis=1)
    raise ValueError(f'Expected 8-10 point feature columns, got {c}')


class SemBEVGenerator:
    """Drop-in analogue of the reference SemBEVGenerator (sem_bev.py:10-34);
    constructor argument order preserved."""

    def __init__(self, sem_idxs: dict, view_size: float, pixel_size: int,
                 max_trans_radius: float = 0., zoom_thresh: float = 0.,
                 do_warp: bool = False, int_scaler: float = 1.,
                 int_sep_scaler: float = 1., int_mid_threshold: float = 0.5,
                 height_filter: Optional[float] = None, rgb_fill: int = 0,
                 seed: Optional[int] = None, mesh=None,
                 fetch_dtype: str = 'float16',
                 sparse_cap: Optional[int] = None,
                 mesh_impl: str = 'auto',
                 fetch_group: int = 4):
        """``mesh``: optional jax.sharding.Mesh with a 'points' axis — the
        raster then runs point-sharded across devices instead of
        single-chip. ``mesh_impl`` picks the engine: 'auto' (default —
        'tile' when pixel_size^2 is divisible by the points-axis size,
        else 'psum'), 'tile'
        (parallel/sharded.make_tile_sharded_raster_fn — cells stripe
        across chips, points fly once to their cell's owner, per-stripe
        stats use the same sort+Pallas pipeline as single-chip) or
        'psum' (the readable combine-accumulators spec,
        make_sharded_raster_fn — its rgb-histogram all-reduce is
        ~200 MB/split at P=256, so it is the reference implementation,
        not the production engine).

        ``fetch_dtype``: transfer encoding for the remote-TPU tunnel
        (~25-40 MB/s, so fetched bytes bound BEV throughput):
          * 'float16' (default): the exact output contract.
          * 'quantized': [0,1] channels come back as uint8 (max error
            1/510), elevation stays float16 — 1.75x fewer bytes.
          * 'sparse': additionally only OCCUPIED cells cross the link
            (un-occupied cells hold known constants); an occupancy bitmask
            + up to ``sparse_cap`` packed cell values per split, with a
            transparent dense fallback on capacity overflow. 2-6x fewer
            bytes at typical outdoor BEV occupancy."""
        self.sem_idxs = dict(sem_idxs)
        self.view_size = float(view_size)
        self.pixel_size = int(pixel_size)
        self.max_trans_radius = max_trans_radius
        self.zoom_thresh = zoom_thresh
        self.do_warp = do_warp
        self.int_scaler = int_scaler
        self.int_sep_scaler = int_sep_scaler
        self.int_mid_threshold = int_mid_threshold
        self.height_filter = height_filter
        self.rgb_fill = rgb_fill
        self.sem_idx = cfg.PT_SEM   # column of semantic info (parity attr)
        self.dyn_idx = cfg.PT_DYN   # column of dynamic flag (parity attr)
        self.fetch_dtype = fetch_dtype
        # Samples per grouped dispatch+fetch (generate_samples_device);
        # 4 was tuned pre-adaptive-fetch (1.4 MB chunks) — with the
        # occupancy-adaptive encoding a group of 8 is only ~0.6 MB, so
        # larger groups can amortize the ~30 ms per-fetch sync round.
        self.fetch_group = max(1, int(fetch_group))
        self._mesh = mesh
        self._rng = np.random.default_rng(seed)
        # int or (present, future, full) per-split tuple.
        self.sparse_cap = (core.default_sparse_cap(self.pixel_size)
                           if sparse_cap is None else
                           core.resolve_sparse_caps(sparse_cap)
                           if isinstance(sparse_cap, (tuple, list))
                           else int(sparse_cap))
        # Sparse-fetch telemetry: undersizing sparse_cap silently falls
        # back to dense fetches (correct but ~7x the bytes) — callers size
        # the cap from max_occupied (bench.py prints both; per-split
        # detail in max_occupied_split).
        self.sparse_overflows = 0
        self.max_occupied = 0
        self.max_occupied_split = [0, 0, 0]
        # Mean per-split occupancy (sum/count): the cap-to-mean gap is the
        # padding the fixed-shape sparse sections ship as dead bytes.
        self.sum_occupied_split = [0, 0, 0]
        self.n_occupied_obs = 0
        # Adaptive sparse fetch: the value sections are packed by ACTUAL
        # occupancy (bev/core._pack_sparse), so the fetch ships only
        # header+used bytes (+10% and a 2-step growth extrapolation,
        # rounded to 16 KiB buckets so slice shapes stay few). The hint
        # updates on step boundaries (_note_step_boundary) and trails
        # observed usage by 1-2 steps; a sample that outgrows it raises
        # SparseShortFetch and refetches its full buffer (counted below,
        # correctness never lost). All hint state is keyed by the split
        # count S: gen_future varies per call and S=1 buffers (smaller
        # header AND sections) must never truncate an S=3 fetch below its
        # own header.
        self.sparse_short_fetches = 0
        self._fetch_hint_bytes = {}        # {S: bytes}
        # Grouped-fetch sizing policy (generate_samples_device):
        #   'exact' — at dispatch one jitted splitter per group
        #     materializes the 4*S-byte per-sample occupancy block plus a
        #     FIXED ladder of prefix buffers (~16 KiB spacing,
        #     _fetch_rungs); the occupancy block AND the rung the hint
        #     predicts sufficient are copied immediately (dispatch-time
        #     overlap — deferring the value copy measured 8-33% slower).
        #     The resolve (next dispatch entry, or the finalize) verifies
        #     coverage against the exact used bytes; a hint miss tops up
        #     with the next rung — a queue-independent DMA of a
        #     dispatch-materialized buffer instead of the legacy
        #     cap-sized row refetch (_get_rung_fn has the measured
        #     failure modes that shaped this).
        #   'hint' — the value copy is issued at dispatch, truncated by
        #     the trailing step-max estimator below (legacy; a miss
        #     refetches the sample's full cap-sized buffer).
        # Lossless either way; bench A/B via BENCH_FETCH_SIZING.
        self.fetch_sizing = 'exact'
        # Fetch sets dispatched but not yet exact-sized — drained by
        # resolve_ready_fetches() at the next dispatch or by their own
        # finalize (both are pure DMAs of dispatch-materialized rungs).
        self._pending_fetches = []
        self._rung_fns = {}          # {(shape, S, rungs): jitted splitter}
        self._step_used_max = {}           # {S: bytes}
        self._step_used_n = {}             # {S: samples this step}
        self._prev_step_used_max = {}      # {S: bytes}
        self._harvest_pool = None          # lazy persistent decode pool
        self._pool_finalizer = None        # weakref shutdown for the pool
        # Last finalize's harvest split: per-group transfer waits vs total
        # decode/assemble CPU seconds (tools/profile_harvest.py), plus the
        # sparse value-buffer bytes actually put on the wire (exact mode
        # telemetry; None until a grouped finalize runs).
        self.last_harvest = None
        # Decodes run on a small thread pool (generate_samples_device);
        # unlocked read-modify-write would drop counter updates.
        import threading
        self._telemetry_lock = threading.Lock()
        self._sparse_empty = core.sparse_empty_values(
            int_scaler, int_sep_scaler, int_mid_threshold, rgb_fill)
        if mesh is not None:
            from pc_accumulation_lib_tpu.parallel import sharded
            if mesh_impl not in ('auto', 'tile', 'psum'):
                raise ValueError(f'mesh_impl must be auto|tile|psum, '
                                 f'got {mesh_impl!r}')
            if mesh_impl == 'auto':
                # Tile striping needs pixel_size^2 divisible by the
                # points-axis size; fall back to the psum engine for
                # meshes where it isn't (an explicit 'tile' still
                # raises in make_tile_sharded_raster_fn).
                ax = mesh.shape['points']
                mesh_impl = 'tile' if (pixel_size ** 2) % ax == 0 \
                    else 'psum'
            make = (sharded.make_tile_sharded_raster_fn
                    if mesh_impl == 'tile'
                    else sharded.make_sharded_raster_fn)
            self._raster = make(
                mesh, self.view_size, self.pixel_size, self.sem_idxs,
                int_scaler, int_sep_scaler, int_mid_threshold, rgb_fill,
                pack='sparse' if fetch_dtype == 'sparse' else None,
                sparse_cap=self.sparse_cap)
        else:
            self._raster = core.make_raster_fn(
                self.view_size, self.pixel_size, self.sem_idxs, int_scaler,
                int_sep_scaler, int_mid_threshold, rgb_fill,
                pack='sparse' if fetch_dtype == 'sparse' else None,
                sparse_cap=self.sparse_cap)
        # accum.step() fast-path split raster (core.make_prep_fn +
        # make_prepped_raster_fn): aug-invariant per-point work hoisted to
        # once per step. None = auto (real TPU, Pallas-compatible P);
        # tests force True with _prep_interpret for CPU coverage.
        self.use_prepped_raster: Optional[bool] = None
        self._prep_interpret = False
        self._prep_fn = None
        self._raster_prepped = None
        self._raster_prepped_group = None
        # Compacted-group raster (ops/sort_raster compact_groups): the
        # stats kernel runs over occupied-cell RANKS instead of the dense
        # cell space (~1 ms/raster at bench occupancy, PERF_NOTES round 5;
        # sparse wire bytes identical, dense overflow fallback ships a
        # cell_of_rank prefix). None = auto: on wherever the prepped
        # sparse path applies. Set before the first raster dispatch.
        self.raster_compact: Optional[bool] = None
        # Escape hatch: force per-sample dispatch even where the grouped
        # lax.scan path applies (tests pin grouped == per-sample).
        self._force_ungrouped_dispatch = False

    def close(self):
        """Release the persistent harvest/decode thread pool (also runs
        automatically when the generator is garbage-collected) and drain
        any pending tile-raster overflow checks (the last <=3 rasters'
        counters — parallel/sharded.make_tile_sharded_raster_fn — would
        otherwise go unchecked at job end)."""
        drain = getattr(self._raster, 'drain', None)
        if drain is not None:
            drain()
        if self._pool_finalizer is not None:
            self._pool_finalizer()
            self._pool_finalizer = None
        self._harvest_pool = None

    @property
    def _prepped_ok(self) -> bool:
        if self._mesh is not None:
            return False
        if self.use_prepped_raster is not None:
            return self.use_prepped_raster
        import jax as _jax
        return (_jax.default_backend() == 'tpu'
                and (self.pixel_size ** 2) % 512 == 0)

    def prep_points(self, points, inst_dyn, pose_vec):
        """Once-per-step aug-invariant point prep (core.make_prep_fn)."""
        if self._prep_fn is None:
            self._prep_fn = core.make_prep_fn(self.sem_idxs)
        return self._prep_fn(points, inst_dyn, pose_vec)

    @property
    def _compact_groups(self) -> bool:
        if self.raster_compact is not None:
            return bool(self.raster_compact) and self.fetch_dtype == 'sparse'
        return self.fetch_dtype == 'sparse'

    def _get_prepped_raster(self):
        if self._raster_prepped is None:
            self._raster_prepped = core.make_prepped_raster_fn(
                self.view_size, self.pixel_size, self.int_scaler,
                self.int_sep_scaler, self.int_mid_threshold, self.rgb_fill,
                pack='sparse' if self.fetch_dtype == 'sparse' else None,
                sparse_cap=self.sparse_cap,
                pallas_interpret=self._prep_interpret,
                compact_groups=self._compact_groups)
        return self._raster_prepped

    def _get_prepped_raster_group(self):
        """Jitted scan-of-a-fetch-group of prepped rasters (ONE dispatch
        per group instead of per sample — core.make_prepped_raster_group_fn;
        distinct group lengths jit-cache as distinct shapes)."""
        if self._raster_prepped_group is None:
            self._raster_prepped_group = core.make_prepped_raster_group_fn(
                self.view_size, self.pixel_size, self.int_scaler,
                self.int_sep_scaler, self.int_mid_threshold, self.rgb_fill,
                pack='sparse' if self.fetch_dtype == 'sparse' else None,
                sparse_cap=self.sparse_cap,
                pallas_interpret=self._prep_interpret,
                compact_groups=self._compact_groups)
        return self._raster_prepped_group

    # ------------------------------------------------------------------
    # Augmentation parameter draws (host RNG)
    # ------------------------------------------------------------------
    @property
    def do_aug(self) -> bool:
        return self.max_trans_radius > 0. or self.zoom_thresh > 0.

    def _draw_geom_aug(self):
        """Random rotation/translation/zoom (bev_generator.py:162-184)."""
        rot_ang = 2 * np.pi * self._rng.random()
        trans_r = self.max_trans_radius * self._rng.random()
        trans_ang = 2 * np.pi * self._rng.random()
        zoom = float(np.clip(self._rng.normal(0, 0.1), -self.zoom_thresh,
                             self.zoom_thresh)) + 1.0
        return (rot_ang, trans_r * np.cos(trans_ang),
                trans_r * np.sin(trans_ang), zoom)

    def _draw_warp(self):
        """Random polynomial warp parameters (sem_bev.py:121-128); identity
        when do_warp is off."""
        P = self.pixel_size
        if not self.do_warp:
            return dict(a1=1.0, a2=0.0, b1=1.0, b2=0.0, i_mid=P // 2,
                        j_mid=P // 2, i_warp=P // 2, j_warp=P // 2,
                        active=False)
        i_mid = j_mid = P // 2
        i_warp, j_warp = warp_ops.get_random_warp_params(
            0.15, 0.30, P, P, rng=self._rng)
        a1, a2 = warp_ops.cal_warp_params(i_warp, i_mid, P - 1)
        b1, b2 = warp_ops.cal_warp_params(j_warp, j_mid, P - 1)
        return dict(a1=a1, a2=a2, b1=b1, b2=b2, i_mid=i_mid, j_mid=j_mid,
                    i_warp=i_warp, j_warp=j_warp, active=True)

    @staticmethod
    def _heading_rot_ang(ego_traj_present) -> float:
        """Heading-aligned rotation (bev_generator.py:87-93)."""
        rot_ang = 0.5 * np.pi
        if ego_traj_present is not None and len(ego_traj_present) > 1:
            dx = ego_traj_present[-1][0] - ego_traj_present[-2][0]
            dy = ego_traj_present[-1][1] - ego_traj_present[-2][1]
            rot_ang += np.arctan2(dy, dx)
        return float(np.pi - rot_ang)

    # ------------------------------------------------------------------
    # Core sample generation (shared by standalone + accumulator paths)
    # ------------------------------------------------------------------
    def generate_samples(self, points, valid, pt_frame_ids, inst_dyn,
                         base_params: core.RasterParams,
                         trajs: Dict, n_samples: int, gen_future: bool,
                         randomize: Optional[bool] = None,
                         async_fetch: bool = False):
        """Generate ``n_samples`` BEV dicts from device-resident points.

        Args:
          points/valid/pt_frame_ids/inst_dyn: flat device arrays (bev/core).
          base_params: RasterParams with frame/window/origin fields set;
            augmentation fields are overwritten per sample.
          trajs: metric-space trajectories ALREADY in the BEV frame:
            {'ego_traj_present': (N,3), 'other_trajs_present': [(N,3)...],
             ... future/full ..., optional 'gt_lanes': [(N,3)...]}.
          randomize: override for the do_aug decision (reference
            generate_multiproc, bev_generator.py:186-196).
          async_fetch: when True, return a zero-arg callable instead of the
            list; all device work is dispatched now, but the (expensive,
            tunnel-serialized) device->host fetch happens when the callable
            runs — letting the caller dispatch the NEXT frame's work first.
        """
        randomize = self.do_aug if randomize is None else randomize
        hf = np.inf if self.height_filter is None else self.height_filter
        draws, packed = [], []
        for _ in range(n_samples):
            if randomize:
                rot_ang, dx, dy, zoom = self._draw_geom_aug()
            else:
                rot_ang = self._heading_rot_ang(trajs.get('ego_traj_present'))
                dx, dy, zoom = 0.0, 0.0, 1.0
            w = self._draw_warp()
            params = base_params._replace(
                rot_ang=float(rot_ang), trans_dx=float(dx),
                trans_dy=float(dy), zoom=float(zoom),
                warp_a1=float(w['a1']), warp_a2=float(w['a2']),
                warp_b1=float(w['b1']), warp_b2=float(w['b2']),
                height_thresh=float(hf))
            draws.append((rot_ang, dx, dy, zoom, w))
            packed.append(params.pack())
        # Dispatch all samples and start every device->host copy
        # immediately (copy_to_host_async): each sample's (quantized)
        # stack streams over the tunnel as soon as its raster finishes,
        # per-chunk round trips pipeline instead of serializing, and
        # sample i+1's compute overlaps sample i's transfer. Measured on
        # the remote-TPU tunnel: ~1.5 MB async chunks sustain ~40 MB/s
        # where one big batched fetch stalls. (Replaces the reference's
        # multiprocessing.Pool fan-out, kitti360_sem_pc_accum.py:236-241.
        # Per-sample dispatch, not one vmapped raster: batched sort
        # serializes.)
        outs = self._encode_outs([
            self._raster(points, valid, pt_frame_ids, inst_dyn, pk,
                         gen_future) for pk in packed
        ])
        fetch_bufs = [self._start_fetch(o[0] if isinstance(o, tuple) else o,
                                        gen_future) for o in outs]

        def finalize() -> List[Dict]:
            sparse = self.fetch_dtype == 'sparse'
            res = [
                self._assemble(
                    self._fetch_stack(
                        o, gen_future, w,
                        raw=np.asarray(fb) if sparse else None),
                    trajs, rot_ang, dx, dy, zoom * self.view_size, w,
                    gen_future)
                for o, fb, (rot_ang, dx, dy, zoom, w)
                in zip(outs, fetch_bufs, draws)
            ]
            self._note_step_boundary()
            return res

        return finalize if async_fetch else finalize()

    def generate_samples_device(self, points, valid, pt_frame_ids, inst_dyn,
                                pose_vec, n_samples: int, gen_future: bool,
                                trajs_fn, fetch_group: Optional[int] = None,
                                prepped=None):
        """Like generate_samples, but the pose-dependent half of the raster
        params (T_ref_world, bev_coords, window — RasterParams fields 0..21)
        arrives as a DEVICE vector ``pose_vec`` threaded from the
        accumulator's fused integrate step: dispatching the rasters needs
        no host fetch at all (accum/kitti360.step). ``trajs_fn`` is called
        inside the returned finalize, after the caller has synced host
        poses, and must return the metric-space traj dict of
        generate_samples. Randomized augmentation only (the heading-aligned
        fallback needs host poses at dispatch time). ``fetch_group``:
        sparse sample buffers are stacked and fetched in groups of this
        size (None -> the generator's ``fetch_group`` attribute)."""
        if fetch_group is None:
            fetch_group = self.fetch_group
        # Exact-size any fetch set from a PREVIOUS call whose occupancy
        # blocks have landed: its value slices enqueue ahead of this
        # call's rasters (see _resolve_fetch_groups on queue position).
        self.resolve_ready_fetches()
        # Mesh note: the point-sharded raster accepts the same
        # (pose_vec, aug9) device tuple (parallel/sharded.py), so this
        # zero-host-sync path works multi-chip too. The tile engine also
        # carries the grouped lax.scan dispatch (raster.group — one
        # shard_map submission per fetch group, taken below); only the
        # prepped-point hoisting stays single-chip (_prepped_ok gates it
        # off when self._mesh is set: prep output would need re-sharding
        # per step for no dispatch win). The caller pre-shards the point
        # arrays once per step (accum/kitti360.step) so the bev_num raster
        # calls don't each re-lay-out the buffer.
        if not self.do_aug:
            # The classic path's no-aug rotation is heading-aligned
            # (_heading_rot_ang), which needs host poses — unavailable at
            # dispatch time here. Refuse rather than silently produce
            # differently-oriented BEVs (accum.step falls back to the
            # classic path in this case).
            raise NotImplementedError(
                'generate_samples_device requires augmentation '
                '(max_trans_radius/zoom_thresh > 0): the no-aug rotation '
                'is heading-aligned and needs host poses at dispatch. '
                'Use integrate() + generate_bev().')
        hf = np.inf if self.height_filter is None else self.height_filter
        draws, aug9s = [], []
        for _ in range(n_samples):
            rot_ang, dx, dy, zoom = self._draw_geom_aug()
            w = self._draw_warp()
            aug9s.append(np.array(
                [rot_ang, dx, dy, zoom, w['a1'], w['a2'], w['b1'], w['b2'],
                 hf], np.float32))
            draws.append((rot_ang, dx, dy, zoom, w))
        if prepped is not None and self.fetch_dtype == 'sparse' \
                and n_samples > 1 and not self._force_ungrouped_dispatch:
            # ONE dispatch per fetch group (a lax.scan over the group's
            # aug draws): each eager submission is a control round on the
            # remote-TPU tunnel, and 16 of them measured 40-120 ms/step
            # of main-thread time depending on tunnel congestion. The
            # scan output IS the stacked group, so the stack op per
            # group disappears too. (n_samples == 1 — e.g. bev_num=1 —
            # keeps the per-sample raster: a length-1 scan would pay its
            # own compile for no dispatch win.)
            ref_xyz, packed, packed2 = prepped
            gfn = self._get_prepped_raster_group()
            fetch_group = max(1, fetch_group)
            outs, groups = [], []
            for g0 in range(0, n_samples, fetch_group):
                aug_g = np.stack(aug9s[g0:g0 + fetch_group])
                sp_g, dn_g = gfn(ref_xyz, valid, pt_frame_ids, packed,
                                 packed2, pose_vec, aug_g, gen_future)
                groups.append(self._start_fetch(sp_g, gen_future))
                for r in range(aug_g.shape[0]):
                    # Lazy per-row getters: eager device row views would
                    # re-add the per-sample dispatches this path removes;
                    # the getters only run on the rare short-fetch /
                    # overflow fallbacks (_fetch_stack), where they slice
                    # the row ON DEVICE first — fetching the whole group
                    # (G x cap buffers, tens of MB at P=512) through the
                    # tunnel for one sample would stall seconds.
                    outs.append(
                        (lambda a=sp_g, i=r: np.asarray(a[i]),
                         lambda a=dn_g, i=r: np.asarray(a[i])))
            return self._make_device_finalize(outs, draws, groups,
                                              fetch_group, n_samples,
                                              gen_future, trajs_fn)
        mesh_group = (getattr(self._raster, 'group', None)
                      if prepped is None else None)
        if mesh_group is not None and self.fetch_dtype == 'sparse' \
                and n_samples > 1 and not self._force_ungrouped_dispatch:
            # Mesh (tile-engine) counterpart of the grouped dispatch
            # above: one shard_map submission scans the fetch group's aug
            # draws (parallel/sharded.make_tile_sharded_raster_fn), same
            # stacked-group fetch and lazy per-row fallback getters.
            fetch_group = max(1, fetch_group)
            outs, groups = [], []
            for g0 in range(0, n_samples, fetch_group):
                aug_g = np.stack(aug9s[g0:g0 + fetch_group])
                sp_g, dn_g = mesh_group(points, valid, pt_frame_ids,
                                        inst_dyn, pose_vec, aug_g,
                                        gen_future)
                groups.append(self._start_fetch(sp_g, gen_future))
                for r in range(aug_g.shape[0]):
                    outs.append(
                        (lambda a=sp_g, i=r: np.asarray(a[i]),
                         lambda a=dn_g, i=r: np.asarray(a[i])))
            return self._make_device_finalize(outs, draws, groups,
                                              fetch_group, n_samples,
                                              gen_future, trajs_fn)
        raster_prepped = (self._get_prepped_raster()
                          if prepped is not None else None)
        outs = []
        for aug9 in aug9s:
            # Tuple form: the pose_vec||aug concat happens inside the
            # raster jit (one dispatch per sample instead of two).
            if prepped is not None:
                ref_xyz, packed, packed2 = prepped
                outs.append(raster_prepped(ref_xyz, valid, pt_frame_ids,
                                           packed, packed2,
                                           (pose_vec, aug9), gen_future))
            else:
                outs.append(self._raster(points, valid, pt_frame_ids,
                                         inst_dyn, (pose_vec, aug9),
                                         gen_future))
        outs = self._encode_outs(outs)
        # Group the per-sample fetch buffers into few device arrays: each
        # device->host fetch costs a ~30 ms turnaround on the remote-TPU
        # tunnel REGARDLESS of size (measured: per-sample harvest stuck at
        # ~36 ms across 417->360 KB payloads and -30 ms compute), so 16
        # fetches/step is the throughput wall, not bytes. One stack
        # dispatch per group, one fetch per group.
        groups = []
        if self.fetch_dtype == 'sparse':
            fetch_group = max(1, fetch_group)
            for g0 in range(0, n_samples, fetch_group):
                batch = jnp.stack([o[0] for o in
                                   outs[g0:g0 + fetch_group]])
                groups.append(self._start_fetch(batch, gen_future))
        else:
            fetch_group = 1
            for o in outs:
                s = o[0] if isinstance(o, tuple) else o
                try:
                    s.copy_to_host_async()
                except Exception:
                    pass
        return self._make_device_finalize(outs, draws, groups, fetch_group,
                                          n_samples, gen_future, trajs_fn)

    def _make_device_finalize(self, outs, draws, groups, fetch_group,
                              n_samples, gen_future, trajs_fn):
        """Deferred harvest closure for generate_samples_device: grouped
        transfer waits + threaded decode/assemble + hint update."""
        import threading
        holder = {'groups': groups, 'gen_future': gen_future,
                  'resolved': None, 'wire': 0, 'lock': threading.Lock()}
        if any(isinstance(g, tuple) and len(g) == 6 and g[0] == 'exact'
               for g in groups):
            self._pending_fetches.append(holder)

        def finalize() -> List[Dict]:
            trajs = trajs_fn()
            # Decode + host-warp + assemble (~5 ms numpy each, GIL mostly
            # released) runs on side threads UNDER the next group's
            # transfer wait instead of extending the critical path.
            import time as _time
            from concurrent.futures import ThreadPoolExecutor
            waits, work_s = [], [0.0]

            def work(o, draw, raw):
                t0 = _time.perf_counter()
                rot_ang, dx, dy, zoom, w = draw
                r = self._assemble(
                    self._fetch_stack(o, gen_future, w, raw=raw), trajs,
                    rot_ang, dx, dy, zoom * self.view_size, w, gen_future)
                dt = _time.perf_counter() - t0
                with self._telemetry_lock:   # 2 workers race on +=
                    work_s[0] += dt
                return r

            t_wall = _time.perf_counter()
            # 'exact' fetch sizing: the value copies were normally issued
            # already by the NEXT dispatch's resolve_ready_fetches (ideal
            # device-queue position); this blocking resolve is the
            # first-step/unpipelined fallback and a no-op re-read
            # otherwise. No-op for legacy hint-mode groups.
            t_res = _time.perf_counter()
            resolved, wire_bytes = self._resolve_fetch_groups(holder)
            resolve_wait = _time.perf_counter() - t_res
            try:   # don't pin this step's device buffers past the harvest
                self._pending_fetches.remove(holder)
            except ValueError:
                pass
            # PERSISTENT 2-thread pool (lazy): a fresh executor per step
            # would retire its threads each time, abandoning the native
            # decoder's thread_local work tables (~MBs each at P>=256,
            # freed only at process exit) — an unbounded host leak over a
            # long run. Finalizes run serially (step order), so one pool
            # per generator is race-free.
            if self._harvest_pool is None:
                self._harvest_pool = ThreadPoolExecutor(
                    max_workers=2, thread_name_prefix='bev-decode')
                # The pool (2 threads + their native thread_local decode
                # tables) must not outlive the generator: a long-lived
                # process creating many generators would otherwise
                # accumulate them for the process lifetime. weakref keeps
                # the generator itself collectable (a __del__ or a bound
                # method would pin it); close() offers the explicit form.
                import weakref
                self._pool_finalizer = weakref.finalize(
                    self, ThreadPoolExecutor.shutdown, self._harvest_pool,
                    wait=False)
            ex = self._harvest_pool
            futs = []
            for g0 in range(0, n_samples, fetch_group):
                t0 = _time.perf_counter()
                raws = (np.asarray(resolved[g0 // fetch_group])
                        if resolved else None)
                waits.append(_time.perf_counter() - t0)
                for j in range(g0, min(g0 + fetch_group, n_samples)):
                    raw = None if raws is None else raws[j - g0]
                    futs.append(ex.submit(work, outs[j], draws[j], raw))
            res = [f.result() for f in futs]
            self._note_step_boundary()
            # Telemetry for the harvest profiler (tools/profile_harvest.py):
            # per-group transfer waits vs total decode/assemble CPU time.
            with self._telemetry_lock:
                self.last_harvest = dict(
                    waits=waits, work_s=work_s[0],
                    wall_s=_time.perf_counter() - t_wall,
                    wire_bytes=wire_bytes,
                    resolve_wait_s=resolve_wait,
                    resolved_by=holder.get('resolved_by'))
            return res

        return finalize

    def _encode_outs(self, outs):
        """Apply the transfer encoding to freshly-dispatched raster
        outputs ('sparse' outputs come back already encoded: the raster
        fuses the sparse pack AND the quantized dense fallback)."""
        if self.fetch_dtype == 'quantized':
            return [core.quantize_stack(s) for s in outs]
        return outs

    def _note_step_boundary(self):
        """Update the adaptive-fetch byte hints from each split count's
        max used bytes this step: +10% headroom plus twice the
        step-over-step growth (the hint trails dispatch by 1-2 steps, so
        while the accumulation window is still FILLING — occupancy rising
        every step — the slope term is what keeps the whole next step
        from short-fetching) rounded up to a 16 KiB bucket (the
        resulting slice-shape variety is bounded and persistently
        compile-cached)."""
        with self._telemetry_lock:
            for S, cur in self._step_used_max.items():
                prev = self._prev_step_used_max.get(S)
                if (prev is not None and cur < prev
                        and self._step_used_n.get(S, 0) < 4):
                    # A 1-3 sample step's max is a biased-low estimator —
                    # e.g. a bev_num=1 step interleaved with 16-sample
                    # steps would shrink the hint and short the whole
                    # next big step. Only shrink on representative steps.
                    continue
                slope = 0 if prev is None else max(0, cur - prev)
                hint = int((cur + 2 * slope) * 1.10)
                self._fetch_hint_bytes[S] = -(-hint // 16384) * 16384
                self._prev_step_used_max[S] = cur
            self._step_used_max.clear()
            self._step_used_n.clear()

    def _start_fetch(self, arr, gen_future=True):
        """Begin the device->host copy of one sparse buffer (or a stacked
        group of them), truncated along the last axis to this split
        count's adaptive byte hint when one is known — the value sections
        are packed by actual occupancy, so everything past the hint is
        cap padding. Returns the device array the finalize should
        np.asarray — or, under ``fetch_sizing='exact'`` for a stacked
        group, an ('exact', group, hdr, rung_prefixes, rung_sizes,
        pre_idx) 6-tuple: the occupancy block and a small ladder of
        prefix buffers are materialized NOW (one jitted splitter per
        group, _get_rung_fn), the hint-predicted rung ``pre_idx`` is
        pre-issued for overlap, and the finalize picks + copies the
        smallest sufficient rung once ``hdr`` has landed
        (_resolve_fetch_groups)."""
        if self.fetch_dtype == 'sparse':
            S = 3 if gen_future else 1
            if self.fetch_sizing == 'exact' and arr.ndim >= 2:
                rungs = self._fetch_rungs(S, int(arr.shape[-1]))
                fn = self._get_rung_fn(arr.shape, S, rungs)
                out = fn(arr)
                hdr, vals = out[0], out[1:]
                # Pre-issue the rung the hint predicts sufficient: the
                # copy overlaps THIS step's own compute (measured A/B:
                # deferring all value copies to resolve time lost ~8%
                # e2e and ~33% at bev_num=1 on a 53 MB/s link — overlap
                # beats the byte saving on healthy links). The resolve
                # only verifies coverage against the exact counts and
                # tops up with the next rung when the hint was short.
                hint = self._fetch_hint_bytes.get(S)
                pre = len(rungs) - 1
                if hint is not None:
                    for i, r in enumerate(rungs):
                        if r >= hint:
                            pre = i
                            break
                try:
                    hdr.copy_to_host_async()
                    vals[pre].copy_to_host_async()
                except Exception:
                    pass
                return ('exact', arr, hdr, vals, rungs, pre)
            k = self._fetch_hint_bytes.get(S)
            if k is not None and k < arr.shape[-1]:
                arr = arr[..., :k]
        try:
            arr.copy_to_host_async()
        except Exception:   # e.g. committed multi-device (mesh) outputs
            pass
        return arr

    def _fetch_rungs(self, S, cap_bytes):
        """FIXED ladder of prefix lengths for one stacked group's
        exact-sized fetch: every ``spacing`` bytes from the first rung
        that can cover a header up to the full buffer. Fixed — not
        adapted from usage — on purpose: the splitter jit is keyed by
        the rung tuple, and adaptive rungs drifting across buckets
        recompiled it mid-run (~0.4 s per new shape through the tunnel,
        measured as 380-420 ms dispatch spikes). ~24 rungs cap the
        ladder's HBM materialization at ~12x the buffer (µs of device
        copies); the fetch overshoot is at most one spacing (~4% at the
        bench's ~200 KB used)."""
        spacing = max(16384, -(-cap_bytes // (24 * 16384)) * 16384)
        hdr_b = core.sparse_header_bytes(self.pixel_size, S == 3)
        first = max(spacing, -(-hdr_b // spacing) * spacing)
        rungs = list(range(first, cap_bytes, spacing))
        if not rungs or rungs[-1] != cap_bytes:
            rungs.append(cap_bytes)
        return tuple(rungs)

    def _get_rung_fn(self, shape, S, rungs):
        """Jitted (cached per shape/rungs) splitter: one device program,
        enqueued AT DISPATCH right behind its group's raster, that
        materializes the per-sample occupancy block plus each rung-sized
        prefix of the packed buffer as separate buffers. The finalize can
        then fetch the chosen rung as a PURE copy with no device program
        — a program issued at finalize time would queue behind the next
        step's already-dispatched compute and serialize transfer against
        compute (measured: 42.8 samples/s on a 67 MB/s link, group-0
        waits 170-347 ms, plus 0.2-1 s tunnel compiles for every new
        slice shape)."""
        key = (tuple(shape), S, rungs)
        fn = self._rung_fns.get(key)
        if fn is None:
            import jax
            off = (core.sparse_header_bytes(self.pixel_size, S == 3)
                   - 16)

            def split(a):
                return ((a[..., off:off + 4 * S],)
                        + tuple(a[..., :r] for r in rungs))

            fn = jax.jit(split)
            self._rung_fns[key] = fn
        return fn

    def _resolve_fetch_groups(self, holder):
        """Turn a pending fetch-set's _start_fetch results into
        fetch-ready device arrays. For 'exact' entries: read the
        per-sample occupancy blocks (copied at dispatch) and verify the
        pre-issued rung covers the group's exact used bytes; on a hint
        miss, top up with the smallest covering rung (full buffer as the
        last resort) — the rungs were materialized at dispatch
        (_get_rung_fn), so every copy here is a queue-independent DMA
        that overlaps whatever compute is in flight. Idempotent via the
        holder (a finalize racing resolve_ready_fetches takes
        holder['lock'])."""
        with holder['lock']:
            if holder['resolved'] is not None:
                return holder['resolved'], holder['wire']
            gen_future = holder['gen_future']
            hdr_b = core.sparse_header_bytes(self.pixel_size, gen_future)
            resolved, wire = [], 0
            for g in holder['groups']:
                if not (isinstance(g, tuple) and len(g) == 6
                        and g[0] == 'exact'):
                    resolved.append(g)
                    if hasattr(g, 'shape'):
                        wire += int(np.prod(g.shape))
                    continue
                _, grp, hdr, vals, rungs, pre = g
                noccs = np.ascontiguousarray(
                    np.asarray(hdr)).view(np.int32)
                used = hdr_b + 8 * int(noccs.reshape(grp.shape[0], -1)
                                       .sum(axis=1).max())
                # The pre-issued rung's bytes are on the wire either
                # way; count them, and top up only when it was short.
                wire += int(grp.shape[0]) * rungs[pre]
                if rungs[pre] >= used:
                    resolved.append(vals[pre])
                else:
                    val, k = grp, int(grp.shape[-1])
                    for v, r in zip(vals, rungs):
                        if r >= used:
                            val, k = v, r
                            break
                    try:
                        val.copy_to_host_async()
                    except Exception:
                        pass
                    resolved.append(val)
                    wire += int(grp.shape[0]) * k
                    with self._telemetry_lock:
                        # Cheap recovery (a rung DMA, not the old
                        # cap-sized refetch) but still a hint miss —
                        # keep the counter honest.
                        self.sparse_short_fetches += 1
            holder['resolved'], holder['wire'] = resolved, wire
            holder.setdefault('resolved_by', 'finalize')
            return resolved, wire

    def resolve_ready_fetches(self):
        """Resolve every pending exact-sizing fetch set whose occupancy
        blocks have already landed (non-blocking). Callers that pipeline
        dispatch-ahead (accum.step, and generate_samples_device itself)
        invoke this at dispatch entry so the value slices enqueue while
        the device queue is empty — see _resolve_fetch_groups on why the
        queue position matters. Cheap no-op when nothing is pending."""
        if not self._pending_fetches:
            return
        # Snapshot: a concurrently-running finalize (worker thread) may
        # .remove() entries; adds only ever happen on this thread.
        for holder in list(self._pending_fetches):
            if holder['resolved'] is not None:
                continue
            ready = True
            for g in holder['groups']:
                if (isinstance(g, tuple) and len(g) == 6
                        and g[0] == 'exact'):
                    try:
                        if not g[2].is_ready():
                            ready = False
                            break
                    except Exception:
                        # is_ready can raise (e.g. committed mesh outputs);
                        # treat as not-ready so the finalize's blocking
                        # fallback handles it instead of stalling dispatch
                        # on a blocking np.asarray here.
                        ready = False
                        break
            if ready:
                holder.setdefault('resolved_by', 'dispatch')
                self._resolve_fetch_groups(holder)
        self._pending_fetches = [h for h in list(self._pending_fetches)
                                 if h['resolved'] is None]

    def _fetch_stack(self, out, gen_future, w=None, raw=None) -> np.ndarray:
        """Fetch + decode one raster output to a (C,P,P) float16 numpy
        stack, per fetch_dtype. 'sparse' outputs are (sparse, dense)
        tuples shipped PRE-warp (bev/core.py): the dense stack,
        pre-quantized at dispatch, is fetched only on capacity overflow,
        and the polynomial warp ``w`` is applied host-side here. ``raw``
        optionally supplies the already-fetched sparse bytes (grouped
        fetches, generate_samples_device)."""
        if self.fetch_dtype == 'sparse':
            sparse, dense = out
            # Grouped dispatch hands per-sample fallbacks as LAZY getters
            # (device row views would cost per-sample dispatches).
            fetch_full = (sparse if callable(sparse)
                          else lambda: np.asarray(sparse))
            fetch_dense = (dense if callable(dense)
                           else lambda: np.asarray(dense))
            if raw is None:
                raw = fetch_full()
            S = 3 if gen_future else 1
            if raw.shape[-1] < core.sparse_header_bytes(self.pixel_size,
                                                        gen_future):
                # Defensive: a truncation below even the fixed header
                # (e.g. a hint learned at a different operating point) —
                # refetch the full buffer before reading anything.
                with self._telemetry_lock:
                    self.sparse_short_fetches += 1
                raw = fetch_full()
            n_occs = core.read_sparse_noccs(raw, self.pixel_size,
                                            gen_future)
            used = core.sparse_used_bytes(raw, self.pixel_size, gen_future)
            with self._telemetry_lock:
                self.max_occupied = max(self.max_occupied,
                                        int(n_occs.max()))
                self.n_occupied_obs += 1
                for i in range(S):
                    self.max_occupied_split[i] = max(
                        self.max_occupied_split[i], int(n_occs[i]))
                    self.sum_occupied_split[i] += int(n_occs[i])
                self._step_used_max[S] = max(self._step_used_max.get(S, 0),
                                             used)
                self._step_used_n[S] = self._step_used_n.get(S, 0) + 1

            def _decode(r):
                """-> (stack, already_warped)."""
                if native_decode.available():
                    # Fused decode + warp in one native pass, GIL
                    # released (native/bevdec.cpp); bit-identical to the
                    # numpy path below (tests/test_fetch.py).
                    return native_decode.decode_sparse_warp(
                        r, gen_future, self.pixel_size, self.sparse_cap,
                        self._sparse_empty, w), True
                return core.decode_sparse_stack(
                    r, gen_future, self.pixel_size, self.sparse_cap,
                    self._sparse_empty), False

            try:
                try:
                    stack, warped = _decode(raw)
                except core.SparseShortFetch:
                    # The adaptive hint under-shot this sample: refetch
                    # the full cap-sized buffer (rare; hint adapts).
                    with self._telemetry_lock:
                        self.sparse_short_fetches += 1
                    stack, warped = _decode(fetch_full())
            except core.SparseOverflow:
                with self._telemetry_lock:
                    self.sparse_overflows += 1
                stack = core.decode_dense_words(
                    fetch_dense(), gen_future, self.pixel_size)
                warped = False
            if not warped and w is not None and w['active']:
                stack = warp_ops.warp_dense_maps_np(
                    stack, w['a1'], w['a2'], w['b1'], w['b2'])
            return stack
        if self.fetch_dtype == 'quantized':
            return core.dequantize_stack_batch(
                np.asarray(out)[None], gen_future, self.pixel_size)[0]
        return np.asarray(out)

    def _process_trajs(self, traj_list, rot_ang, dx, dy, aug_view, w):
        """Transform + crop + pixelize + warp one list of trajectories
        (bev_generator.py:127-160 + sem_bev.py:157-194)."""
        out = []
        for t in traj_list:
            t = np.asarray(t, dtype=np.float64).reshape(-1, 3)
            t = traj_ops.geometric_transform_traj(t, rot_ang, dx, dy,
                                                  aug_view)
            t = traj_ops.pos2grid_traj(t, aug_view, self.pixel_size)
            out.append(t)
        if w['active']:
            out = warp_ops.warp_trajs(out, w['a1'], w['a2'], w['j_mid'],
                                      w['j_warp'], self.pixel_size)
        return out

    def _assemble(self, stack, trajs, rot_ang, dx, dy, aug_view, w,
                  gen_future) -> Dict:
        """Build the output BEV dict with the reference's exact key set and
        float16 down-cast (sem_bev.py:204-257). ``stack`` is the raster
        fn's packed float16 channel stack, fetched in ONE transfer."""
        maps = core.unpack_maps(np.asarray(stack), gen_future)
        bev = {}
        splits = ('present', 'future', 'full') if gen_future else ('present',)
        for s in splits:
            for k in _MAP_KEYS:
                bev[f'{k}_{s}'] = np.ascontiguousarray(maps[f'{k}_{s}'])
        for s in splits:
            ego = trajs.get(f'ego_traj_{s}')
            others = trajs.get(f'other_trajs_{s}') or []
            tl = ([] if ego is None else [ego]) + list(others)
            bev[f'trajs_{s}'] = self._process_trajs(tl, rot_ang, dx, dy,
                                                    aug_view, w)
        if trajs.get('gt_lanes') is not None:
            lanes = self._process_trajs(trajs['gt_lanes'], rot_ang, dx, dy,
                                        aug_view, w)
            bev['gt_lanes'] = [l for l in lanes if l.shape[0] > 0]
        return bev

    # ------------------------------------------------------------------
    # Reference-parity standalone API (raw numpy point dicts)
    # ------------------------------------------------------------------
    def generate(self, pcs: Dict, trajs: Dict, rot_ang: float = 0.,
                 trans_dx: float = 0., trans_dy: float = 0.,
                 zoom_scalar: float = 1., do_warping: bool = False) -> Dict:
        """Reference BEVGenerator.generate (bev_generator.py:63-125) on raw
        numpy dicts: pcs = {'pc_present','pc_future','pc_full'}."""
        points, valid, fids, gen_future = self._pack_pcs(pcs)
        if not do_warping:
            rot_ang = self._heading_rot_ang(trajs.get('ego_traj_present'))
        hf = np.inf if self.height_filter is None else self.height_filter
        w = self._draw_warp()
        params = core.identity_params(window=(0, 1), present_frame=1,
                                      height_thresh=hf)._replace(
            rot_ang=float(rot_ang), trans_dx=float(trans_dx),
            trans_dy=float(trans_dy), zoom=float(zoom_scalar),
            warp_a1=float(w['a1']), warp_a2=float(w['a2']),
            warp_b1=float(w['b1']), warp_b2=float(w['b2']))
        inst_dyn = jnp.zeros((1,), jnp.float32)
        out = self._encode_outs([
            self._raster(points, valid, fids, inst_dyn, params.pack(),
                         gen_future)])[0]
        fb = self._start_fetch(out[0] if isinstance(out, tuple) else out,
                               gen_future)
        raw = np.asarray(fb) if self.fetch_dtype == 'sparse' else None
        bev = self._assemble(self._fetch_stack(out, gen_future, w, raw=raw),
                             trajs, rot_ang, trans_dx, trans_dy,
                             zoom_scalar * self.view_size, w, gen_future)
        self._note_step_boundary()
        return bev

    def generate_rand_aug(self, pcs: Dict, trajs: Dict,
                          do_warping: bool = True) -> Dict:
        """Random-augmentation variant (bev_generator.py:162-184)."""
        rot_ang, dx, dy, zoom = self._draw_geom_aug()
        return self.generate(pcs, trajs, rot_ang, dx, dy, zoom, do_warping)

    def generate_multiproc(self, bev_gen_inputs) -> Dict:
        """Parity shim for the reference Pool entry point
        (bev_generator.py:186-196)."""
        pcs, trajs = bev_gen_inputs
        if self.do_aug:
            return self.generate_rand_aug(pcs, trajs)
        return self.generate(pcs, trajs)

    def _pack_pcs(self, pcs: Dict):
        """Pack pc_present/pc_future into one flat padded buffer with
        pseudo frame ids 0 (present) / 1 (future)."""
        pc_p = _to_rows10(np.asarray(pcs['pc_present'], np.float32))
        pc_f = pcs.get('pc_future')
        gen_future = pc_f is not None
        if gen_future:
            pc_f = _to_rows10(np.asarray(pc_f, np.float32))
            n_p, n_f = pc_p.shape[0], pc_f.shape[0]
            flat = np.concatenate([pc_p, pc_f], axis=0)
            fids = np.concatenate(
                [np.zeros(n_p, np.int32), np.ones(n_f, np.int32)])
        else:
            flat = pc_p
            fids = np.zeros(pc_p.shape[0], np.int32)
        n = flat.shape[0]
        cap = _pad_bucket(n)
        pad = cap - n
        flat = np.pad(flat, ((0, pad), (0, 0)))
        fids = np.pad(fids, (0, pad))
        valid = np.arange(cap) < n
        return (jnp.asarray(flat), jnp.asarray(valid), jnp.asarray(fids),
                gen_future)

    # ------------------------------------------------------------------
    # Alternative elevation-based partition (parity util)
    # ------------------------------------------------------------------
    def get_elevation_map(self, pc: np.ndarray):
        """Per-cell min-z elevation map from PIXEL-coordinate points
        (sem_bev.py:535-554): pc[:, 0]=i, pc[:, 1]=j, pc[:, 2]=z; row
        index is vertically flipped (j_rev = P-1-j). Vectorized via
        np.minimum.at instead of the reference's per-point loop."""
        P = self.pixel_size
        i = pc[:, 0].astype(int)
        j_rev = P - 1 - pc[:, 1].astype(int)
        elevmap = np.full((P, P), np.inf)
        np.minimum.at(elevmap, (j_rev, i), pc[:, 2])
        obs_mask = np.isfinite(elevmap)
        elevmap[~obs_mask] = 0.0
        return elevmap, obs_mask

    def static_obj_partitioning_by_elev(self, pc: np.ndarray,
                                        elev_thresh: float):
        """Partition points into static/dynamic by height above the
        per-cell min elevation (reference sem_bev.py:556-591 — the unused
        alternative to the GT-box dyn flag): points more than
        ``elev_thresh`` above their cell's min z get pc[:, 8] = 1.
        Returns (pc_static, pc_dynamic, elevmap, elevmap_obs_mask)."""
        P = self.pixel_size
        elevmap, obs_mask = self.get_elevation_map(pc)
        i = pc[:, 0].astype(int)
        j_rev = P - 1 - pc[:, 1].astype(int)
        above = pc[:, 2] > elevmap[j_rev, i] + elev_thresh
        pc[above, 8] = 1
        return (pc[pc[:, 8] == 0], pc[pc[:, 8] == 1], elevmap, obs_mask)

    def viz_bev(self, bev, file_path, rgbs=None, semsegs=None):
        from pc_accumulation_lib_tpu.bev import viz
        viz.viz_bev(bev, file_path, self.pixel_size, self.height_filter,
                    rgbs or [], semsegs or [])
