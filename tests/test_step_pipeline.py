"""Pipelined accum.step() vs classic integrate()+generate_bev() parity.

step() (accum/kitti360.py) dispatches integrate + rasters with ZERO host
fetches by threading the pose-dependent raster params (T_ref_world,
bev_coords, eviction window) through the device pose chain. These tests pin
it to the classic two-call path: same BEV maps, same trajectories, same
eviction behavior across a horizon-crossing drive.
"""
import numpy as np
import pytest

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.accum.kitti360 import (
    Kitti360SemanticPointCloudAccumulator)
from pc_accumulation_lib_tpu.dataloaders.synthetic import (
    SyntheticKitti360Stream, make_calib)

N_FRAMES = 12
HORIZON = 12.0  # crossed around frame 7 at 2 m steps -> eviction exercised


def _make_accum(seed=0, transfer_dtype='float32', **bev_extra):
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum_cfg = cfg.AccumConfig(max_points_per_frame=8192, max_frames=10,
                                max_painted_points_per_frame=8192)
    icp_cfg = cfg.ICPConfig(max_downsampled=512, num_iters=8)
    bev_params = dict(type='sem', view_size=40, pixel_size=64,
                      max_trans_radius=2.0, zoom_thresh=0.05, do_warp=True,
                      int_scaler=20., int_sep_scaler=20.,
                      int_mid_threshold=0.5, **bev_extra)
    return Kitti360SemanticPointCloudAccumulator(
        HORIZON, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True, bev_params, accum_cfg=accum_cfg,
        icp_cfg=icp_cfg, seed=seed, transfer_dtype=transfer_dtype)


def test_quantized_upload_rejects_unnormalized_intensity():
    """The packed u8 intensity covers [0, 1.275] at the x200 scale; a
    dataset with unnormalized remission must fail loudly rather than
    silently clamp (accum/kitti360.py _pad_pc)."""
    a = _make_accum(seed=11, transfer_dtype='quantized')
    pc = np.zeros((4, 4), np.float32)
    pc[:, 3] = [0.0, 0.5, 1.0, 1.275]        # in-range: fine
    a._pad_pc(pc)
    pc[3, 3] = 100.0                          # raw (unnormalized) remission
    with pytest.raises(ValueError, match='intensity'):
        a._pad_pc(pc)
    pc[3, 3] = -0.01                          # negative: u8 can't hold it
    with pytest.raises(ValueError, match='intensity'):
        a._pad_pc(pc)


def _frames():
    stream = SyntheticKitti360Stream(n_frames=N_FRAMES, step=2.0,
                                     lidar_range=25.0, seed=3,
                                     points_per_frame=3000)
    return [stream.frame(i) for i in range(N_FRAMES)]


@pytest.fixture(scope='module')
def both_paths():
    frames = _frames()
    a_cls = _make_accum(seed=7)   # classic: integrate + generate_bev
    a_new = _make_accum(seed=7)   # pipelined: step()
    out_cls, out_new = [], []
    meta = []
    a_cls.integrate([frames[0]])
    a_new.integrate([frames[0]])
    for i in range(1, N_FRAMES):
        a_cls.integrate([frames[i]])
        out_cls.append(a_cls.generate_bev(
            present_idx=len(a_cls.poses) - 2, bev_num=2, gen_future=True))
        out_new.append(a_new.step([frames[i]], bev_num=2, gen_future=True))
        meta.append((list(a_cls.poses), a_cls.window_start,
                     list(a_new.poses), a_new.window_start))
    return out_cls, out_new, meta


def test_eviction_and_poses_match(both_paths):
    _, _, meta = both_paths
    evicted = False
    for poses_c, ws_c, poses_n, ws_n in meta:
        assert ws_c == ws_n
        assert len(poses_c) == len(poses_n)
        np.testing.assert_allclose(np.array(poses_c), np.array(poses_n),
                                   atol=1e-5)
        evicted |= ws_c > 0
    assert evicted, 'horizon eviction never triggered — test config broken'


def test_bev_maps_match(both_paths):
    out_cls, out_new, _ = both_paths
    assert len(out_cls) == len(out_new)
    for bevs_c, bevs_n in zip(out_cls, out_new):
        assert len(bevs_c) == len(bevs_n) == 2
        for bc, bn in zip(bevs_c, bevs_n):
            assert set(bc.keys()) == set(bn.keys())
            for k in bc:
                if k.startswith('trajs') or k == 'gt_lanes':
                    continue
                # Same RNG seed -> same aug draws; device-side rigid
                # inverse vs host float64 inv differs at f32 eps, which can
                # flip points on exact cell boundaries -> tiny local diffs.
                mism = np.mean(np.abs(np.asarray(bc[k], np.float32)
                                      - np.asarray(bn[k], np.float32))
                               > 2e-2)
                assert mism < 0.02, (k, mism)


def test_trajs_match(both_paths):
    out_cls, out_new, _ = both_paths
    for bevs_c, bevs_n in zip(out_cls, out_new):
        for bc, bn in zip(bevs_c, bevs_n):
            for k in ('trajs_present', 'trajs_future', 'trajs_full'):
                assert len(bc[k]) == len(bn[k])
                for tc, tn in zip(bc[k], bn[k]):
                    np.testing.assert_allclose(tc, tn, atol=1.0)


def test_grouped_fetch_matches_ungrouped():
    """generate_samples_device with multi-group stacked fetches must equal
    per-sample fetches (fetch_group=1) for the same RNG stream."""
    frames = _frames()
    a1, a2 = _make_accum(seed=9), _make_accum(seed=9)
    for a in (a1, a2):
        a.integrate([frames[0]])
        a.integrate([frames[1]])

    def run(a, fetch_group):
        import jax.numpy as jnp
        gen = a.sem_bev_generator
        f, n, d = a.state.points.shape
        return gen.generate_samples_device(
            a.state.points.reshape(f * n, d), a.state.valid.reshape(f * n),
            jnp.repeat(a.state.frame_ids, n),
            a.state.inst_dyn, a._pose_vec_dev, 5, True,
            lambda: {'ego_traj_present': np.zeros((1, 3))},
            fetch_group=fetch_group)()

    b1 = run(a1, 2)   # groups of 2, 2, 1
    b2 = run(a2, 1)   # per-sample path
    assert len(b1) == len(b2) == 5
    for x, y in zip(b1, b2):
        for k in x:
            if k.startswith('trajs'):
                continue
            np.testing.assert_array_equal(np.asarray(x[k]),
                                          np.asarray(y[k]), err_msg=k)


def test_window_update_matches_host_eviction_random_walks():
    """Property check: the device eviction (accum/kitti360.window_update)
    tracks base.remove_observations exactly over random walks with
    eviction bursts, ring wraparound, and horizon-edge path lengths."""
    import jax.numpy as jnp

    from pc_accumulation_lib_tpu.accum import kitti360 as k3
    from pc_accumulation_lib_tpu.accum.base import (
        SemanticPointCloudAccumulator as Base)

    rng = np.random.default_rng(42)
    for trial in range(5):
        R = 12
        horizon = float(rng.uniform(5.0, 15.0))
        n_frames = 40
        steps = rng.uniform(0.0, 2.5, size=(n_frames, 3))
        steps[:, 2] *= 0.1
        poses = np.cumsum(steps, axis=0)

        # Host reference: a bare accumulator bookkeeping mirror.
        host = Base.__new__(Base)
        host.horizon_dist = horizon
        host.poses, host.seg_dists = [list(poses[0])], []
        host.T_world_velo = [np.eye(4)]
        host.rgbs, host.semsegs = [None], [None]
        host.window_start = 0

        seg_ring = jnp.zeros((R,), jnp.float32)
        ws = jnp.int32(0)
        T_prev = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
            jnp.asarray(poses[0], jnp.float32))
        for fid in range(1, n_frames):
            T_cur = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
                jnp.asarray(poses[fid], jnp.float32))
            seg_ring, ws, path, ovf = k3.window_update(
                seg_ring, ws, T_cur, T_prev, jnp.int32(fid),
                jnp.float32(horizon), False)
            assert float(ovf) == 0.0, (trial, fid)
            T_prev = T_cur

            host.poses.append(list(poses[fid]))
            host.T_world_velo.append(np.eye(4))
            host.rgbs.append(None)
            host.semsegs.append(None)
            _, host_path = host.remove_observations()
            assert int(ws) == host.window_start, (trial, fid)
            np.testing.assert_allclose(float(path), host_path, rtol=1e-5)
            # The live window must fit the ring (bench sizing invariant).
            assert fid - int(ws) + 1 <= R, (trial, fid)


def test_window_update_flags_ring_overflow():
    """A stationary/slow stretch longer than the ring must raise the
    overflow flag (window spans > R frames) instead of silently wrapping
    seg_ring (ADVICE r2 #1)."""
    import jax.numpy as jnp

    from pc_accumulation_lib_tpu.accum import kitti360 as k3

    R = 8
    seg_ring = jnp.zeros((R,), jnp.float32)
    ws = jnp.int32(0)
    T_prev = jnp.eye(4, dtype=jnp.float32)
    flagged_at = None
    for fid in range(1, 2 * R + 2):
        T_cur = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(
            jnp.asarray([0.01 * fid, 0.0, 0.0], jnp.float32))
        seg_ring, ws, _, ovf = k3.window_update(
            seg_ring, ws, T_cur, T_prev, jnp.int32(fid),
            jnp.float32(100.0), False)
        T_prev = T_cur
        if float(ovf) != 0.0 and flagged_at is None:
            flagged_at = fid
    # Window start never advances (horizon 100 m never exceeded). The
    # first CORRUPTING write (stale gid fid-R still inside the pre-write
    # window [1, fid-1]) happens at fid == R+1.
    assert flagged_at == R + 1


def test_step_async_fetch_matches_sync():
    frames = _frames()
    a1, a2 = _make_accum(seed=5), _make_accum(seed=5)
    a1.integrate([frames[0]])
    a2.integrate([frames[0]])
    for i in range(1, 4):
        b_sync = a1.step([frames[i]], bev_num=1, gen_future=True)
        handle = a2.step([frames[i]], bev_num=1, gen_future=True,
                         async_fetch=True)
        b_async = handle()
        for k in b_sync[0]:
            if k.startswith('trajs'):
                continue
            np.testing.assert_array_equal(np.asarray(b_sync[0][k]),
                                          np.asarray(b_async[0][k]))


def test_step_no_aug_falls_back_to_classic_heading_aligned():
    """With augmentation off, step() must route through the classic
    integrate()+generate_bev() path (heading-aligned rotation needs host
    poses at dispatch — ADVICE r2 #2) and match it exactly."""
    frames = _frames()
    a_cls, a_new = _make_accum(seed=4), _make_accum(seed=4)
    for a in (a_cls, a_new):
        a.sem_bev_generator.max_trans_radius = 0.0
        a.sem_bev_generator.zoom_thresh = 0.0
        a.sem_bev_generator.do_warp = False
        assert not a.sem_bev_generator.do_aug
    a_cls.integrate([frames[0]])
    a_new.integrate([frames[0]])
    for i in range(1, 5):
        a_cls.integrate([frames[i]])
        b_cls = a_cls.generate_bev(present_idx=len(a_cls.poses) - 2,
                                   bev_num=1, gen_future=True)[0]
        b_new = a_new.step([frames[i]], bev_num=1, gen_future=True)[0]
        for k in b_cls:
            if k.startswith('trajs'):
                continue
            np.testing.assert_array_equal(np.asarray(b_cls[k]),
                                          np.asarray(b_new[k]), err_msg=k)


def test_compact_window_unit():
    """accum/buffer.compact_window: live-window rows land in one dense
    prefix as an exact multiset (order-free), dead/stale slots are
    excluded, and n_live counts every live row even past cap_out."""
    import jax.numpy as jnp

    from pc_accumulation_lib_tpu.accum import buffer

    F, N, D = 4, 16, 10
    rng = np.random.default_rng(0)
    pts = np.zeros((F, N, D), np.float32)
    valid = np.zeros((F, N), bool)
    counts = [5, 0, 7, 3]          # slot 1 is an empty (dead) slot
    fids = np.asarray([4, -1, 5, 2], np.int32)   # slot 3 evicted (fid < ws)
    for f in range(F):
        pts[f, :counts[f]] = rng.normal(size=(counts[f], D))
        pts[f, counts[f]:] = np.nan          # padding garbage must not leak
        valid[f, :counts[f]] = True
    state = buffer.BufferState(points=jnp.asarray(pts),
                               valid=jnp.asarray(valid),
                               frame_ids=jnp.asarray(fids),
                               inst_dyn=jnp.zeros((4,), jnp.float32))
    cap = 32
    cpts, cfids, cvalid, n_live = buffer.compact_window(state, jnp.int32(3),
                                                        cap)
    assert int(n_live) == 12                  # slots 0 (5) + 2 (7)
    cvalid = np.asarray(cvalid)
    assert cvalid.sum() == 12 and cvalid[:12].all()
    got = np.asarray(cpts)[:12]
    want = np.concatenate([pts[0, :5], pts[2, :7]])
    # Row order within the window is unspecified -> compare as multisets.
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_array_equal(got_sorted, want_sorted)
    f_got = np.sort(np.asarray(cfids)[:12])
    np.testing.assert_array_equal(f_got, np.sort([4] * 5 + [5] * 7))
    assert not np.isnan(got).any()

    # Overflow: cap below the live count still reports the true n_live.
    _, _, _, n_ovf = buffer.compact_window(state, jnp.int32(3), 8)
    assert int(n_ovf) == 12


def test_step_with_compaction_matches_classic():
    """step() with AccumConfig.compact_cap must equal the classic
    integrate()+generate_bev() path. Counts/probmaps/medians/elevation are
    order-independent (exact); intensity means see f32 addition-order
    noise only."""
    frames = _frames()
    a_cls = _make_accum(seed=7)
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum_cfg = cfg.AccumConfig(max_points_per_frame=8192, max_frames=10,
                                max_painted_points_per_frame=8192,
                                compact_cap=49152)
    a_cmp = Kitti360SemanticPointCloudAccumulator(
        HORIZON, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True,
        dict(type='sem', view_size=40, pixel_size=64, max_trans_radius=2.0,
             zoom_thresh=0.05, do_warp=True, int_scaler=20.,
             int_sep_scaler=20., int_mid_threshold=0.5),
        accum_cfg=accum_cfg,
        icp_cfg=cfg.ICPConfig(max_downsampled=512, num_iters=8), seed=7)
    a_cls.integrate([frames[0]])
    a_cmp.integrate([frames[0]])
    evicted = False
    for i in range(1, N_FRAMES):
        a_cls.integrate([frames[i]])
        bevs_c = a_cls.generate_bev(present_idx=len(a_cls.poses) - 2,
                                    bev_num=2, gen_future=True)
        bevs_n = a_cmp.step([frames[i]], bev_num=2, gen_future=True)
        assert a_cls.window_start == a_cmp.window_start
        evicted |= a_cls.window_start > 0
        for bc, bn in zip(bevs_c, bevs_n):
            for k in bc:
                if k.startswith('trajs') or k == 'gt_lanes':
                    continue
                mism = np.mean(np.abs(np.asarray(bc[k], np.float32)
                                      - np.asarray(bn[k], np.float32))
                               > 2e-2)
                assert mism < 0.02, (k, mism)
    assert evicted, 'horizon eviction never triggered — config broken'
    assert 0 < a_cmp.max_live_rows <= 49152


def test_step_compaction_overflow_raises():
    frames = _frames()
    H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    accum_cfg = cfg.AccumConfig(max_points_per_frame=8192, max_frames=10,
                                max_painted_points_per_frame=8192,
                                compact_cap=64)   # absurdly small
    a = Kitti360SemanticPointCloudAccumulator(
        HORIZON, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
        cfg.DEFAULT_SEM_IDXS, True,
        dict(type='sem', view_size=40, pixel_size=64, max_trans_radius=2.0,
             zoom_thresh=0.05, do_warp=True, int_scaler=20.,
             int_sep_scaler=20., int_mid_threshold=0.5),
        accum_cfg=accum_cfg,
        icp_cfg=cfg.ICPConfig(max_downsampled=512, num_iters=8), seed=0)
    a.integrate([frames[0]])
    with pytest.raises(RuntimeError, match='compact_cap'):
        a.step([frames[1]], bev_num=1, gen_future=True)


def test_step_compact_rung_ladder_matches_single_cap():
    """AccumConfig.compact_rungs: sweeping the smallest provably-
    sufficient rung must be equivalent to always sweeping compact_cap
    (rows past n_live are sort-sentinel masked either way — differences
    are sort tie-order f32 noise on intensity sums only), must actually
    cross several rungs over an accumulation ramp, and must never pick a
    rung below the live count (the overflow guard would raise).
    prewarm_rungs compiles every rung shape without touching state."""
    frames = _frames()

    def make(rungs):
        H_cam_velo, H_velo_cam, P_cam_frame = make_calib()
        calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                     p_velo_frame=P_cam_frame @ H_velo_cam)
        accum_cfg = cfg.AccumConfig(
            max_points_per_frame=8192, max_frames=10,
            max_painted_points_per_frame=8192, compact_cap=49152,
            compact_rungs=rungs)
        a = Kitti360SemanticPointCloudAccumulator(
            HORIZON, calib, 1e3, None, cfg.DEFAULT_SEMSEG_FILTERS,
            cfg.DEFAULT_SEM_IDXS, True,
            dict(type='sem', view_size=40, pixel_size=64,
                 max_trans_radius=2.0, zoom_thresh=0.05, do_warp=True,
                 int_scaler=20., int_sep_scaler=20.,
                 int_mid_threshold=0.5),
            accum_cfg=accum_cfg,
            icp_cfg=cfg.ICPConfig(max_downsampled=512, num_iters=8),
            seed=7)
        gen = a.sem_bev_generator
        gen.use_prepped_raster = True
        gen._prep_interpret = True
        return a

    a_one = make(None)
    a_lad = make((8192, 16384, 32768))
    a_one.integrate([frames[0]])
    a_lad.integrate([frames[0]])
    state_before = a_lad.state
    a_lad.prewarm_rungs(gen_future=True)
    assert a_lad.state is state_before       # prewarm is pure
    for i in range(1, N_FRAMES):
        bevs_o = a_one.step([frames[i]], bev_num=2, gen_future=True)
        bevs_l = a_lad.step([frames[i]], bev_num=2, gen_future=True)
        assert a_one.window_start == a_lad.window_start
        for bo, bl in zip(bevs_o, bevs_l):
            for k in bo:
                if k.startswith('trajs') or k == 'gt_lanes':
                    continue
                np.testing.assert_allclose(
                    np.asarray(bo[k], np.float32),
                    np.asarray(bl[k], np.float32), atol=2e-3, err_msg=k)
    assert len(a_lad.rungs_used) >= 2, a_lad.rungs_used
    assert sum(a_lad.rungs_used.values()) == N_FRAMES - 1
    assert a_lad.max_live_rows <= 49152


def test_step_grouped_scan_dispatch_sparse():
    """The PRODUCTION bench path — step() with sparse fetch + prepped
    raster — dispatches each fetch group as ONE lax.scan
    (core.make_prepped_raster_group_fn). Pin it two ways: bit-identical
    to the per-sample prepped dispatch (same RNG draws, grouping must not
    change any output), and equal to the classic step path within the
    boundary-flip tolerance (device rigid inverse vs host f64 inv can
    flip points on exact cell boundaries; cf. test_bev_maps_match and
    bench.py --selftest part 2)."""
    frames = _frames()

    def make(seed, force_ungrouped=False):
        a = _make_accum(seed, fetch_dtype='sparse', sparse_cap=3072)
        g = a.sem_bev_generator
        g.use_prepped_raster = True
        g._prep_interpret = True
        g._force_ungrouped_dispatch = force_ungrouped
        return a

    a_grp, a_ung, a_cls = make(11), make(11, force_ungrouped=True), \
        _make_accum(seed=11, fetch_dtype='sparse', sparse_cap=3072)
    for a in (a_grp, a_ung, a_cls):
        a.integrate([frames[0]])
    for i in range(1, 4):
        bg = a_grp.step([frames[i]], bev_num=4, gen_future=True)
        bu = a_ung.step([frames[i]], bev_num=4, gen_future=True)
        bc = a_cls.step([frames[i]], bev_num=4, gen_future=True)
        assert len(bg) == len(bu) == len(bc) == 4
        for sg, su, sc in zip(bg, bu, bc):
            for k in sg:
                if k.startswith('trajs') or k == 'gt_lanes':
                    continue
                np.testing.assert_array_equal(
                    np.asarray(sg[k]), np.asarray(su[k]),
                    err_msg=f'grouped != per-sample: {k}')
                mism = np.mean(np.abs(np.asarray(sg[k], np.float32)
                                      - np.asarray(sc[k], np.float32))
                               > 2e-2)
                assert mism < 0.02, (k, mism)
    gen = a_grp.sem_bev_generator
    assert gen.sparse_overflows == 0, 'grouped path fell back to dense'


def test_exact_fetch_sizing_matches_hint_and_recovers_shorts_cheaply():
    """fetch_sizing='exact' (the default) materializes a fixed ladder of
    prefix rungs at dispatch, pre-issues the rung the hint predicts
    sufficient (keeping the hint path's dispatch-time transfer overlap),
    and verifies coverage against the exact per-sample occupancy block;
    a hint miss tops up with the next rung — a pure DMA — instead of the
    legacy cap-sized row refetch (bev/sem_bev.py _resolve_fetch_groups).
    Pin: bit-identical outputs to the legacy hint mode across a
    horizon-crossing drive (including steps where the hint misses), wire
    telemetry recorded, and steady-state wire within one rung top-up of
    the hint mode's."""
    frames = _frames()

    def make(sizing):
        a = _make_accum(seed=13, fetch_dtype='sparse', sparse_cap=3072)
        g = a.sem_bev_generator
        g.use_prepped_raster = True
        g._prep_interpret = True
        g.fetch_sizing = sizing
        a.integrate([frames[0]])
        return a

    a_ex, a_hi = make('exact'), make('hint')
    wire = {'exact': [], 'hint': []}
    for i in range(1, 6):
        be = a_ex.step([frames[i]], bev_num=4, gen_future=True)
        bh = a_hi.step([frames[i]], bev_num=4, gen_future=True)
        wire['exact'].append(
            a_ex.sem_bev_generator.last_harvest['wire_bytes'])
        wire['hint'].append(
            a_hi.sem_bev_generator.last_harvest['wire_bytes'])
        for se, sh in zip(be, bh):
            for k in se:
                np.testing.assert_array_equal(
                    np.asarray(se[k]), np.asarray(sh[k]),
                    err_msg=f'exact != hint: {k}')
    assert all(w > 0 for w in wire['exact'])
    # Both modes share the hint estimator, so their steady-state wire
    # differs only by the top-up DMAs of this step's hint misses — a
    # 2x bound catches gross regressions (e.g. shipping every rung).
    assert wire['exact'][-1] <= 2 * wire['hint'][-1]


def test_quantized_transfer_decode_exact_and_equivalent():
    """transfer_dtype='quantized' (the bench upload encoding, packed
    7 B/point: 5 mm i16 xyz + u8 intensity at the same x200 scale) must
    decode to EXACTLY round(pc*200)/200 on device, and the end-to-end
    accumulation must match the float32-transfer path within the 5 mm
    input-quantization effect."""
    import jax.numpy as jnp
    frames = _frames()
    a_q = _make_accum(seed=5, transfer_dtype='quantized')
    # Decode unit check against the host-side quantization oracle.
    pc = frames[0][1]
    pc_pad, valid = a_q._pad_pc(np.asarray(pc, np.float32))
    assert pc_pad.dtype == jnp.uint8
    n_cap = a_q.accum_cfg.max_points_per_frame
    assert pc_pad.shape == (7 * n_cap,)
    xyz = np.asarray(
        jnp.asarray(np.frombuffer(np.asarray(pc_pad)[:6 * n_cap].tobytes(),
                                  np.int16).reshape(n_cap, 3), jnp.float32))
    # Oracle in f32, matching _pad_pc's arithmetic (f64 would round
    # differently on exact .5 boundaries).
    want = np.round(np.asarray(pc, np.float32) * np.float32(200.0))
    n = pc.shape[0]
    np.testing.assert_array_equal(xyz[:n], want[:, :3])
    np.testing.assert_array_equal(
        np.asarray(pc_pad)[6 * n_cap:6 * n_cap + n].astype(np.float32),
        want[:, 3])
    # End-to-end: quantized vs float32 transfer, same RNG.
    a_f = _make_accum(seed=5, transfer_dtype='float32')
    a_q.integrate([frames[0]])
    a_f.integrate([frames[0]])
    for i in range(1, 4):
        bq = a_q.step([frames[i]], bev_num=2, gen_future=True)
        bf = a_f.step([frames[i]], bev_num=2, gen_future=True)
        assert a_q.window_start == a_f.window_start
        np.testing.assert_allclose(np.array(a_q.poses),
                                   np.array(a_f.poses), atol=2e-2)
        for sq, sf in zip(bq, bf):
            for k in sq:
                if k.startswith('trajs') or k == 'gt_lanes':
                    continue
                # 5 mm input quantization shifts the ICP pose estimates
                # slightly; the resulting near-rigid map offset moves a
                # few percent of boundary cells. Compare by mismatch
                # fraction with headroom for that pose amplification
                # (at P=64 a 2 cm pose shift flips several percent of
                # boundary cells; the poses assertion above is the tight
                # one).
                mism = np.mean(np.abs(np.asarray(sq[k], np.float32)
                                      - np.asarray(sf[k], np.float32))
                               > 2e-2)
                assert mism < 0.08, (k, mism)


def test_step_prepped_raster_matches_classic():
    """The split prep + prepped-raster fast path (core.make_prep_fn +
    make_prepped_raster_fn, forced on with interpret-mode Pallas) must
    equal the classic step path sample for sample."""
    frames = _frames()
    a_cls = _make_accum(seed=11)     # classic full raster per sample
    a_pre = _make_accum(seed=11)     # prepped fast path
    gen = a_pre.sem_bev_generator
    gen.use_prepped_raster = True
    gen._prep_interpret = True
    a_cls.integrate([frames[0]])
    a_pre.integrate([frames[0]])
    for i in range(1, 6):
        bevs_c = a_cls.step([frames[i]], bev_num=2, gen_future=True)
        bevs_p = a_pre.step([frames[i]], bev_num=2, gen_future=True)
        for bc, bp in zip(bevs_c, bevs_p):
            for k in bc:
                if k.startswith('trajs') or k == 'gt_lanes':
                    continue
                # Classic CPU path uses the XLA (2-key sort) formulation;
                # the prepped path uses the packed Pallas formulation —
                # intensity differs by the u16 payload quantization, all
                # other channels by f16-stack rounding only.
                np.testing.assert_allclose(
                    np.asarray(bc[k], np.float32),
                    np.asarray(bp[k], np.float32), atol=2e-3, err_msg=k)


def test_upload_obs_device_path_matches_raw():
    """Pre-uploaded DeviceObs (accum.upload_obs, the double-buffered
    host->device transfer used by bench.py) must be byte-equivalent to
    passing raw (rgb, pc, sem_gt) tuples, for both transfer encodings."""
    from pc_accumulation_lib_tpu.accum.kitti360 import DeviceObs
    frames = _frames()
    for dtype in ('float32', 'quantized'):
        a_raw = _make_accum(seed=13, transfer_dtype=dtype)
        a_dev = _make_accum(seed=13, transfer_dtype=dtype)
        a_raw.integrate([frames[0]])
        dob0 = a_dev.upload_obs(frames[0])
        assert isinstance(dob0, DeviceObs)
        assert a_dev.upload_obs(dob0) is dob0   # idempotent
        a_dev.integrate([dob0])
        for i in range(1, 5):
            br = a_raw.step([frames[i]], bev_num=2, gen_future=True)
            bd = a_dev.step([a_dev.upload_obs(frames[i])], bev_num=2,
                            gen_future=True)
            assert a_raw.window_start == a_dev.window_start
            np.testing.assert_array_equal(np.asarray(a_raw.poses),
                                          np.asarray(a_dev.poses))
            for sr, sd in zip(br, bd):
                for k in sr:
                    if k.startswith('trajs'):
                        continue
                    np.testing.assert_array_equal(
                        np.asarray(sr[k]), np.asarray(sd[k]), err_msg=k)
