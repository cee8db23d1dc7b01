"""Transfer-engineering tests: batched single-fetch, quantized fetch, and
deferred (async) fetch must be output-equivalent to the float16 path."""
import numpy as np
import jax.numpy as jnp

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.bev import core
from pc_accumulation_lib_tpu.bev.sem_bev import SemBEVGenerator


def _random_cloud(rng, n=4096):
    pc = np.zeros((n, 10), np.float32)
    pc[:, 0:2] = rng.uniform(-30, 30, size=(n, 2))
    pc[:, 2] = rng.uniform(-2, 5, size=n)
    pc[:, 3] = rng.uniform(0, 1, size=n)
    pc[:, 4:7] = rng.integers(0, 256, size=(n, 3))
    pc[:, 7] = rng.choice([0, 2, 13, 15], size=n)
    return pc


def _gen(fetch_dtype, seed=7, **kw):
    return SemBEVGenerator(cfg.DEFAULT_SEM_IDXS, 80, 64, int_scaler=20.,
                           int_sep_scaler=20., int_mid_threshold=0.5,
                           seed=seed, fetch_dtype=fetch_dtype, **kw)


def test_quantize_roundtrip_bit_exact_elevation(rng):
    B, S, P = 2, 3, 32
    stack = rng.uniform(0, 1, (B, S * 7, P, P)).astype(np.float16)
    for s in range(S):
        stack[:, s * 7 + 6] = rng.uniform(-40, 40,
                                          (B, P, P)).astype(np.float16)
    raw = np.asarray(core.quantize_stack_batch(jnp.asarray(stack)))
    assert raw.dtype == np.uint8
    rec = core.dequantize_stack_batch(raw, True, P)
    assert rec.shape == stack.shape and rec.dtype == np.float16
    for s in range(S):
        # Elevation rides as bitcast float16: exact.
        np.testing.assert_array_equal(rec[:, s * 7 + 6], stack[:, s * 7 + 6])
        # u8 channels: worst case 1/510 quantization error.
        err = np.abs(rec[:, s * 7:s * 7 + 6].astype(np.float64)
                     - stack[:, s * 7:s * 7 + 6].astype(np.float64))
        assert err.max() <= 1.0 / 510 + 1e-3


def test_quantized_fetch_matches_float16(rng):
    pcs = {'pc_present': _random_cloud(rng), 'pc_future': _random_cloud(rng)}
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    bev_a = _gen('float16').generate(pcs, trajs)
    bev_b = _gen('quantized').generate(pcs, trajs)
    assert set(bev_a) == set(bev_b)
    for k in bev_a:
        if k.startswith('trajs') or k == 'gt_lanes':
            continue
        a = np.asarray(bev_a[k], np.float64)
        b = np.asarray(bev_b[k], np.float64)
        tol = 0.0 if k.startswith('elevation') else 1.0 / 510 + 1e-3
        assert np.abs(a - b).max() <= tol, (k, np.abs(a - b).max())


def _compare_bevs(bev_a, bev_b, quant_tol):
    assert set(bev_a) == set(bev_b)
    for k in bev_a:
        if k.startswith('trajs') or k == 'gt_lanes':
            continue
        a = np.asarray(bev_a[k], np.float64)
        b = np.asarray(bev_b[k], np.float64)
        tol = 0.0 if k.startswith('elevation') else quant_tol
        assert np.abs(a - b).max() <= tol, (k, np.abs(a - b).max())


def test_sparse_fetch_matches_float16(rng):
    pcs = {'pc_present': _random_cloud(rng), 'pc_future': _random_cloud(rng)}
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    bev_a = _gen('float16').generate(pcs, trajs)
    gen_b = _gen('sparse', sparse_cap=4096)
    bev_b = gen_b.generate(pcs, trajs)
    _compare_bevs(bev_a, bev_b, 1.0 / 510 + 1e-3)
    assert gen_b.sparse_overflows == 0   # the real sparse path ran
    # Undersized cap: same outputs via the overflow->dense fallback.
    gen_c = _gen('sparse', sparse_cap=1024)
    bev_c = gen_c.generate(pcs, trajs)
    _compare_bevs(bev_a, bev_c, 1.0 / 510 + 1e-3)
    assert gen_c.sparse_overflows > 0


def test_sparse_fetch_matches_with_warp_and_aug(rng):
    pcs = {'pc_present': _random_cloud(rng), 'pc_future': _random_cloud(rng)}
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    kw = dict(max_trans_radius=3.0, zoom_thresh=0.05, do_warp=True)
    bev_a = _gen('float16', **kw).generate(pcs, trajs, rot_ang=0.7,
                                           trans_dx=1.0, trans_dy=-2.0,
                                           zoom_scalar=1.03,
                                           do_warping=True)
    # Cap above this cloud's occupancy: the REAL sparse decode (+ fused
    # native warp) path must run, not the overflow->dense fallback.
    gen_b = _gen('sparse', sparse_cap=4096, **kw)
    bev_b = gen_b.generate(pcs, trajs, rot_ang=0.7,
                           trans_dx=1.0, trans_dy=-2.0,
                           zoom_scalar=1.03, do_warping=True)
    _compare_bevs(bev_a, bev_b, 1.0 / 510 + 1e-3)
    assert gen_b.sparse_overflows == 0


def test_sparse_overflow_falls_back_to_dense(rng):
    # Capacity of 128 cells with a dense 64x64 cloud -> every split
    # overflows; the dense fallback must kick in. The fallback stack is
    # quantized on device (u8 for the [0,1] channels, f16 elevation —
    # same error bound as fetch_dtype='quantized').
    pcs = {'pc_present': _random_cloud(rng, n=8192),
           'pc_future': _random_cloud(rng, n=8192)}
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    bev_a = _gen('float16').generate(pcs, trajs)
    gen_b = _gen('sparse', sparse_cap=128)
    bev_b = gen_b.generate(pcs, trajs)
    _compare_bevs(bev_a, bev_b, 1.0 / 510 + 1e-3)
    assert gen_b.sparse_overflows == 1
    assert gen_b.max_occupied > 128


def test_adaptive_fetch_matches_and_recovers(rng):
    """Second generate() call fetches through the adaptive byte hint
    (value sections packed by occupancy); a deliberately tiny hint must
    short-fetch, refetch the full buffer, and still be correct."""
    pcs = {'pc_present': _random_cloud(rng), 'pc_future': _random_cloud(rng)}
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    bev_ref = _gen('float16').generate(pcs, trajs)
    # Cap sized ABOVE this cloud's occupancy: the real sparse decode path
    # must run (the default cap overflows to the dense fallback here).
    gen_s = _gen('sparse', sparse_cap=4096)
    gen_s.generate(pcs, trajs)
    assert gen_s._fetch_hint_bytes.get(3) is not None
    assert gen_s.sparse_overflows == 0
    bev_b = gen_s.generate(pcs, trajs)   # hint-sliced fetch
    _compare_bevs(bev_ref, bev_b, 1.0 / 510 + 1e-3)
    assert gen_s.sparse_short_fetches == 0
    # Force an undersized hint: the decode must detect the truncation,
    # refetch the full buffer, and produce identical output.
    gen_s._fetch_hint_bytes[3] = core.sparse_header_bytes(
        gen_s.pixel_size, True) + 64
    bev_c = gen_s.generate(pcs, trajs)
    _compare_bevs(bev_ref, bev_c, 1.0 / 510 + 1e-3)
    assert gen_s.sparse_short_fetches > 0


def test_adaptive_hint_isolated_per_split_count(rng):
    """A hint learned on a gen_future=False (S=1) call must never apply
    to an S=3 fetch: S=1 buffers have a smaller header AND sections, so a
    shared hint could truncate the S=3 buffer below even its own header
    (unrecoverable without the per-S keying)."""
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    gen_s = _gen('sparse', sparse_cap=4096)
    pcs1 = {'pc_present': _random_cloud(rng)}
    gen_s.generate(pcs1, trajs)                      # S=1 call
    assert 1 in gen_s._fetch_hint_bytes
    assert 3 not in gen_s._fetch_hint_bytes
    pcs3 = {'pc_present': _random_cloud(rng), 'pc_future': _random_cloud(rng)}
    bev_ref = _gen('float16').generate(pcs3, trajs)
    bev_b = gen_s.generate(pcs3, trajs)              # S=3: own hint slot
    _compare_bevs(bev_ref, bev_b, 1.0 / 510 + 1e-3)
    assert 3 in gen_s._fetch_hint_bytes
    # Defensive header guard: even a below-header truncation recovers.
    gen_s._fetch_hint_bytes[3] = 8                   # absurd, < header
    bev_c = gen_s.generate(pcs3, trajs)
    _compare_bevs(bev_ref, bev_c, 1.0 / 510 + 1e-3)
    assert gen_s.sparse_short_fetches > 0


def test_async_fetch_defers_and_matches(rng):
    gen_sync = _gen('float16')
    gen_async = _gen('float16')
    pc = _random_cloud(rng)
    points, valid, fids, gen_future = gen_sync._pack_pcs(
        {'pc_present': pc, 'pc_future': _random_cloud(rng)})
    params = core.identity_params(window=(0, 1), present_frame=1)
    inst_dyn = jnp.zeros((1,), jnp.float32)
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [1, 0, 0]])}
    sync = gen_sync.generate_samples(points, valid, fids, inst_dyn, params,
                                     trajs, 3, gen_future)
    handle = gen_async.generate_samples(points, valid, fids, inst_dyn,
                                        params, trajs, 3, gen_future,
                                        async_fetch=True)
    assert callable(handle)
    deferred = handle()
    assert len(sync) == len(deferred) == 3
    for a, b in zip(sync, deferred):
        for k in a:
            if k.startswith('trajs'):
                continue
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]))


def test_native_decode_bit_parity_with_numpy(rng):
    """native/bevdec.cpp fused decode+warp must be BIT-identical to the
    numpy path (core.decode_sparse_stack + warp_dense_maps_np) on random
    sparse buffers, including the full-delta reconstruction and the
    no-warp and S=1 layouts."""
    from pc_accumulation_lib_tpu.bev import native_decode
    from pc_accumulation_lib_tpu.ops import warp as warp_ops
    if not native_decode.available():
        import pytest
        pytest.skip('native toolchain unavailable')
    empty = core.sparse_empty_values(20., 20., 0.5, 0)
    for P, caps, gen_future, warp_on in [
            (64, (512, 256, 512), True, True),
            (64, (512, 256, 512), True, False),
            (64, (512, 256, 512), False, True),
            (128, (4096, 2048, 4096), True, True),
            # Reference's large raster config (--bev_pixel_size 512):
            # covers the 512-layout header/section geometry cheaply.
            (512, (32768, 16384, 16384), True, True)]:
        S = 3 if gen_future else 1
        occ_p = rng.random(P * P) < 0.10
        occ_f = rng.random(P * P) < 0.05
        if S == 3:
            masks = [np.packbits(occ_p.astype(np.uint8)),
                     np.packbits(occ_f.astype(np.uint8))]
            # Full-delta section occupancy = present & future overlap.
            n_occ = np.array([occ_p.sum(), occ_f.sum(),
                              (occ_p & occ_f).sum()], np.int32)
        else:
            masks = [np.packbits(occ_p.astype(np.uint8))]
            n_occ = np.array([occ_p.sum()], np.int32)
        # v2 layout: [masks | n_occ padded to 16 B | value sections packed
        # contiguously by actual occupancy].
        pad = np.zeros(16 - 4 * S, np.uint8)
        vals = [rng.integers(0, 256, (n, 8), dtype=np.uint8).reshape(-1)
                for n in n_occ]
        raw = np.concatenate(masks + [n_occ.view(np.uint8), pad] + vals)
        if warp_on:
            a1, a2 = warp_ops.cal_warp_params(P // 2 + 10, P // 2, P - 1)
            b1, b2 = warp_ops.cal_warp_params(P // 2 - 8, P // 2, P - 1)
            w = dict(a1=a1, a2=a2, b1=b1, b2=b2, active=True)
        else:
            w = dict(a1=1., a2=0., b1=1., b2=0., active=False)
        ref = core.decode_sparse_stack(raw, gen_future, P, caps, empty)
        if w['active']:
            ref = warp_ops.warp_dense_maps_np(ref, w['a1'], w['a2'],
                                              w['b1'], w['b2'])
        got = native_decode.decode_sparse_warp(raw, gen_future, P, caps,
                                               empty, w)
        np.testing.assert_array_equal(ref.view(np.uint16),
                                      got.view(np.uint16))


def test_native_decode_overflow_short_and_malformed(rng):
    from pc_accumulation_lib_tpu.bev import native_decode
    if not native_decode.available():
        import pytest
        pytest.skip('native toolchain unavailable')
    import pytest
    P, caps = 64, (512, 256, 512)
    empty = core.sparse_empty_values(20., 20., 0.5, 0)
    header = [np.zeros(P * P // 8, np.uint8)] * 2
    n_occ = np.array([600, 0, 0], np.int32)  # > cap0
    raw = np.concatenate(header + [n_occ.view(np.uint8),
                                   np.zeros(4, np.uint8),
                                   np.zeros(600 * 8, np.uint8)])
    with pytest.raises(core.SparseOverflow):
        native_decode.decode_sparse_warp(raw, True, P, caps, empty, None)
    # Truncated adaptive fetch: header says 100 rows used, buffer holds 10.
    n_occ2 = np.array([100, 0, 0], np.int32)
    short = np.concatenate(header + [n_occ2.view(np.uint8),
                                     np.zeros(4, np.uint8),
                                     np.zeros(10 * 8, np.uint8)])
    with pytest.raises(core.SparseShortFetch):
        native_decode.decode_sparse_warp(short, True, P, caps, empty, None)
    with pytest.raises(core.SparseShortFetch):
        core.decode_sparse_stack(short, True, P, caps, empty)
    # Shorter than its own header: malformed — both decoders, with a
    # real message (not a raw numpy reshape error from the python path).
    with pytest.raises(ValueError):
        native_decode.decode_sparse_warp(raw[:100], True, P, caps, empty,
                                         None)
    with pytest.raises(ValueError, match='fixed header'):
        core.decode_sparse_stack(raw[:100], True, P, caps, empty)
    # Mask popcount disagreeing with the header n_occ: malformed (the
    # decode indexes value rows by mask rank, so trusting the smaller
    # header count would read past the buffer on an adaptive fetch).
    bad_mask = np.zeros(P * P // 8, np.uint8)
    bad_mask[0] = 0xF8                       # popcount 5
    n_occ3 = np.array([3, 0, 0], np.int32)   # header claims 3
    mismatch = np.concatenate(
        [bad_mask, np.zeros(P * P // 8, np.uint8), n_occ3.view(np.uint8),
         np.zeros(4, np.uint8), np.zeros(5 * 8, np.uint8)])
    with pytest.raises(ValueError):
        native_decode.decode_sparse_warp(mismatch, True, P, caps, empty,
                                         None)
