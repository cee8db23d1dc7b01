"""YUV 4:2:0 image wire codec (ops/imgcodec.py) and its accumulator
integration (img_transfer='yuv420').

The codec halves the camera upload bytes of the upload-bound modes; these
tests pin (a) device decode == numpy oracle, (b) bit-exact grayscale
roundtrip, (c) bounded chroma error on smooth content, (d) end-to-end
fused-step equivalence on grayscale frames (where the encoding is exact by
construction, so the whole integrate must match bit-for-bit), and (e) a
bounded painted-color delta on color frames.
"""
import numpy as np
import pytest

from pc_accumulation_lib_tpu.ops import imgcodec


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_native_encoder_matches_numpy_spec_bit_exactly():
    # The C++ kernel (native/imgenc.cpp) and the integer-numpy reference
    # implement the same 8.8 fixed-point spec; when the native build is
    # available the two must agree bit-for-bit on every input, including
    # the chroma-clip edges (pure blue saturates U past 255).
    rng = _rng(11)
    imgs = rng.integers(0, 256, size=(3, 10, 16, 3), dtype=np.uint8)
    imgs[0, :2, :2] = (0, 0, 255)   # U-clip edge
    imgs[0, :2, 2:4] = (255, 0, 0)  # V-clip edge
    y_ref, uv_ref = imgcodec.encode_yuv420_np(imgs)
    y, uv = imgcodec.encode_yuv420(imgs)   # native when buildable
    np.testing.assert_array_equal(y, y_ref)
    np.testing.assert_array_equal(uv, uv_ref)
    # 2-D (single image) shape path.
    y1, uv1 = imgcodec.encode_yuv420(imgs[1])
    np.testing.assert_array_equal(y1, y_ref[1])
    np.testing.assert_array_equal(uv1, uv_ref[1])


def test_device_decode_matches_numpy_oracle():
    rgb = _rng(1).integers(0, 256, size=(2, 8, 12, 3), dtype=np.uint8)
    y, uv = imgcodec.encode_yuv420(rgb)
    assert y.shape == (2, 8, 12) and y.dtype == np.uint8
    assert uv.shape == (2, 4, 6, 2) and uv.dtype == np.uint8
    ref = imgcodec.decode_yuv420_np(y, uv)
    dev = np.asarray(imgcodec.decode_yuv420(y, uv))
    assert ref.dtype == np.float32 and dev.dtype == np.float32
    np.testing.assert_allclose(dev, ref, atol=1e-3)


def test_grayscale_roundtrips_bit_exactly():
    # R=G=B => Y = (0.299+0.587+0.114) v = v and U=V=128 exactly, so the
    # decode returns the input values exactly (after the u8 round).
    v = _rng(2).integers(0, 256, size=(10, 16), dtype=np.uint8)
    rgb = np.stack([v, v, v], axis=-1)
    y, uv = imgcodec.encode_yuv420(rgb)
    assert np.array_equal(y, v)
    assert np.all(uv == 128)
    out = imgcodec.decode_yuv420_np(y, uv)
    np.testing.assert_array_equal(np.rint(out).astype(np.uint8), rgb)


def test_chroma_constant_blocks_roundtrip_tightly():
    # Colors constant over each 2x2 block: the box mean is lossless, so
    # the only error is the u8 quantization of Y/U/V (<= 0.5 each plane,
    # amplified by the inverse matrix to ~2 in RGB).
    rng = _rng(3)
    small = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    rgb = np.repeat(np.repeat(small, 2, axis=0), 2, axis=1)
    y, uv = imgcodec.encode_yuv420(rgb)
    out = imgcodec.decode_yuv420_np(y, uv)
    assert np.max(np.abs(out - rgb.astype(np.float32))) <= 2.0


def test_smooth_gradient_error_bound():
    # A smooth radiometric gradient (what camera content looks like away
    # from edges): chroma varies slowly so the 2x2 subsample loses little.
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([yy * 3 + 20, xx * 2 + 40, (yy + xx) * 1.5],
                   axis=-1).clip(0, 255).astype(np.uint8)
    y, uv = imgcodec.encode_yuv420(rgb)
    out = imgcodec.decode_yuv420_np(y, uv)
    assert np.max(np.abs(out - rgb.astype(np.float32))) <= 6.0
    assert np.mean(np.abs(out - rgb.astype(np.float32))) <= 1.5


def test_odd_dims_rejected():
    with pytest.raises(ValueError):
        imgcodec.encode_yuv420(np.zeros((7, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        imgcodec.encode_yuv420(np.zeros((8, 9, 3), np.uint8))


# --- yuv420h (4-bit Haar luma + 4x4 chroma, 0.75 B/px) -----------------


def test_yuv420h_native_matches_numpy_spec_bit_exactly():
    rng = _rng(21)
    imgs = rng.integers(0, 256, size=(3, 12, 16, 3), dtype=np.uint8)
    imgs[0, :4, :4] = (0, 0, 255)   # chroma clip edges
    imgs[0, :4, 4:8] = (255, 0, 0)
    imgs[1, :2, :2] = 255           # hard luma edge (detail clamp)
    ref = imgcodec.encode_yuv420h_np(imgs)
    got = imgcodec.encode_yuv420h(imgs)   # native when buildable
    for a, b, nm in zip(ref, got, ('ll', 'det', 'uv')):
        np.testing.assert_array_equal(b, a, err_msg=nm)
    # 2-D (single image) shape path.
    one = imgcodec.encode_yuv420h(imgs[1])
    for a, b in zip(one, ref):
        np.testing.assert_array_equal(a, b[1])


def test_yuv420h_device_decode_matches_numpy_oracle():
    rgb = _rng(22).integers(0, 256, size=(2, 8, 16, 3), dtype=np.uint8)
    ll, det, uv = imgcodec.encode_yuv420h(rgb)
    assert ll.shape == (2, 4, 8) and det.shape == (2, 3, 4, 4)
    assert uv.shape == (2, 2, 4, 2)
    # 0.75 B/px wire total.
    assert ll.nbytes + det.nbytes + uv.nbytes == 2 * 8 * 16 * 3 // 4
    ref = imgcodec.decode_yuv420h_np(ll, det, uv)
    dev = np.asarray(imgcodec.decode_yuv420h(ll, det, uv))
    np.testing.assert_allclose(dev, ref, atol=1e-3)


def test_yuv420h_flat_blocks_roundtrip_exactly():
    # Constant 4x4 blocks: Haar details are 0 and chroma means lossless,
    # so only the u8 Y/U/V rounding remains (<= ~2 in RGB).
    rng = _rng(23)
    small = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    rgb = np.repeat(np.repeat(small, 4, axis=0), 4, axis=1)
    out = imgcodec.decode_yuv420h_np(*imgcodec.encode_yuv420h_np(rgb))
    assert np.max(np.abs(out - rgb.astype(np.float32))) <= 2.0


def test_yuv420h_smooth_gradient_error_bound():
    # Camera-like smooth content: the 4-bit quantizer's half-step error
    # dominates (<= 8 on the 2x sum scale -> <= ~6.5 luma/pixel) plus the
    # coarser chroma.
    h, w = 32, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([yy * 3 + 20, xx * 2 + 40, (yy + xx) * 1.5],
                   axis=-1).clip(0, 255).astype(np.uint8)
    out = imgcodec.decode_yuv420h_np(*imgcodec.encode_yuv420h_np(rgb))
    assert np.max(np.abs(out - rgb.astype(np.float32))) <= 8.0
    assert np.mean(np.abs(out - rgb.astype(np.float32))) <= 2.5


def test_yuv420h_luma_edge_clamps_boundedly():
    # A full-swing 2x2 luma edge exceeds the 4-bit detail range: the
    # reconstruction must stay between the two sides (pulled toward the
    # block mean), never ring outside [min, max] of the block.
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, 4:] = 255
    out = imgcodec.decode_yuv420h_np(*imgcodec.encode_yuv420h_np(rgb))
    assert out.min() >= 0.0 and out.max() <= 255.0
    # Columns away from the edge are flat blocks -> near-exact.
    assert np.max(np.abs(out[:, :2] - 0.0)) <= 2.0
    assert np.max(np.abs(out[:, 6:] - 255.0)) <= 2.0


def test_yuv420h_dims_rejected():
    with pytest.raises(ValueError):
        imgcodec.encode_yuv420h(np.zeros((6, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        imgcodec.encode_yuv420h(np.zeros((8, 10, 3), np.uint8))


def test_wire_dispatch_helpers():
    rgb = _rng(24).integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    for kind in ('yuv420', 'yuv420h'):
        parts = imgcodec.encode_wire(rgb, kind)
        out = np.asarray(imgcodec.decode_wire(parts))
        assert out.shape == (8, 16, 3)
    with pytest.raises(ValueError):
        imgcodec.encode_wire(rgb, 'jpeg')
    with pytest.raises(ValueError):
        imgcodec.decode_wire((rgb,))


def _kitti_accum(img_transfer, seed=0):
    from pc_accumulation_lib_tpu import config as cfg
    from pc_accumulation_lib_tpu.accum.kitti360 import (
        Kitti360SemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import make_calib
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU

    H_cam_velo, H_velo_cam, P_cam_frame = make_calib((32, 64))
    calib = dict(h_velo_cam=H_velo_cam, p_cam_frame=P_cam_frame,
                 p_velo_frame=P_cam_frame @ H_velo_cam)
    model = SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1))
    return Kitti360SemanticPointCloudAccumulator(
        horizon_dist=200., calib_params=calib, icp_threshold=1e3,
        semseg_model=model,
        bev_params=dict(type='sem', view_size=40, pixel_size=64),
        accum_cfg=cfg.AccumConfig(max_points_per_frame=2048, max_frames=8,
                                  max_painted_points_per_frame=2048),
        seed=seed, img_transfer=img_transfer)


def _synthetic_obs(n_frames, gray=True, seed=0):
    rng = np.random.default_rng(seed)
    obs = []
    for i in range(n_frames):
        if gray:
            v = rng.integers(0, 256, size=(32, 64), dtype=np.uint8)
            img = np.stack([v, v, v], axis=-1)
        else:
            # Smooth color content (camera-like): random low-frequency
            # gradients, NOT per-pixel noise — chroma subsampling on
            # white noise averages 4 independent colors per block, which
            # no real image exhibits.
            yy, xx = np.mgrid[0:32, 0:64].astype(np.float32)
            c = rng.uniform(-2, 2, size=(3, 3))
            img = np.stack([
                c[k, 0] * yy + c[k, 1] * xx + c[k, 2] * (yy + xx) / 2 + 128
                for k in range(3)], axis=-1).clip(0, 255).astype(np.uint8)
        pc = np.zeros((512, 4), np.float32)
        pc[:, 0] = rng.uniform(2, 30, 512)
        pc[:, 1] = rng.uniform(-8, 8, 512)
        pc[:, 2] = rng.uniform(-1.5, 1.0, 512)
        pc[:, 3] = rng.uniform(0, 1, 512)
        pc[:, 0] += 0.5 * i
        obs.append((img, pc, None))
    return obs


def test_kitti_yuv420_step_bit_exact_on_grayscale():
    # Grayscale frames encode losslessly, so the ENTIRE fused integrate
    # (semseg forward -> paint -> insert) must produce an identical buffer
    # under img_transfer='yuv420' vs 'rgb8'.
    frames = _synthetic_obs(3, gray=True)
    a = _kitti_accum('rgb8')
    b = _kitti_accum('yuv420')
    a.integrate(frames)
    b.integrate(frames)
    np.testing.assert_array_equal(np.asarray(a.state.points),
                                  np.asarray(b.state.points))
    np.testing.assert_array_equal(np.asarray(a.state.valid),
                                  np.asarray(b.state.valid))


def test_kitti_yuv420_painted_colors_bounded_on_color_frames():
    # Smooth color frames (camera-like content): the painted RGB columns
    # must track the rgb8 run tightly.
    frames = _synthetic_obs(2, gray=False, seed=3)
    a = _kitti_accum('rgb8')
    b = _kitti_accum('yuv420')
    a.integrate(frames)
    b.integrate(frames)
    va = np.asarray(a.state.valid)
    pa = np.asarray(a.state.points)[va]
    pb = np.asarray(b.state.points)[np.asarray(b.state.valid)]
    assert pa.shape[0] == pb.shape[0] > 0
    # Geometry (xyz, intensity) is untouched by the image encoding.
    np.testing.assert_allclose(pa[:, :4], pb[:, :4], atol=1e-5)
    # Colors: tight mean delta on smooth content (u8 scale 0-255).
    assert np.mean(np.abs(pa[:, 4:7] - pb[:, 4:7])) < 4.0


def test_luma_preserved_even_on_noise():
    # Per-pixel color noise is the adversarial case for chroma
    # subsampling (each 2x2 block averages 4 independent colors), but
    # LUMA rides the full-resolution Y plane: re-deriving Y from the
    # decoded RGB must match the original image's luma to quantization.
    rgb = _rng(7).integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    y, uv = imgcodec.encode_yuv420(rgb)
    out = imgcodec.decode_yuv420_np(y, uv)
    luma = lambda a: (0.299 * a[..., 0] + 0.587 * a[..., 1]  # noqa: E731
                      + 0.114 * a[..., 2])
    # Chroma clipping at 0/255 can leak into re-derived luma; bound the
    # bulk (99%) tightly and the tail loosely.
    err = np.abs(luma(out) - luma(rgb.astype(np.float32)))
    assert np.quantile(err, 0.99) <= 3.0
    assert err.mean() <= 1.0


def test_kitti_yuv420h_painted_colors_bounded_on_color_frames():
    # The 0.75 B/px codec end-to-end through the fused KITTI step: painted
    # geometry identical, colors bounded on smooth (camera-like) frames.
    frames = _synthetic_obs(2, gray=False, seed=3)
    a = _kitti_accum('rgb8')
    b = _kitti_accum('yuv420h')
    a.integrate(frames)
    b.integrate(frames)
    pa = np.asarray(a.state.points)[np.asarray(a.state.valid)]
    pb = np.asarray(b.state.points)[np.asarray(b.state.valid)]
    assert pa.shape[0] == pb.shape[0] > 0
    np.testing.assert_allclose(pa[:, :4], pb[:, :4], atol=1e-5)
    assert np.mean(np.abs(pa[:, 4:7] - pb[:, 4:7])) < 6.0


def test_oracle_yuv420_matches_rgb8_on_grayscale():
    from pc_accumulation_lib_tpu import config as cfg
    from pc_accumulation_lib_tpu.accum.nuscenes_oracle import (
        NuScenesOracleSemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticNuScenesStream)
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU

    stream = SyntheticNuScenesStream(n_frames=3, seed=0, img_hw=(32, 64))
    accum_cfg = cfg.AccumConfig(max_points_per_frame=16384, max_frames=8,
                                max_painted_points_per_frame=16384)

    def build(img_transfer):
        return NuScenesOracleSemanticPointCloudAccumulator(
            semseg_model=SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1)),
            bev_params=dict(type='sem', view_size=40, pixel_size=64),
            loc='synth', accum_cfg=accum_cfg, seed=0,
            img_transfer=img_transfer)

    def grayify(frame):
        f = dict(frame)
        f['images'] = [
            np.repeat(np.asarray(im)[..., :1], 3, axis=-1)
            for im in frame['images']]
        return f

    frames = [grayify(stream.frame(i)) for i in range(3)]
    a, b = build('rgb8'), build('yuv420')
    for f in frames:
        a.integrate([f])
        b.integrate([f])
    np.testing.assert_array_equal(np.asarray(a.state.points),
                                  np.asarray(b.state.points))
    np.testing.assert_array_equal(np.asarray(a.state.valid),
                                  np.asarray(b.state.valid))
