"""Quantized 13 B/point NuScenes row packing (accum/pointpack.py) and its
oracle-accumulator integration (transfer_dtype='quantized')."""
import numpy as np
import pytest

from pc_accumulation_lib_tpu.accum import pointpack


def _rows(n, seed=0):
    rng = np.random.default_rng(seed)
    pc = np.zeros((n, 7), np.float32)
    pc[:, 0:3] = rng.uniform(-90, 90, size=(n, 3))
    pc[:, 3] = rng.uniform(0, 255, size=n)
    pc[:, 4] = rng.uniform(0, 1599, size=n)
    pc[:, 5] = rng.uniform(0, 899, size=n)
    pc[:, 6] = rng.integers(-1, 40, size=n)
    return pc


def test_roundtrip_quantization_bounds():
    pc = _rows(500)
    buf = pointpack.pack_points7_np(pc, 512)
    assert buf.dtype == np.uint8
    assert buf.size == 512 * pointpack.BYTES_PER_POINT
    out = np.asarray(pointpack.unpack_points7(buf, 512))
    assert out.shape == (512, 7)
    # xyz: 5 mm fixed point -> error <= 2.5 mm.
    assert np.max(np.abs(out[:500, :3] - pc[:, :3])) <= 0.0025 + 1e-6
    # intensity: u8 round on the native 0..255 scale.
    assert np.max(np.abs(out[:500, 3] - pc[:, 3])) <= 0.5 + 1e-5
    # u, v: nearest-pixel round (the device paint rounds anyway).
    np.testing.assert_array_equal(out[:500, 4:6], np.round(pc[:, 4:6]))
    # inst: exact (integers).
    np.testing.assert_array_equal(out[:500, 6], pc[:, 6])
    # padding decodes to the zero row (inst -1+1=0 packs as 0 -> -1).
    assert np.all(out[500:, :6] == 0) and np.all(out[500:, 6] == -1)


def test_integer_rows_roundtrip_exactly():
    # Integer-valued intensity (the real sensor scale) and integer uv are
    # bit-exact through the pack.
    pc = _rows(100, seed=1)
    pc[:, 3] = np.round(pc[:, 3])
    pc[:, 4:6] = np.round(pc[:, 4:6])
    out = np.asarray(pointpack.unpack_points7(
        pointpack.pack_points7_np(pc, 128), 128))
    np.testing.assert_array_equal(out[:100, 3:7], pc[:, 3:7])


def test_range_violations_raise():
    pc = _rows(10)
    bad = pc.copy()
    bad[0, 0] = 200.0      # > 163.84 m
    with pytest.raises(ValueError, match='coordinate range'):
        pointpack.pack_points7_np(bad, 16)
    bad = pc.copy()
    bad[0, 3] = 300.0      # > u8
    with pytest.raises(ValueError, match='intensity range'):
        pointpack.pack_points7_np(bad, 16)
    bad = pc.copy()
    bad[0, 6] = 70000.0    # > u16-1
    with pytest.raises(ValueError, match='instance index'):
        pointpack.pack_points7_np(bad, 16)
    with pytest.raises(ValueError, match='points > pad'):
        pointpack.pack_points7_np(pc, 4)


def test_unprojected_uv_clamps_to_wire_range():
    pc = _rows(4)
    pc[0, 4:6] = (-7.0, -3.0)       # unprojected marker (cam_idx -1)
    pc[1, 4:6] = (70000.0, 1.0)
    out = np.asarray(pointpack.unpack_points7(
        pointpack.pack_points7_np(pc, 8), 8))
    assert out[0, 4] == 0 and out[0, 5] == 0
    assert out[1, 4] == 65535


def test_oracle_quantized_transfer_matches_float32():
    """End-to-end: oracle integrate with transfer_dtype='quantized' must
    match the float32 upload to quantization error — and the painted sem/
    rgb/inst/dyn columns exactly (the uv gather rounds either way; frames
    are grayscale so the image path is shared)."""
    from pc_accumulation_lib_tpu import config as cfg
    from pc_accumulation_lib_tpu.accum.nuscenes_oracle import (
        NuScenesOracleSemanticPointCloudAccumulator)
    from pc_accumulation_lib_tpu.dataloaders.synthetic import (
        SyntheticNuScenesStream)
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU

    stream = SyntheticNuScenesStream(n_frames=3, seed=0, img_hw=(32, 64))
    accum_cfg = cfg.AccumConfig(max_points_per_frame=16384, max_frames=8,
                                max_painted_points_per_frame=16384)

    def build(transfer_dtype):
        return NuScenesOracleSemanticPointCloudAccumulator(
            semseg_model=SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1)),
            bev_params=dict(type='sem', view_size=40, pixel_size=64),
            loc='synth', accum_cfg=accum_cfg, seed=0,
            transfer_dtype=transfer_dtype)

    frames = [stream.frame(i) for i in range(3)]
    a, b = build('float32'), build('quantized')
    for f in frames:
        a.integrate([f])
        b.integrate([f])
    va, vb = np.asarray(a.state.valid), np.asarray(b.state.valid)
    np.testing.assert_array_equal(va, vb)
    pa, pb = np.asarray(a.state.points)[va], np.asarray(b.state.points)[vb]
    # World xyz differs by the 5 mm quantization propagated through the
    # (rigid) ego->world transform.
    assert np.max(np.abs(pa[:, :3] - pb[:, :3])) < 0.01
    # Intensity within the u8 round (paint divides by 255).
    assert np.max(np.abs(pa[:, 3] - pb[:, 3])) <= 0.5 / 255 + 1e-6
    # Per-row sem/inst/dyn agreement must be overwhelming; the gathered
    # rgb/sem can differ only where a u/v half-pixel round crossed a
    # pixel boundary (u8 round-half-even vs the device f32 round).
    same = np.mean(np.all(pa[:, 7:10] == pb[:, 7:10], axis=1))
    assert same > 0.995
