"""Quantized wire packing for the NuScenes 7-column point rows.

The oracle mode's per-frame upload is dominated by the 6-camera image
stack, but the padded float32 point buffer is the next ~1.75 MB
(65536 x 7 x 4 B at the bench config). The rows are
[x, y, z (ego frame, m), intensity (0..255), u, v (pixel), inst
(first-appearance index, -1 = none)] (dataloaders/nuscenes.py
feature_rows; reference nuscenes_obs_dataloader.py:103-122). Packed:

  xyz   -> int16 at 5 mm fixed point (+-163.84 m; NuScenes lidar tops
           out ~100 m in the ego frame) ... 6 B
  int   -> uint8 round (source is the sensor's own u8 0..255 scale;
           error <= 0.5 LSB of that scale)  ... 1 B
  u, v  -> uint16 round (the device paint gather rounds to the nearest
           pixel anyway — buffer.paint_frame_multicam:197-198 — so
           rounding at encode is semantics-preserving; out-of-image
           values clamp, matching the device-side clip of rows whose
           cam_idx already marks them invalid) ... 4 B
  inst  -> int16 (+1 biased so -1 = none packs as 0) ... 2 B

= 13 B/point vs 28: ~2.15x fewer wire bytes. Range violations raise
loudly (like the KITTI packed upload, accum/kitti360.py _pad_pc) —
use transfer_dtype='float32' for data outside these envelopes.
"""
from __future__ import annotations

import numpy as np

BYTES_PER_POINT = 13


def pack_points7_np(pc: np.ndarray, n_pad: int) -> np.ndarray:
    """(N,7) float -> (n_pad*13,) uint8 wire buffer (N <= n_pad)."""
    pc = np.asarray(pc, np.float32)
    n = pc.shape[0]
    if pc.ndim != 2 or pc.shape[1] != 7:
        raise ValueError(f'expected (N,7) rows, got {pc.shape}')
    if n > n_pad:
        raise ValueError(f'{n} points > pad {n_pad}')
    # NaN/inf would sail past the range checks below (NaN compares False;
    # min/max of an array containing NaN is NaN) and cast to int16/uint16
    # with undefined values — check finiteness first so the fail-loudly
    # contract holds like the float32 path's visible NaNs.
    if n and not np.isfinite(pc).all():
        bad = np.argwhere(~np.isfinite(pc))[0]
        raise ValueError(
            f'quantized upload: non-finite value at row {bad[0]} '
            f'col {bad[1]} ({pc[bad[0], bad[1]]!r}) — quantization would '
            f'be undefined; use transfer_dtype="float32" or clean the '
            f'input')
    xyz_scaled = np.round(pc[:, :3] * 200.0)
    if n and (xyz_scaled.min() < -32768 or xyz_scaled.max() > 32767):
        raise ValueError(
            f'quantized upload: coordinate range '
            f'[{pc[:, :3].min():.4g}, {pc[:, :3].max():.4g}] m outside '
            f'the i16-representable +-163.84 m')
    inten = np.round(pc[:, 3])
    if n and (inten.min() < 0 or inten.max() > 255):
        raise ValueError(
            f'quantized upload: intensity range '
            f'[{pc[:, 3].min():.4g}, {pc[:, 3].max():.4g}] outside u8 '
            f'(expected the sensor 0..255 scale)')
    inst = np.round(pc[:, 6]) + 1.0
    if n and (inst.min() < 0 or inst.max() > 65535):
        raise ValueError(
            f'quantized upload: instance index range '
            f'[{pc[:, 6].min():.4g}, {pc[:, 6].max():.4g}] outside u16-1')
    xyz = np.zeros((n_pad, 3), np.int16)
    xyz[:n] = xyz_scaled
    i8 = np.zeros(n_pad, np.uint8)
    i8[:n] = inten
    # uv: device paint clips into the image; clamp here to the wire
    # type's range only (negative/huge values mark unprojected points
    # whose cam_idx is already -1).
    uv = np.zeros((n_pad, 2), np.uint16)
    uv[:n] = np.clip(np.round(pc[:, 4:6]), 0, 65535)
    in16 = np.zeros(n_pad, np.uint16)
    in16[:n] = inst
    return np.concatenate([
        xyz.view(np.uint8).reshape(-1), i8,
        uv.view(np.uint8).reshape(-1), in16.view(np.uint8).reshape(-1)])


def unpack_points7(buf, n_pad: int):
    """Device inverse of pack_points7_np: (n_pad*13,) u8 -> (n_pad,7) f32."""
    import jax.lax
    import jax.numpy as jnp
    xyz = jax.lax.bitcast_convert_type(
        buf[:6 * n_pad].reshape(n_pad, 3, 2), jnp.int16).astype(jnp.float32)
    off = 6 * n_pad
    inten = buf[off:off + n_pad].astype(jnp.float32)
    off += n_pad
    uv = jax.lax.bitcast_convert_type(
        buf[off:off + 4 * n_pad].reshape(n_pad, 2, 2),
        jnp.uint16).astype(jnp.float32)
    off += 4 * n_pad
    inst = jax.lax.bitcast_convert_type(
        buf[off:off + 2 * n_pad].reshape(n_pad, 1, 2),
        jnp.uint16).astype(jnp.float32) - 1.0
    return jnp.concatenate(
        [xyz * (1.0 / 200.0), inten[:, None], uv, inst], axis=1)
