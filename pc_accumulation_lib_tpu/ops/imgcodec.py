"""YUV 4:2:0 wire codec for host->device camera-image uploads.

The oracle NuScenes mode is UPLOAD-bound on a remote-TPU link: 6 cameras of
u8 RGB are ~6.5 MB/frame, and throughput tracks link speed almost 1:1
(PERF_NOTES.md). The reference pays the equivalent cost as full float32
CHW tensors to its GPU (utils/onnx_utils.py:35-41 builds the normalized
torch tensor on host and session.run ships it) — 12 B/pixel vs our 3 B/pixel
u8 baseline. This codec halves the u8 wire again: Y at full resolution plus
U,V subsampled 2x2 = 1.5 B/pixel, decoded back to RGB on device before the
semseg forward and point painting.

Fidelity: NuScenes camera JPEGs are themselves chroma-subsampled 4:2:0, so
for that data the encoding discards information the source never had (our
2x2 chroma means are re-derived from the decoder's upsampled planes, not
bit-identical to the original coefficients, but of the same resolution).
KITTI-360 rect images are PNG (lossless), so there it is a genuine lossy
step bounded by chroma quantization — opt-in via the accumulators'
``img_transfer='yuv420'`` and measured in tests/test_imgcodec.py. Grayscale
content roundtrips bit-exactly (U=V=128, Y=R=G=B).

Color space: BT.601 full-range ("JPEG" YCbCr), the same matrix NuScenes
JPEGs use. Chroma downsample is a 2x2 box mean; upsample is nearest
(2x2 repeat) — chosen over bilinear so the device decode is three
elementwise FMAs plus a repeat, exactly reproducible by the numpy oracle.

The ENCODER is specified in 8.8 integer fixed point (coefficients x256,
rounding bias, shift) so the vectorized-numpy reference and the native C++
kernel (native/imgenc.cpp, GIL-released — the encode runs on the upload
worker thread of a single-core host, where float numpy's ~18 ms/frame was
real contention) are BIT-IDENTICAL by construction; parity is asserted in
tests/test_imgcodec.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

# BT.601 full-range coefficients, 8.8 fixed point (x256):
#   Y =  77 R + 150 G +  29 B          (77+150+29 = 256: grayscale exact)
#   U = -43 R -  85 G + 128 B + 128<<8
#   V = 128 R - 107 G -  21 B + 128<<8
# Inverse (float, on device):
_VR = 1.402           # R = Y + 1.402 (V-128)
_UG = 0.344136        # G = Y - 0.344136 (U-128) - 0.714136 (V-128)
_VG = 0.714136
_UB = 1.772           # B = Y + 1.772 (U-128)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_enc_lock = threading.Lock()
_enc_lib = None
_enc_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _enc_lib, _enc_failed
    if _enc_lib is not None:
        return _enc_lib
    with _enc_lock:
        if _enc_lib is not None or _enc_failed:
            return _enc_lib
        src = os.path.join(_NATIVE_DIR, 'imgenc.cpp')
        so = os.path.join(_NATIVE_DIR, 'libimgenc.so')
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.imgenc_yuv420.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.imgenc_yuv420.restype = ctypes.c_int
            _enc_lib = lib
        except Exception as e:  # toolchain-less host: numpy path
            # stderr: bench.py's stdout contract is ONE JSON line.
            print(f'imgenc build failed ({e}); using numpy encode',
                  file=sys.stderr)
            _enc_failed = True
        return _enc_lib


def encode_yuv420_np(rgb: np.ndarray):
    """Reference encoder (vectorized integer numpy) — the SPEC the native
    kernel reproduces bit-for-bit. RGB u8 (..., H, W, 3) ->
    (y u8 (..., H, W), uv u8 (..., H/2, W/2, 2)). H, W must be even."""
    rgb = np.asarray(rgb)
    h, w = rgb.shape[-3], rgb.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f'yuv420 needs even image dims, got {h}x{w}')
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y16 = 77 * r + 150 * g + 29 * b               # 8.8 fixed, [0, 255<<8]
    y8 = ((y16 + 128) >> 8).astype(np.uint8)
    u16 = -43 * r - 85 * g + 128 * b + (128 << 8)  # 8.8 fixed
    v16 = 128 * r - 107 * g - 21 * b + (128 << 8)
    # 2x2 box mean in fixed point: sum 4, round, shift 8+2.
    sh = u16.shape[:-2] + (h // 2, 2, w // 2, 2)
    u2 = (u16.reshape(sh).sum(axis=(-3, -1)) + 512) >> 10
    v2 = (v16.reshape(sh).sum(axis=(-3, -1)) + 512) >> 10
    uv8 = np.clip(np.stack([u2, v2], axis=-1), 0, 255).astype(np.uint8)
    return y8, uv8


def encode_yuv420(rgb: np.ndarray):
    """Host-side encode: native C++ kernel when buildable (GIL-released,
    ~5x the numpy reference on one core), else the numpy reference —
    bit-identical either way."""
    rgb = np.asarray(rgb)
    h, w = rgb.shape[-3], rgb.shape[-2]
    if h % 2 or w % 2:
        raise ValueError(f'yuv420 needs even image dims, got {h}x{w}')
    lib = _load_native()
    if lib is None or rgb.shape[-1] != 3:
        return encode_yuv420_np(rgb)
    lead = rgb.shape[:-3]
    n = int(np.prod(lead, dtype=np.int64)) if lead else 1
    rgb_c = np.ascontiguousarray(rgb.reshape(n, h, w, 3))
    y = np.empty((n, h, w), np.uint8)
    uv = np.empty((n, h // 2, w // 2, 2), np.uint8)
    rc = lib.imgenc_yuv420(rgb_c.ctypes.data, n, h, w,
                           y.ctypes.data, uv.ctypes.data)
    if rc != 0:
        raise RuntimeError(f'imgenc_yuv420 failed (rc={rc})')
    return y.reshape(lead + (h, w)), uv.reshape(lead + (h // 2, w // 2, 2))


def _decode(y, uv, xp):
    yf = y.astype(xp.float32)
    u = uv[..., 0].astype(xp.float32) - 128.0
    v = uv[..., 1].astype(xp.float32) - 128.0
    # Nearest (2x2 repeat) chroma upsample.
    u = xp.repeat(xp.repeat(u, 2, axis=-1), 2, axis=-2)
    v = xp.repeat(xp.repeat(v, 2, axis=-1), 2, axis=-2)
    r = yf + _VR * v
    g = yf - _UG * u - _VG * v
    b = yf + _UB * u
    return xp.clip(xp.stack([r, g, b], axis=-1), 0.0, 255.0)


def decode_yuv420(y, uv):
    """Device decode: (y u8, uv u8) -> RGB float32 (..., H, W, 3) in
    [0, 255] — the dtype/range contract of the fused integrate steps'
    image input (semseg normalization happens downstream,
    models/resnet_semseg.preprocess)."""
    import jax.numpy as jnp
    return _decode(y, uv, jnp)


def decode_yuv420_np(y, uv) -> np.ndarray:
    """Numpy oracle for the device decode — same formula, same order of
    operations (tests pin the two against each other)."""
    return _decode(np.asarray(y), np.asarray(uv), np)
