"""ctypes binding for the fused sparse-decode + warp native kernel
(native/bevdec.cpp), built on demand like utils/async_writer.py.

The harvest hot path (SemBEVGenerator._fetch_stack) decodes one packed
sparse buffer per BEV sample and applies the per-sample polynomial warp —
~3.5 ms/sample as separate numpy passes on this box's single core. The
native kernel fuses both into one pass over output pixels and releases the
GIL, so decode threads overlap the tunnel transfer waits for real.

Bit-parity with the numpy path (core.decode_sparse_stack +
warp_ops.warp_dense_maps_np) is guaranteed by construction — the dequant
LUT, empty-cell constants, and warp index maps are computed by the same
numpy code and passed in — and asserted by tests/test_fetch.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from pc_accumulation_lib_tpu.bev import core

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:      # lock-free fast path: available() runs per
        return _lib           # decoded sample on the 2-thread harvest pool
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        src = os.path.join(_NATIVE_DIR, 'bevdec.cpp')
        so = os.path.join(_NATIVE_DIR, 'libbevdec.so')
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ['g++', '-O3', '-shared', '-fPIC', '-o', so, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.bevdec_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.bevdec_decode.restype = ctypes.c_int
            _lib = lib
        except Exception as e:  # toolchain-less host: numpy fallback
            print(f'bevdec build failed ({e}); using numpy decode')
            _lib_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def _identity_map(P: int) -> np.ndarray:
    return np.arange(P, dtype=np.int32)


def _warp_maps(P: int, w) -> tuple:
    """Warp source-index maps, numpy-computed for bit-parity with
    warp_dense_maps_np (ops/warp.py:82-92)."""
    if w is None or not w['active']:
        ident = _identity_map(P)
        return ident, ident

    def idx_map(a1, a2, n):
        k = np.arange(n, dtype=np.float32)
        src = np.rint(np.float32(a1) * k
                      + np.float32(a2) * k * k).astype(np.int32)
        return np.clip(src, 0, n - 1)

    return idx_map(w['b1'], w['b2'], P), idx_map(w['a1'], w['a2'], P)


def decode_sparse_warp(raw: np.ndarray, gen_future: bool, pixel_size: int,
                       cap, empty_vals, w=None) -> np.ndarray:
    """Fused native equivalent of core.decode_sparse_stack followed by
    warp_ops.warp_dense_maps_np. Raises core.SparseOverflow on capacity
    overflow (caller falls back to the dense fetch), core.SparseShortFetch
    on a truncated adaptive fetch (caller refetches the full buffer),
    ValueError on a malformed buffer."""
    lib = _load()
    assert lib is not None, 'call available() first'
    P = pixel_size
    S = 3 if gen_future else 1
    caps = core.resolve_sparse_caps(cap)[:S]
    lut = core._DEQUANT_LUT.view(np.uint16)
    empty = np.asarray(list(empty_vals) + [0.0],
                       np.float16).view(np.uint16)
    row_src, col_src = _warp_maps(P, w)
    raw = np.ascontiguousarray(raw)
    out = np.empty((S * 7, P, P), np.float16)
    rc = lib.bevdec_decode(
        raw.ctypes.data, raw.nbytes, P, S, int(caps[0]),
        int(caps[1]) if S == 3 else 0, int(caps[2]) if S == 3 else 0,
        lut.ctypes.data, empty.ctypes.data,
        row_src.ctypes.data, col_src.ctypes.data,
        out.ctypes.data_as(ctypes.c_void_p))
    if rc == 0:
        return out
    if rc > 0:
        raise core.SparseOverflow(
            f'split {rc - 1}: occupied cells > sparse cap (native decode)')
    if rc == -2:
        raise core.SparseShortFetch(
            f'adaptive fetch shipped {raw.nbytes} B < used (native decode)')
    raise ValueError(f'bevdec: malformed sparse buffer (len {raw.nbytes})')
