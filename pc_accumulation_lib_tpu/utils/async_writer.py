"""Asynchronous compressed-pickle dataset writer.

Python pickles the sample (cheap); gzip compression + disk IO run on the
native C++ thread pool (native/fastio.cpp, built on demand), keeping the
accumulation pipeline off the serialization critical path — the reference
compresses synchronously per sample (sem_pc_accum.py:280-294). Falls back
to a Python ThreadPoolExecutor + gzip when no C++ toolchain is available.
"""
from __future__ import annotations

import ctypes
import gzip
import os
import pickle
import subprocess
from typing import Optional

_NATIVE_SRC = os.path.join(os.path.dirname(__file__), '..', '..', 'native',
                           'fastio.cpp')
_NATIVE_LIB = os.path.join(os.path.dirname(__file__), '..', '..', 'native',
                           'libfastio.so')


def _build_native() -> Optional[str]:
    src = os.path.abspath(_NATIVE_SRC)
    lib = os.path.abspath(_NATIVE_LIB)
    if not os.path.exists(src):
        return None
    if (os.path.exists(lib)
            and os.path.getmtime(lib) >= os.path.getmtime(src)):
        return lib
    try:
        subprocess.run(
            ['g++', '-O2', '-shared', '-fPIC', '-o', lib, src, '-lz',
             '-lpthread'], check=True, capture_output=True)
        return lib
    except (OSError, subprocess.CalledProcessError) as e:
        print(f'fastio build failed ({e}); falling back to Python gzip')
        return None


class AsyncPickleWriter:
    """write(obj, filename, dir) -> queued gzip pickle; wait() to drain."""

    def __init__(self, n_threads: int = 4, compresslevel: int = 6,
                 force_python: bool = False):
        self.compresslevel = compresslevel
        self._lib = None
        self._pool = None
        if not force_python:
            lib_path = _build_native()
            if lib_path:
                lib = ctypes.CDLL(lib_path)
                lib.fastio_init.argtypes = [ctypes.c_int]
                lib.fastio_submit.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
                    ctypes.c_int
                ]
                lib.fastio_pending.restype = ctypes.c_long
                lib.fastio_errors.restype = ctypes.c_long
                lib.fastio_init(n_threads)
                self._lib = lib
                import atexit
                atexit.register(lib.fastio_shutdown)
        if self._lib is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=n_threads)
            self._futures = []

    @property
    def native(self) -> bool:
        return self._lib is not None

    def write(self, obj, filename: str, write_dir: str):
        """Queue ``<write_dir>/<filename>.gz`` (same naming as
        sem_pc_accum.write_compressed_pickle)."""
        path = os.path.join(write_dir, f'{filename}.gz')
        payload = pickle.dumps(obj)
        if self._lib is not None:
            self._lib.fastio_submit(path.encode(), payload, len(payload),
                                    self.compresslevel)
        else:
            def task(p=path, d=payload):
                # mtime=0 like utils/io.py (and like the native zlib
                # path): byte-deterministic outputs for resume compares.
                with open(p, 'wb') as raw:
                    with gzip.GzipFile(
                            fileobj=raw, mode='wb', mtime=0,
                            compresslevel=self.compresslevel) as f:
                        f.write(d)
            self._futures.append(self._pool.submit(task))

    def pending(self) -> int:
        if self._lib is not None:
            return int(self._lib.fastio_pending())
        self._futures = [f for f in self._futures if not f.done()]
        return len(self._futures)

    def wait(self):
        if self._lib is not None:
            self._lib.fastio_wait_all()
            if int(self._lib.fastio_errors()):
                raise IOError('fastio reported write errors')
        else:
            for f in self._futures:
                f.result()
            self._futures = []
