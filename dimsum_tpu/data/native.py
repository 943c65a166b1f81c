"""ctypes bindings for the native batch-gather core (C++, no-GIL row
gather from mmap'd latent stores).  Compiled on demand with g++; falls back
cleanly to numpy fancy-indexing when no toolchain is available."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "native",
                    "batch_gather.cpp")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        cache_dir = os.path.join(tempfile.gettempdir(), "dimsum_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, "batch_gather.so")
        src = os.path.abspath(_SRC)
        try:
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", so_path],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so_path)
            lib.bg_open.restype = ctypes.c_void_p
            lib.bg_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.bg_num_rows.restype = ctypes.c_int64
            lib.bg_num_rows.argtypes = [ctypes.c_void_p]
            lib.bg_gather.restype = ctypes.c_int
            lib.bg_gather.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.bg_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


class NativeLatentStore:
    """Row store over a fp32 memmap file with native threaded gather.

    Drop-in fast path for LatentMemmapDataset batch assembly:
        store = NativeLatentStore(path, (4, 32, 32))
        batch = store.gather(indices)        # (n, 4, 32, 32) fp32
    """

    def __init__(self, path: str, sample_shape, num_threads: int = 8):
        self.sample_shape = tuple(int(s) for s in sample_shape)
        self.row_floats = int(np.prod(self.sample_shape))
        self.row_bytes = 4 * self.row_floats
        self.num_threads = num_threads
        self._lib = _build_lib()
        self._handle = None
        if self._lib is not None:
            handle = self._lib.bg_open(path.encode(), self.row_bytes)
            self._handle = handle if handle else None
        if self._handle is not None:
            self.num_rows = int(self._lib.bg_num_rows(self._handle))
        else:  # numpy fallback
            self._mm = np.memmap(path, dtype=np.float32, mode="r")
            self.num_rows = self._mm.size // self.row_floats
            self._mm = self._mm[: self.num_rows * self.row_floats].reshape(
                self.num_rows, self.row_floats)

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def __len__(self):
        return self.num_rows

    def gather(self, indices) -> np.ndarray:
        idx = np.ascontiguousarray(indices, np.int64)
        n = len(idx)
        out = np.empty((n, self.row_floats), np.float32)
        if self._handle is not None:
            # thread-spawn costs ~100us; only fan out for multi-MB batches
            nthreads = min(self.num_threads,
                           max(1, (n * self.row_bytes) >> 23))
            rc = self._lib.bg_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                nthreads)
            if rc != 0:
                raise IndexError("bg_gather failed (index out of range?)")
        else:
            out[:] = self._mm[idx]
        return out.reshape(n, *self.sample_shape)

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.bg_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
