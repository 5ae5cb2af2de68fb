"""ctypes bindings for the native host data plane (native/p3dcache.cpp).

The default training path keeps all samples resident in device HBM
(data/dataset.py); for datasets that don't fit (full BigBIRD), this module
provides the C++ out-of-core path: a flat mmap-able cache with a
multithreaded batch gather producing one contiguous buffer per
host->device transfer.  Falls back to a NumPy implementation when the
shared library isn't built (build with ``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libp3dcache.so")

_lib = None


def _try_build() -> None:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.p3d_cache_write.restype = ctypes.c_int
    lib.p3d_cache_write.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32]
    lib.p3d_cache_open.restype = ctypes.c_void_p
    lib.p3d_cache_open.argtypes = [ctypes.c_char_p]
    lib.p3d_cache_info.restype = None
    lib.p3d_cache_info.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.p3d_cache_gather.restype = ctypes.c_int
    lib.p3d_cache_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.p3d_cache_close.restype = None
    lib.p3d_cache_close.argtypes = [ctypes.c_void_p]
    for name in ("p3d_chw_to_hwc", "p3d_hwc_to_chw"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                       ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                       ctypes.c_int]
    _lib = lib
    return lib


def write_cache(path: str, patches: np.ndarray, labels: np.ndarray) -> None:
    """patches [N, H, W, C] NHWC float32 -> flat cache (CHW on disk, like
    the reference's HDF5 layout)."""
    data = np.ascontiguousarray(np.transpose(patches, (0, 3, 1, 2)),
                                np.float32)
    labels = np.ascontiguousarray(labels, np.float32)
    n, c, h, w = data.shape
    lib = load_library()
    if lib is not None:
        rc = lib.p3d_cache_write(
            path.encode(), data.ctypes.data_as(ctypes.c_void_p),
            labels.ctypes.data_as(ctypes.c_void_p), n, c, h, w,
            labels.shape[1])
        if rc != 0:
            raise IOError(f"p3d_cache_write failed ({rc}) for {path}")
        return
    # numpy fallback
    with open(path, "wb") as f:
        hdr = np.zeros(10, np.uint32)
        hdr[:2].view(np.uint64)[0] = 0x503344434143481
        hdr[2] = 1
        hdr[3:8] = [n, c, h, w, labels.shape[1]]
        f.write(hdr.tobytes())
        f.write(data.tobytes())
        f.write(labels.tobytes())


class NativeCache:
    """mmap-backed sample cache with threaded batch gather."""

    def __init__(self, path: str, threads: int = 0):
        self.path = path
        self.threads = threads or max(os.cpu_count() // 2, 1)
        self._lib = load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.p3d_cache_open(path.encode())
            if not self._handle:
                raise IOError(f"cannot open cache {path}")
            dims = (ctypes.c_uint32 * 5)()
            self._lib.p3d_cache_info(self._handle, dims)
            self.n, self.c, self.h, self.w, self.label_dim = [int(x)
                                                              for x in dims]
        else:
            raw = np.fromfile(path, np.uint32, count=10)
            self.n, self.c, self.h, self.w, self.label_dim = [
                int(x) for x in raw[3:8]]
            self._mm = np.memmap(path, np.float32, "r", offset=40)
            sf = self.c * self.h * self.w
            self._data = self._mm[:self.n * sf].reshape(self.n, sf)
            self._labels = self._mm[self.n * sf:].reshape(self.n,
                                                          self.label_dim)

    def gather(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Assemble a batch: returns (patches [B, H, W, C] NHWC, labels)."""
        idx = np.ascontiguousarray(indices, np.int64)
        B = len(idx)
        sf = self.c * self.h * self.w
        if self._handle:
            data = np.empty((B, sf), np.float32)
            labels = np.empty((B, self.label_dim), np.float32)
            self._lib.p3d_cache_gather(
                self._handle, idx.ctypes.data_as(ctypes.c_void_p), B,
                data.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p), self.threads)
            chw = data.reshape(B, self.c, self.h, self.w)
            out = np.empty((B, self.h, self.w, self.c), np.float32)
            self._lib.p3d_chw_to_hwc(
                chw.ctypes.data_as(ctypes.c_void_p),
                out.ctypes.data_as(ctypes.c_void_p), B, self.c, self.h,
                self.w, self.threads)
            return out, labels
        idxc = np.clip(idx, 0, self.n - 1)
        chw = self._data[idxc].reshape(B, self.c, self.h, self.w)
        return (np.ascontiguousarray(np.transpose(chw, (0, 2, 3, 1))),
                np.array(self._labels[idxc]))

    def close(self) -> None:
        if self._handle and self._lib:
            self._lib.p3d_cache_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
