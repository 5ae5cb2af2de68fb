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

# single source of truth for the on-disk contract (native/p3dcache.cpp:10-17
# is the C++ mirror): 40-byte header = magic u64 + version u32 +
# [n, c, h, w, label_dim] u32, then N x CHW f32 data, then N x L f32 labels
MAGIC = 0x503344434143481
VERSION = 1
HEADER_WORDS = 10
HEADER_BYTES = HEADER_WORDS * 4

_lib = None


def _header_bytes(n: int, c: int, h: int, w: int, label_dim: int) -> bytes:
    hdr = np.zeros(HEADER_WORDS, np.uint32)
    hdr[:2].view(np.uint64)[0] = MAGIC
    hdr[2] = VERSION
    hdr[3:8] = [n, c, h, w, label_dim]
    return hdr.tobytes()


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
        f.write(_header_bytes(n, c, h, w, labels.shape[1]))
        f.write(data.tobytes())
        f.write(labels.tobytes())


class CacheWriter:
    """Incremental writer for the native cache format.

    For builds too large to hold in host RAM (the out-of-core streaming
    datasets), samples are appended NHWC chunk by chunk; labels are tiny
    and buffered until close.  Writes to ``path + ".tmp"`` and renames on
    close so a crashed build never leaves a truncated cache that a later
    run would mistake for complete (the reference regenerates only when
    the cache file is missing, src/datasetmanager.cpp:541-547 — the same
    idempotence contract applies here).
    """

    def __init__(self, path: str, n: int, c: int, h: int, w: int,
                 label_dim: int):
        self.path = path
        self.tmp = path + ".tmp"
        self.f = open(self.tmp, "wb")
        self.f.write(_header_bytes(n, c, h, w, label_dim))
        self.shape = (c, h, w)
        self.label_dim = label_dim
        self.labels = []
        self.n_written = 0
        self.n = n

    def append(self, patches_nhwc: np.ndarray, labels: np.ndarray) -> None:
        chw = np.ascontiguousarray(
            np.transpose(patches_nhwc, (0, 3, 1, 2)), np.float32)
        if chw.shape[1:] != self.shape:
            raise ValueError(f"chunk shape {chw.shape[1:]} != {self.shape}")
        labels = np.ascontiguousarray(labels, np.float32)
        if labels.shape != (len(chw), self.label_dim):
            raise ValueError(f"label shape {labels.shape} != "
                             f"({len(chw)}, {self.label_dim})")
        self.f.write(chw.tobytes())
        self.labels.append(labels)
        self.n_written += len(chw)

    def close(self) -> None:
        if self.n_written != self.n:
            self.f.close()
            raise ValueError(
                f"cache {self.path}: wrote {self.n_written} of {self.n} "
                "declared samples")
        if self.labels:
            self.f.write(np.concatenate(self.labels).tobytes())
        self.f.close()
        os.replace(self.tmp, self.path)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        else:
            self.f.close()
        return False


class ConcatCaches:
    """Row-concatenation of caches (row spaces laid end-to-end) behind the
    same ``gather()`` interface — lets an extension build reuse an existing
    cache file untouched instead of rewriting a combined one."""

    def __init__(self, caches):
        if not caches:
            raise ValueError("ConcatCaches needs at least one cache")
        self.caches = list(caches)
        self.offsets = np.cumsum([0] + [c.n for c in self.caches])
        self.n = int(self.offsets[-1])
        first = self.caches[0]
        self.c, self.h, self.w = first.c, first.h, first.w
        self.label_dim = first.label_dim
        for cache in self.caches[1:]:
            if (cache.c, cache.h, cache.w, cache.label_dim) != \
                    (self.c, self.h, self.w, self.label_dim):
                raise ValueError("concatenated caches disagree on shape")

    def gather(self, rows) -> Tuple[np.ndarray, np.ndarray]:
        rows = np.asarray(rows, np.int64)
        out_p = np.empty((len(rows), self.h, self.w, self.c), np.float32)
        out_l = np.empty((len(rows), self.label_dim), np.float32)
        for i, cache in enumerate(self.caches):
            sel = (rows >= self.offsets[i]) & (rows < self.offsets[i + 1])
            if not sel.any():
                continue
            p, l = cache.gather(rows[sel] - self.offsets[i])
            out_p[sel] = p
            out_l[sel] = l
        return out_p, out_l

    def close(self) -> None:
        for c in self.caches:
            c.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def write_pair_negatives(path: str, templates, n_templates_per_obj: int,
                         n_objects: int, partners: np.ndarray,
                         n_negs: int) -> np.ndarray:
    """Build a hard-negative cache from confusable partners' templates.

    The reference loads per-model ``negs_<m>.h5`` impostor patches that
    override pusher0 (src/networksolver.cpp:96-101, loader
    src/datasetmanager.cpp:413-423).  Here each object's negatives are the
    first ``n_negs`` template patches of its confusable partner:
    ``partners[o]`` is the source object index, or ``-1`` for objects with
    no negatives (their rows are filled from the object itself and never
    drawn — the returned count is 0).  Rows are object-major
    ``[n_objects * n_negs]`` matching StreamingSources.negatives.
    Returns the per-object negative counts for ``light_tables``.
    """
    partners = np.asarray(partners, np.int64)
    if partners.shape != (n_objects,):
        raise ValueError(f"partners shape {partners.shape} != ({n_objects},)")
    counts = np.where(partners >= 0, n_negs, 0).astype(np.int32)
    with CacheWriter(path, n_objects * n_negs, templates.c, templates.h,
                     templates.w, templates.label_dim) as w:
        for o in range(n_objects):
            src = int(partners[o]) if partners[o] >= 0 else o
            rows = np.arange(src * n_templates_per_obj,
                             src * n_templates_per_obj + n_negs)
            p, l = templates.gather(rows)
            w.append(p, l)
    return counts


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
