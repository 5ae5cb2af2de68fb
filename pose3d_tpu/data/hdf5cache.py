"""Sample-cache I/O, byte-compatible with the reference HDF5 layout.

The reference caches every prepared sample set as one HDF5 file per model
holding datasets ``data`` (N x C x 64 x 64, float32, Caffe CHW) and
``label`` (N x 8, float32) (reference src/hdf5handler.cpp:75-132), named
``realSamples_<m>.h5`` / ``templates_<m>.h5`` / ``synthSamples_<m>.h5``
(reference src/datasetmanager.cpp:576-596).  We keep exactly that on-disk
contract — caches produced by either implementation interoperate — while the
in-memory layout is NHWC (TPU-native conv layout).

Label schema (8 floats, reference src/datasetmanager.cpp:365-374):
``[class_idx, quat.x, quat.y, quat.z, quat.w, inv(pose).t.x, .y, .z]``.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

try:
    import h5py
    HAVE_H5PY = True
except Exception:  # pragma: no cover
    HAVE_H5PY = False


def write_samples(path: str, patches: np.ndarray, labels: np.ndarray) -> None:
    """patches [N, 64, 64, C] float32 (NHWC), labels [N, 8] float32."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable")
    data = np.ascontiguousarray(np.transpose(patches, (0, 3, 1, 2)),
                                dtype=np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=np.asarray(labels, np.float32))


def read_samples(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (patches [N, 64, 64, C] NHWC float32, labels [N, 8])."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        data = np.asarray(f["data"], np.float32)
        labels = np.asarray(f["label"], np.float32)
    return np.transpose(data, (0, 2, 3, 1)), labels


def write_samples_tf(path: str, patches: np.ndarray,
                     labels: np.ndarray) -> None:
    """TensorFlow-layout variant: NHWC on disk (the reference ships
    writeTensorFlow/readTensorFlow alongside the Caffe layout, reference
    src/hdf5handler.cpp:136-224)."""
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.asarray(patches, np.float32))
        f.create_dataset("label", data=np.asarray(labels, np.float32))


def read_samples_tf(path: str) -> Tuple[np.ndarray, np.ndarray]:
    if not HAVE_H5PY:
        raise RuntimeError("h5py unavailable")
    with h5py.File(path, "r") as f:
        return (np.asarray(f["data"], np.float32),
                np.asarray(f["label"], np.float32))


def cache_paths(hdf5_path: str, model: str) -> Tuple[str, str, str]:
    """(real, synth, templates) cache files for one model, reference names."""
    return (os.path.join(hdf5_path, f"realSamples_{model}.h5"),
            os.path.join(hdf5_path, f"synthSamples_{model}.h5"),
            os.path.join(hdf5_path, f"templates_{model}.h5"))


def caches_exist(hdf5_path: str, model: str) -> bool:
    return all(os.path.exists(p) for p in cache_paths(hdf5_path, model))


def make_label(class_idx: int, quat_xyzw: np.ndarray,
               inv_translation: np.ndarray) -> np.ndarray:
    lab = np.empty(8, np.float32)
    lab[0] = class_idx
    lab[1:5] = quat_xyzw
    lab[5:8] = inv_translation
    return lab
