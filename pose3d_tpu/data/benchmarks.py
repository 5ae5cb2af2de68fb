"""Host-side benchmark loaders: LineMOD, BigBIRD, Washington.

File-format equivalents of the reference loaders (src/datasetmanager.cpp:
6-218), emitting NumPy frames ready for batching onto the device.  Color is
kept in OpenCV BGR order end-to-end (the patch channel contract).

LineMOD layout (reference :6-57): ``<root>/<seq>/color<i>.jpg``,
``<root>/<seq>/inp/depth<i>.png`` (uint16 mm -> m x0.001),
``<root>/<seq>/pose<i>.txt`` (ascii 4x4 row-major), intrinsics hardcoded
fx=572.4114 cx=325.2611 fy=573.5704 cy=242.0489 (:51-55).

Washington (reference :113-151): ``poses.txt`` = repeating (frame_nr, 4x4);
``color_%06d.png`` / ``depth_%06d.png`` (mm -> m); LineMOD intrinsics.

BigBIRD (reference :59-111): 5 cameras x 120 turntable steps;
``NP<c>_<i>.jpg`` / ``.png`` (0.1 mm -> m x0.0001) with hole inpainting at
1/5 scale; K = mean of the five ``NP*_rgb_K`` matrices halved (the reference
averages then halves because it renders at half resolution,
src/hdf5handler.cpp:300-371); pose = H_table_from_NP<c> =
``H_NP<c>_from_NP5 @ inv(H_table_from_reference_camera)``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import List

import numpy as np

try:
    import cv2
    HAVE_CV2 = True
except Exception:  # pragma: no cover
    HAVE_CV2 = False

LINEMOD_K = np.array([[572.4114, 0.0, 325.2611],
                      [0.0, 573.5704, 242.0489],
                      [0.0, 0.0, 1.0]], np.float32)


@dataclass
class Frame:
    nr: int
    color: np.ndarray          # [H, W, 3] uint8 BGR
    depth: np.ndarray          # [H, W] float32 meters
    pose: np.ndarray           # [4, 4] float32 world->cam (gt)


@dataclass
class Benchmark:
    frames: List[Frame] = field(default_factory=list)
    cam: np.ndarray = field(default_factory=lambda: LINEMOD_K.copy())


def _require_cv2():
    if not HAVE_CV2:
        raise RuntimeError("cv2 is required for benchmark image loading")


def load_linemod(root: str, sequence: str, count: int = -1) -> Benchmark:
    _require_cv2()
    d = os.path.join(root, sequence)
    if not os.path.isdir(d):
        raise FileNotFoundError(d)
    last = 0
    for f in os.listdir(d):
        m = re.match(r"color(\d+)\.jpg$", f)
        if m:
            last = max(last, int(m.group(1)))
    if count > -1:
        last = count

    bench = Benchmark(cam=LINEMOD_K.copy())
    for i in range(last + 1):
        color = cv2.imread(os.path.join(d, f"color{i}.jpg"))
        depth = cv2.imread(os.path.join(d, "inp", f"depth{i}.png"),
                           cv2.IMREAD_UNCHANGED)
        if color is None or depth is None:
            raise FileNotFoundError(f"{d}: frame {i} missing")
        depth = depth.astype(np.float32) * 0.001
        pose = np.loadtxt(os.path.join(d, f"pose{i}.txt"),
                          dtype=np.float32).reshape(4, 4)
        bench.frames.append(Frame(i, color, depth, pose))
    return bench


def load_washington(root: str, sequence: str, count: int = -1) -> Benchmark:
    _require_cv2()
    d = os.path.join(root, sequence)
    vals = np.loadtxt(os.path.join(d, "poses.txt"), dtype=np.float32)
    vals = vals.reshape(-1, 17)          # frame_nr + 16 pose entries
    bench = Benchmark(cam=LINEMOD_K.copy())
    for row in vals:
        nr = int(row[0])
        color = cv2.imread(os.path.join(d, f"color_{nr:06d}.png"))
        depth = cv2.imread(os.path.join(d, f"depth_{nr:06d}.png"),
                           cv2.IMREAD_UNCHANGED)
        if color is None or depth is None:
            raise FileNotFoundError(f"{d}: frame {nr} missing")
        depth = depth.astype(np.float32) * 0.001
        bench.frames.append(Frame(nr, color, depth,
                                  row[1:].reshape(4, 4).astype(np.float32)))
        if count > -1 and len(bench.frames) > count:
            break
    return bench


def _inpaint_depth_holes(depth: np.ndarray) -> np.ndarray:
    """BigBIRD depth-hole fill (reference src/datasetmanager.cpp:92-98):
    inpaint a 1/5-scale 8-bit rendition and paste into the zero pixels."""
    mini = np.clip(depth * 255.0, 0, 255).astype(np.uint8)
    mini = cv2.resize(mini, None, fx=0.2, fy=0.2)
    mini = cv2.inpaint(mini, (mini == 0).astype(np.uint8), 5.0,
                       cv2.INPAINT_TELEA)
    mini = cv2.resize(mini, (depth.shape[1], depth.shape[0]))
    filled = mini.astype(np.float32) / 255.0
    out = depth.copy()
    out[depth == 0] = filled[depth == 0]
    return out


def load_bigbird(root: str, sequence: str, count: int = -1) -> Benchmark:
    _require_cv2()
    import h5py
    d = os.path.join(root, sequence)
    calib = os.path.join(d, "calibration.h5")
    with h5py.File(calib, "r") as f:
        Ks = [np.asarray(f[f"NP{c}_rgb_K"], np.float32) for c in range(1, 6)]
        trans = []
        for c in range(1, 6):
            name = f"H_NP{c}_from_NP5"
            trans.append(np.asarray(f[name], np.float32)
                         if name in f else np.eye(4, dtype=np.float32))
    cam = np.mean(Ks, axis=0) * 0.5
    cam[2, 2] = 1.0

    bench = Benchmark(cam=cam.astype(np.float32))
    steps = range(0, 358, 3)
    for c in range(1, 6):
        for i in steps:
            color = cv2.imread(os.path.join(d, f"NP{c}_{i}.jpg"))
            depth = cv2.imread(os.path.join(d, f"NP{c}_{i}.png"),
                               cv2.IMREAD_UNCHANGED)
            if color is None or depth is None:
                continue
            depth = depth.astype(np.float32) * 0.0001
            depth = _inpaint_depth_holes(depth)
            pose_file = os.path.join(d, "poses", f"NP5_{i}_pose.h5")
            with h5py.File(pose_file, "r") as f:
                table_from_ref = np.asarray(
                    f["H_table_from_reference_camera"], np.float32)
            pose = trans[c - 1] @ np.linalg.inv(table_from_ref)
            bench.frames.append(Frame(i * c, color, depth,
                                      pose.astype(np.float32)))
            if count > -1 and len(bench.frames) > count:
                return bench
    return bench


def read_raw_depth(path: str) -> np.ndarray:
    """Benjamin-format binary depth: u16 rows, u16 cols, then row-major u16
    millimeter values (reference src/datasetmanager.cpp:177-190)."""
    with open(path, "rb") as f:
        rows, cols = np.frombuffer(f.read(4), "<u2")
        vals = np.frombuffer(f.read(int(rows) * int(cols) * 2), "<u2")
    return (vals.astype(np.float32) * 0.001).reshape(int(rows), int(cols))


def load_benjamin(root: str, sequence: str, count: int = -1) -> Benchmark:
    """Simulated-render benchmark: ``<stem>_color.png`` + ``<stem>_depth.raw``
    + ``<stem>_pose.txt`` per frame; the pose translation is overridden to
    (0, 0, 1) (reference loadBenjaminBenchmark, src/datasetmanager.cpp:
    153-218); LineMOD intrinsics."""
    _require_cv2()
    d = os.path.join(root, sequence)
    if not os.path.isdir(d):
        raise FileNotFoundError(d)
    bench = Benchmark(cam=LINEMOD_K.copy())
    for i, f in enumerate(sorted(os.listdir(d))):
        if not f.endswith("_color.png"):
            continue
        stem = f[:-len("_color.png")]
        color = cv2.imread(os.path.join(d, f))
        depth = read_raw_depth(os.path.join(d, stem + "_depth.raw"))
        pose = np.loadtxt(os.path.join(d, stem + "_pose.txt"),
                          dtype=np.float32).reshape(4, 4)
        pose[:3, 3] = [0.0, 0.0, 1.0]
        bench.frames.append(Frame(len(bench.frames), color, depth, pose))
        if count > -1 and len(bench.frames) > count:
            break
    return bench


LOADERS = {
    "LineMOD": load_linemod,
    "BigBIRD": load_bigbird,
    "Washington": load_washington,
    "Benjamin": load_benjamin,
}


def load_benchmark(dataset_name: str, root: str, sequence: str,
                   count: int = -1) -> Benchmark:
    loader = LOADERS.get(dataset_name, load_linemod)
    return loader(root, sequence, count)
