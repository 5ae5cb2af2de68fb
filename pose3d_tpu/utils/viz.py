"""Non-interactive visualization utilities.

The reference uses OpenCV windows for patch/triplet/kNN inspection
(showRGBDPatch/showTriplet, reference src/helper.cpp:5-50; visualizeKNN,
src/networkevaluator.cpp:92-151).  Headless TPU hosts get image/file dumps
with the same information content instead.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def patch_to_image(patch: np.ndarray) -> np.ndarray:
    """[64, 64, 7] patch -> a [64, 64*3, 3] BGR strip (color | depth |
    normals), uint8 — the showRGBDPatch panel layout."""
    p = np.asarray(patch)
    col = np.clip(p[..., :3], 0, 1)
    dep = np.clip(p[..., 3:4], 0, 1).repeat(3, axis=-1)
    nor = np.clip(np.abs(p[..., 4:7]), 0, 1)
    strip = np.concatenate([col, dep, nor], axis=1)
    return (strip * 255).astype(np.uint8)


def triplet_to_image(group: np.ndarray) -> np.ndarray:
    """[5, 64, 64, 7] (anchor, puller, pushers) -> stacked panel image
    (showTriplet equivalent)."""
    return np.concatenate([patch_to_image(p) for p in group], axis=0)


def save_image(path: str, image: np.ndarray) -> None:
    try:
        import cv2
        cv2.imwrite(path, image)
    except Exception:
        from PIL import Image
        Image.fromarray(image[..., ::-1]).save(path)


def knn_panel(query_patch: np.ndarray, neighbor_patches: Sequence[np.ndarray],
              out_path: Optional[str] = None) -> np.ndarray:
    """visualizeKNN equivalent: query on top, retrieved templates below;
    optionally written to ``out_path``."""
    rows = [patch_to_image(query_patch)]
    rows += [patch_to_image(p) for p in neighbor_patches]
    panel = np.concatenate(rows, axis=0)
    if out_path:
        save_image(out_path, panel)
    return panel


def manifold_to_ply(path: str, points3d: np.ndarray,
                    labels: Optional[np.ndarray] = None) -> None:
    """Dump the PCA manifold (eval.compute_manifold) as an ascii PLY point
    cloud, colored by class when labels are given — the offline counterpart
    of the reference's viz window (src/networkevaluator.cpp:56-90)."""
    pts = np.asarray(points3d, np.float32)
    n = len(pts)
    if labels is not None:
        lab = np.asarray(labels).astype(int)
        palette = np.array([[228, 26, 28], [55, 126, 184], [77, 175, 74],
                            [152, 78, 163], [255, 127, 0], [255, 255, 51],
                            [166, 86, 40], [247, 129, 191]], np.uint8)
        cols = palette[lab % len(palette)]
    else:
        cols = np.full((n, 3), 180, np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {n}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, c in zip(pts, cols):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{c[0]} {c[1]} {c[2]}\n")
