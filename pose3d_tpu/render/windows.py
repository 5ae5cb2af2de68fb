"""Per-view bbox-clipped render windows.

The reference's ``renderView(clipped=true)`` projects the object's 3-D AABB
per pose and renders only the covering pixel rect (reference
src/sphere.cpp:44-53; it is the declared default of the API,
include/sphere.h:42-44, though the shipped pipeline calls with false and
crops from the full frame).

XLA needs static shapes, so the TPU-native formulation splits the window
into a *static size* shared by all views of a mesh (max projected extent,
rounded up) and *traced per-view origins* — one compiled render program
serves every pose, off-center or not.  ``rasterizer.render_view`` /
``rasterizer_tiled.render_view_tiled`` take the origin as a traced value.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def project_bbox(pose: np.ndarray, K: np.ndarray,
                 corners: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Screen-space (u, v) of the 8 AABB corners under pose/K."""
    cc = corners @ pose[:3, :3].T + pose[:3, 3]
    uv = cc @ np.asarray(K).T
    return uv[:, 0] / uv[:, 2], uv[:, 1] / uv[:, 2]


def bbox_window(pose: np.ndarray, K: np.ndarray, corners: np.ndarray,
                img_w: int = 640, img_h: int = 480
                ) -> Tuple[int, int, int, int]:
    """(x, y, w, h) of one pose's clipped window — exact reference
    semantics (src/sphere.cpp:44-53): x/y = max(0, min coord) truncated,
    w/h = max(0, min(image edge, int(max coord)) - x)."""
    u, v = project_bbox(pose, K, corners)
    x = int(max(0.0, float(u.min())))
    y = int(max(0.0, float(v.min())))
    w = max(0, min(img_w, int(u.max())) - x)
    h = max(0, min(img_h, int(v.max())) - y)
    return x, y, w, h


def clipped_windows(poses: np.ndarray, K: np.ndarray, corners: np.ndarray,
                    img_w: int = 640, img_h: int = 480, pad: int = 2,
                    multiple: int = 32
                    ) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Batched clipped windows with ONE static size.

    Returns (x0s [V] int32, y0s [V] int32, w, h): per-pose origins plus the
    common window size = the maximum projected extent over all poses,
    padded by ``pad`` on each side and rounded up to ``multiple`` (tile
    granularity).  Origins are shifted so each window stays inside the
    image; every window fully covers its pose's reference rect.
    """
    poses = np.asarray(poses, np.float32)
    V = poses.shape[0]
    xs = np.zeros(V, np.int64)
    ys = np.zeros(V, np.int64)
    ws = np.zeros(V, np.int64)
    hs = np.zeros(V, np.int64)
    for i in range(V):
        xs[i], ys[i], ws[i], hs[i] = bbox_window(poses[i], K, corners,
                                                 img_w, img_h)
    w = int(ws.max()) + 2 * pad
    h = int(hs.max()) + 2 * pad
    w = min(img_w, ((w + multiple - 1) // multiple) * multiple)
    h = min(img_h, ((h + multiple - 1) // multiple) * multiple)
    # center the common window on each pose's rect, clamp into the image
    x0s = np.clip(xs + (ws - w) // 2, 0, img_w - w)
    y0s = np.clip(ys + (hs - h) // 2, 0, img_h - h)
    return x0s.astype(np.int32), y0s.astype(np.int32), w, h
