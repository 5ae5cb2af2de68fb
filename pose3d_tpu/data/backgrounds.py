"""Real-background bank for mode-4 augmentation.

The reference loads ``color_NNNN.png``/``depth_NNNN.png`` pairs, inpaints
depth holes at 1/5 scale, computes normals (fx=fy=539), and downscales by 3
(reference src/bgfill.cpp:9-65); at fill time it cuts a random 64x64 window
whose center depth lies in [0.4, 20] m (reference :88-99).

TPU-first restructuring: the random *crop* is precomputed — the host cuts a
large bank of valid 64x64 crops once (same acceptance rule), and the jitted
fill gathers a random bank row (data/augment.py real_fill).  This trades a
dynamic-slice-from-full-image per sample for a static gather, matching the
reference's sampling distribution over crops up to bank discretization.
"""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np

from pose3d_tpu.data.benchmarks import HAVE_CV2, _inpaint_depth_holes

_BG_FXFY = 539.0


def load_backgrounds(path: str, count: int = -1) -> List[dict]:
    """Load and preprocess background frames (color/depth/normals)."""
    if not HAVE_CV2:
        raise RuntimeError("cv2 required to load backgrounds")
    import cv2
    import jax.numpy as jnp
    from pose3d_tpu.ops.geometry import depth2normals

    last = 0
    for f in os.listdir(path):
        m = re.match(r"color_(\d+)\.png$", f)
        if m:
            last = max(last, int(m.group(1)))
    if count > -1:
        last = count

    out = []
    for i in range(last + 1):
        color = cv2.imread(os.path.join(path, f"color_{i:04d}.png"))
        depth = cv2.imread(os.path.join(path, f"depth_{i:04d}.png"),
                           cv2.IMREAD_UNCHANGED)
        if color is None or depth is None:
            continue
        depth = depth.astype(np.float32) * 0.001
        depth = _inpaint_depth_holes(depth)
        normals = np.asarray(depth2normals(jnp.asarray(depth),
                                           _BG_FXFY, _BG_FXFY))
        h, w = depth.shape
        small = (w // 3, h // 3)
        color = cv2.resize(color, small)
        normals = cv2.resize(normals, small)
        depth = cv2.resize(depth, small, interpolation=cv2.INTER_NEAREST)
        out.append({"color": color, "depth": depth, "normals": normals})
    return out


def build_crop_bank(backgrounds: List[dict], crops_per_bg: int = 64,
                    patch: int = 64, seed: int = 0) -> np.ndarray:
    """Cut a bank of [K, 64, 64, 7] background patches in the patch channel
    layout (BGR/255, raw depth meters in the depth slot — rescaling to the
    0.6 m convention happens per-fill on device), rejecting crops whose
    center depth is outside [0.4, 20] m (reference src/bgfill.cpp:92-95)."""
    rng = np.random.default_rng(seed)
    bank = []
    for bg in backgrounds:
        H, W = bg["depth"].shape
        if H <= patch or W <= patch:
            continue
        tries = 0
        taken = 0
        while taken < crops_per_bg and tries < crops_per_bg * 20:
            tries += 1
            cy = rng.integers(patch // 2, H - patch // 2)
            cx = rng.integers(patch // 2, W - patch // 2)
            z = bg["depth"][cy, cx]
            if not np.isfinite(z) or z < 0.4 or z > 20.0:
                continue
            sl = (slice(cy - patch // 2, cy + patch // 2),
                  slice(cx - patch // 2, cx + patch // 2))
            crop = np.concatenate([
                bg["color"][sl].astype(np.float32) / 255.0,
                bg["depth"][sl][..., None],
                bg["normals"][sl]], axis=-1)
            bank.append(crop)
            taken += 1
    if not bank:
        raise RuntimeError("no valid background crops found")
    return np.stack(bank).astype(np.float32)


def synthetic_crop_bank(n: int = 256, seed: int = 0) -> np.ndarray:
    """Hermetic stand-in bank (tests / no-dataset runs): smooth random fields
    with plausible depth statistics."""
    rng = np.random.default_rng(seed)
    bank = np.empty((n, 64, 64, 7), np.float32)
    for i in range(n):
        base = rng.random((8, 8, 7)).astype(np.float32)
        up = np.kron(base, np.ones((8, 8, 1), np.float32))
        up[..., 3] = 0.5 + up[..., 3]          # depth ~ [0.5, 1.5] m
        bank[i] = up
    return bank
