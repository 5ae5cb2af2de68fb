"""Normalized 64x64x7 patch extraction — the §3.2 contract, TPU-style.

The reference's ``samplePatchWithScale`` (src/datasetmanager.cpp:299-346)
crops a dynamic, z-dependent metric window and resizes it with OpenCV.
Dynamic crop shapes don't jit, so this implementation never materializes the
crop: for every output pixel it computes the dynamic source coordinate and
*gathers* straight from the full frame — a single static-shape XLA program,
vmap-able over frames.

Contract reproduced exactly (float path, like the reference which converts to
float before resizing):
  * metric window m = 0.2 m; pixel size trunc(f * m / z) per axis;
  * crop origin = center - size/2 (C integer truncation), clamped to
    [0, dim - size - 1] with the reference's order of clamps;
  * RGB (stored BGR, as OpenCV loads it) -> value/255, bilinear resize with
    OpenCV's half-pixel source mapping (src = (dst+0.5)*scale - 0.5) and
    border clamping;
  * depth -> demeaned by the center z, clamped to ±m, mapped to [0,1] via
    (d/m+1)/2; NEAREST resize (src = floor(dst*scale)) — background pixels
    (depth 0) land exactly on (1 - z/m... clipped) -> 0 when z >= m? No:
    d=0 gives delta=-z clamped to -m -> value 0, the mask bit the background
    filler keys on (reference src/bgfill.cpp:106);
  * normals -> bilinear resize, no renormalization;
  * output channel order [B, G, R, depth, nx, ny, nz], shape [64, 64, 7].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PATCH_SIZE = 64
METRIC_CROP = 0.2


def _bilinear_axis(out_size: int, src_size: jnp.ndarray, origin: jnp.ndarray,
                   limit: int):
    """Per-output-pixel source indices + weights for one axis.

    ``src_size``/``origin`` are traced scalars (dynamic crop), ``out_size`` and
    ``limit`` (full-image extent) are static.  Returns (i0, i1, frac) where
    i0/i1 index the full image.
    """
    scale = src_size.astype(jnp.float32) / out_size
    fx = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    x0 = jnp.floor(fx)
    frac = fx - x0
    x0 = x0.astype(jnp.int32)
    # OpenCV border handling: clamp to the crop, pinning the weight.
    frac = jnp.where(x0 < 0, 0.0, frac)
    x0 = jnp.maximum(x0, 0)
    last = src_size - 1
    frac = jnp.where(x0 >= last, 1.0, frac)
    x0 = jnp.minimum(x0, jnp.maximum(last - 1, 0))
    x1 = jnp.minimum(x0 + 1, last)
    g0 = jnp.clip(origin + x0, 0, limit - 1)
    g1 = jnp.clip(origin + x1, 0, limit - 1)
    return g0, g1, frac


def _nearest_axis(out_size: int, src_size: jnp.ndarray, origin: jnp.ndarray,
                  limit: int):
    scale = src_size.astype(jnp.float32) / out_size
    sx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * scale)
    sx = jnp.clip(sx.astype(jnp.int32), 0, src_size - 1)
    return jnp.clip(origin + sx, 0, limit - 1)


def patch_tap_grids(H: int, W: int, center_x: jnp.ndarray,
                    center_y: jnp.ndarray, z: jnp.ndarray,
                    fx: float, fy: float, m: float = METRIC_CROP,
                    out_size: int = PATCH_SIZE):
    """Source tap indices/weights of the dynamic-crop resample.

    Returns (gx0, gx1, ax, gy0, gy1, ay, gxn, gyn): the bilinear corner
    indices + fractional weights per axis and the nearest-neighbor depth
    indices, all [out_size] int32/float32 indexing the full [H, W] frame.
    Shared by sample_patch (dense gathers) and the slot-sparse generation
    path (dataset._patch_from_slots), which evaluates face colors ONLY at
    these taps.
    """
    z = z.astype(jnp.float32)
    screen_w = (fx * m / z).astype(jnp.int32)   # C float->int truncation
    screen_h = (fy * m / z).astype(jnp.int32)

    cx = center_x.astype(jnp.int32)
    cy = center_y.astype(jnp.int32)
    # Reference clamp order: floor at 0 first, then the upper bound (which
    # wins if the window is larger than the image).
    cut_x = jnp.minimum(jnp.maximum(cx - screen_w // 2, 0), W - screen_w - 1)
    cut_y = jnp.minimum(jnp.maximum(cy - screen_h // 2, 0), H - screen_h - 1)

    gx0, gx1, ax = _bilinear_axis(out_size, screen_w, cut_x, W)
    gy0, gy1, ay = _bilinear_axis(out_size, screen_h, cut_y, H)
    gxn = _nearest_axis(out_size, screen_w, cut_x, W)
    gyn = _nearest_axis(out_size, screen_h, cut_y, H)
    return gx0, gx1, ax, gy0, gy1, ay, gxn, gyn


def combine_patch_taps(six_sub: jnp.ndarray, d_near: jnp.ndarray,
                       ax: jnp.ndarray, ay: jnp.ndarray, z: jnp.ndarray,
                       m: float = METRIC_CROP) -> jnp.ndarray:
    """Bilinear/depth combine over PRE-GATHERED taps.

    six_sub [2n, 2n, 6] holds (255*BGR, normals) gathered at rows
    concat(gy0, gy1) x cols concat(gx0, gx1) — so corner p00 is the
    [:n, :n] quadrant, p01 [:n, n:], p10 [n:, :n], p11 [n:, n:];
    d_near [n, n] is the nearest-gathered depth.  Identical arithmetic to
    sample_patch after its gathers.
    """
    n = ax.shape[0]
    p00 = six_sub[:n, :n]
    p01 = six_sub[:n, n:]
    p10 = six_sub[n:, :n]
    p11 = six_sub[n:, n:]
    wx = ax[None, :, None]
    wy = ay[:, None, None]
    bil = ((p00 * (1 - wx) + p01 * wx) * (1 - wy) +
           (p10 * (1 - wx) + p11 * wx) * wy)

    rgb = bil[..., :3] / 255.0
    nor = bil[..., 3:]

    z = z.astype(jnp.float32)
    dc = jnp.clip(d_near.astype(jnp.float32) - z, -m, m)
    # (dc + m) first so the -m clip maps to an exact 0 — XLA's fma
    # contraction of (dc/m + 1) * 0.5 leaves ~1e-8 residue, and background
    # pixels must read exactly 0: that bit is the augmentation mask
    # (reference src/bgfill.cpp:106).  The where() makes it contraction-proof.
    d = (dc + m) * (0.5 / m)
    d = jnp.where(dc <= -m, 0.0, d)

    return jnp.concatenate([rgb, d[..., None], nor], axis=-1)


@partial(jax.jit, static_argnames=("fx", "fy", "m", "out_size"))
def sample_patch(color: jnp.ndarray, depth: jnp.ndarray, normals: jnp.ndarray,
                 center_x: jnp.ndarray, center_y: jnp.ndarray, z: jnp.ndarray,
                 fx: float, fy: float, m: float = METRIC_CROP,
                 out_size: int = PATCH_SIZE) -> jnp.ndarray:
    """Extract one normalized patch.

    color   [H, W, 3] float (0..255, BGR);  depth [H, W] metric float;
    normals [H, W, 3] float;  center/z traced scalars.
    Returns [out_size, out_size, 7] float32.
    """
    H, W = depth.shape
    gx0, gx1, ax, gy0, gy1, ay, gxn, gyn = patch_tap_grids(
        H, W, center_x, center_y, z, fx, fy, m, out_size)

    # Bilinear path: BGR + normals share gather indices -> stack to 6 ch.
    six = jnp.concatenate([color.astype(jnp.float32), normals], axis=-1)
    ys = jnp.concatenate([gy0, gy1])
    xs = jnp.concatenate([gx0, gx1])
    six_sub = six[ys[:, None], xs[None, :]]

    # Nearest path for depth, then demean/clamp/rescale (commutes with NN).
    d_near = depth[gyn[:, None], gxn[None, :]]
    return combine_patch_taps(six_sub, d_near, ax, ay, z, m)


@partial(jax.jit, static_argnames=("fx", "fy", "m", "out_size"))
def sample_patches(colors: jnp.ndarray, depths: jnp.ndarray,
                   normals: jnp.ndarray, centers_x: jnp.ndarray,
                   centers_y: jnp.ndarray, zs: jnp.ndarray,
                   fx: float, fy: float, m: float = METRIC_CROP,
                   out_size: int = PATCH_SIZE) -> jnp.ndarray:
    """Batched patch extraction: leading axis over frames."""
    fn = lambda c, d, n, x, y, z: sample_patch(
        c, d, n, x, y, z, fx=fx, fy=fy, m=m, out_size=out_size)
    return jax.vmap(fn)(colors, depths, normals, centers_x, centers_y, zs)
