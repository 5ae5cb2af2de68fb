"""Background augmentation — the four bgfill modes as batched device ops.

The reference fills the zero-depth (rendered background) region of each
anchor patch on the CPU, per sample, inside the batch-builder threads
(reference src/bgfill.cpp, dispatched from src/datasetmanager.cpp:786-800).
Here each mode is a pure function on a [64, 64, 7] patch with a PRNG key,
vmapped over the batch and fused into the jitted train step — the producer
thread pool disappears.

Mode map (reference src/datasetmanager.cpp:792-798):
  1 color  — uniform noise in all 7 channels under the dilated mask;
  2 shapes — random circles over a depth ramp on a 76x76 canvas, renormalized
             so the canvas center sits at 0.6 m, Gaussian depth noise,
             normals recomputed, center-crop pasted under the dilated mask;
  3 fractal— simplex-fractal field (FastNoise replacement, ops/noise.py),
             same depth treatment, pasted under the *undilated* mask with
             median-smoothed outline (matching the reference's asymmetry);
  4 real   — a random 64x64 crop of a real RGB-D background, depth rescaled
             so its center reads 0.6 m, pasted under the undilated mask,
             outline median-smoothed;
 -1        — uniform choice of {1, 2, 3} per sample.

The mask key is ``depth_channel == 0`` — exact, thanks to the patch
normalization mapping background depth to literal 0 (ops/patch.py).
RNG: keyed jax.random; matches the reference's distributions, not its
(non-deterministic std::random_device) streams.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pose3d_tpu.ops.geometry import depth2normals
from pose3d_tpu.ops.noise import make_permutation, simplex_fractal

_CANVAS = 76            # int(64 * 1.2)
_SHAPE_FXFY = 539.0     # reference src/bgfill.cpp:212,280


def _mask_and_outline(depth_ch: jnp.ndarray):
    """mask = (depth == 0); 3x3 dilated/eroded variants and the morphological
    outline used for edge smoothing (reference src/bgfill.cpp:106-113)."""
    m = (depth_ch == 0.0)
    mf = m.astype(jnp.float32)
    dil = jax.lax.reduce_window(mf, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                "SAME") > 0
    ero = -jax.lax.reduce_window(-mf, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                 "SAME") > 0
    outline = dil & ~ero
    return m, dil, outline


def _median3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter per channel, replicate border (cv::medianBlur).

    Implemented as the 19-exchange median-of-9 selection network (Paeth) in
    pure min/max ops: ``jnp.sort`` over the 9-tap axis lowered to a ~7.8 ms
    sort on TPU and single-handedly dominated the fused train step; the
    exchange network is exact and runs in microseconds on the VPU."""
    H, W, C = img.shape
    pd = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    p = [pd[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def s(a, b):
        return jnp.minimum(a, b), jnp.maximum(a, b)

    p[1], p[2] = s(p[1], p[2]); p[4], p[5] = s(p[4], p[5])  # noqa: E702
    p[7], p[8] = s(p[7], p[8]); p[0], p[1] = s(p[0], p[1])  # noqa: E702
    p[3], p[4] = s(p[3], p[4]); p[6], p[7] = s(p[6], p[7])  # noqa: E702
    p[1], p[2] = s(p[1], p[2]); p[4], p[5] = s(p[4], p[5])  # noqa: E702
    p[7], p[8] = s(p[7], p[8]); p[0], p[3] = s(p[0], p[3])  # noqa: E702
    p[5], p[8] = s(p[5], p[8]); p[4], p[7] = s(p[4], p[7])  # noqa: E702
    p[3], p[6] = s(p[3], p[6]); p[1], p[4] = s(p[1], p[4])  # noqa: E702
    p[2], p[5] = s(p[2], p[5]); p[4], p[7] = s(p[4], p[7])  # noqa: E702
    p[4], p[2] = s(p[4], p[2]); p[6], p[4] = s(p[6], p[4])  # noqa: E702
    p[4], p[2] = s(p[4], p[2])
    return p[4]


def _split_patch(patch):
    return patch[..., :3], patch[..., 3], patch[..., 4:]


def _merge_patch(rgb, dep, nor):
    return jnp.concatenate([rgb, dep[..., None], nor], axis=-1)


def color_fill(key: jax.Array, patch: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel uniform noise in all 7 channels (reference
    src/bgfill.cpp:136-158; dilated mask)."""
    _, dil, _ = _mask_and_outline(patch[..., 3])
    noise = jax.random.uniform(key, patch.shape)
    return jnp.where(dil[..., None], noise, patch)


def shape_fill(key: jax.Array, patch: jnp.ndarray) -> jnp.ndarray:
    """Random circles over a depth ramp (reference src/bgfill.cpp:160-229)."""
    ks = jax.random.split(key, 8)
    C = _CANVAS

    base_col = jax.random.uniform(ks[0], (3,), minval=0.35, maxval=0.7)
    ramp_scale = jax.random.uniform(ks[1], (), minval=0.0, maxval=0.2)
    rows = jax.lax.broadcasted_iota(jnp.float32, (C, C), 0)
    canvas_rgb = jnp.broadcast_to(base_col, (C, C, 3))
    canvas_dep = 0.5 + ramp_scale * rows / C

    # 20 circles; centers from the reference's edge-peaked piecewise-linear
    # distribution (knot weights {1,0,0,1}: triangular densities falling to 0
    # toward the +-10 px center band, zero inside it)
    n_circ = 20
    L = C / 2.0 - 10.0          # left band [0, L], density 1 -> 0
    R = C / 2.0 - 10.0          # right band [C-R, C], density 0 -> 1
    u = jax.random.uniform(ks[2], (n_circ, 2))
    left = L * (1.0 - jnp.sqrt(1.0 - 2.0 * jnp.minimum(u, 0.5)))
    right = (C - R) + R * jnp.sqrt(jnp.maximum(2.0 * u - 1.0, 0.0))
    centers = jnp.where(u < 0.5, left, right)
    radii = jax.random.randint(ks[3], (n_circ,), 0, 21).astype(jnp.float32)
    circ_col = jax.random.uniform(ks[4], (n_circ, 3), minval=0.35, maxval=0.7)
    circ_dep = jax.random.uniform(ks[5], (n_circ,), minval=0.35, maxval=0.7)

    cols = jax.lax.broadcasted_iota(jnp.float32, (C, C), 1)
    for i in range(n_circ):
        inside = ((cols - centers[i, 0]) ** 2 +
                  (rows - centers[i, 1]) ** 2) <= radii[i] ** 2
        canvas_rgb = jnp.where(inside[..., None], circ_col[i], canvas_rgb)
        canvas_dep = jnp.where(inside, circ_dep[i], canvas_dep)

    # renormalize depth so the canvas center reads 0.6 m, clamp, add noise
    scale = 0.6 / canvas_dep[C // 2, C // 2]
    canvas_dep = jnp.minimum(canvas_dep * scale, 1.0)
    canvas_dep = canvas_dep + 0.002 * jax.random.normal(ks[6], (C, C))
    canvas_nor = depth2normals(canvas_dep, _SHAPE_FXFY, _SHAPE_FXFY)

    off = (C - 64) // 2
    crop = slice(off, off + 64)
    _, dil, _ = _mask_and_outline(patch[..., 3])
    rgb, dep, nor = _split_patch(patch)
    rgb = jnp.where(dil[..., None], canvas_rgb[crop, crop], rgb)
    dep = jnp.where(dil, canvas_dep[crop, crop], dep)
    nor = jnp.where(dil[..., None], canvas_nor[crop, crop], nor)
    return _merge_patch(rgb, dep, nor)


def make_noise_bank(key: jax.Array, n: int = 64) -> jnp.ndarray:
    """Precompute ``n`` simplex-fractal fields [n, 76, 76] once (device
    resident).  The hot-path fill then gathers + re-randomizes a field
    instead of evaluating the permutation-table gather chain per sample —
    those serialized table lookups dominate the fused train step on TPU."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: simplex_fractal(make_permutation(k),
                                              (_CANVAS, _CANVAS)))(keys)


def _bank_field(key: jax.Array, noise_bank: jnp.ndarray) -> jnp.ndarray:
    """Draw a decorrelated field from the bank: random pick + circular roll
    + flips + sign (distribution-preserving symmetries of the noise)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    f = noise_bank[jax.random.randint(k1, (), 0, noise_bank.shape[0])]
    sh = jax.random.randint(k2, (2,), 0, _CANVAS)
    f = jnp.roll(f, (sh[0], sh[1]), axis=(0, 1))
    flips = jax.random.bernoulli(k3, shape=(3,))
    f = jnp.where(flips[0], f[::-1], f)
    f = jnp.where(flips[1], f[:, ::-1], f)
    return jnp.where(flips[2], -f, f)


def fractal_fill(key: jax.Array, patch: jnp.ndarray,
                 noise_bank: jnp.ndarray | None = None) -> jnp.ndarray:
    """Simplex-fractal background (reference src/bgfill.cpp:231-302):
    grayscale fractal for RGB, shifted copy for depth, recomputed normals,
    undilated mask paste + median-smoothed outline."""
    C = _CANVAS
    if noise_bank is not None:
        field = _bank_field(key, noise_bank)
    else:
        perm = make_permutation(key)
        field = simplex_fractal(perm, (C, C))          # ~[-1, 1]
    canvas_rgb = jnp.clip(field + 0.5, 0.0, 1.0)[..., None].repeat(3, -1)
    canvas_dep = field * 0.5 + 1.0
    scale = 0.6 / canvas_dep[C // 2, C // 2]
    canvas_dep = jnp.clip(canvas_dep * scale, 0.0, 1.0)
    canvas_nor = depth2normals(canvas_dep, _SHAPE_FXFY, _SHAPE_FXFY)

    off = (C - 64) // 2
    crop = slice(off, off + 64)
    m, _, outline = _mask_and_outline(patch[..., 3])
    rgb, dep, nor = _split_patch(patch)
    rgb = jnp.where(m[..., None], canvas_rgb[crop, crop], rgb)
    dep = jnp.where(m, canvas_dep[crop, crop], dep)
    nor = jnp.where(m[..., None], canvas_nor[crop, crop], nor)
    rgb = jnp.where(outline[..., None], _median3(rgb), rgb)
    nor = jnp.where(outline[..., None], _median3(nor), nor)
    return _merge_patch(rgb, dep, nor)


def real_fill(key: jax.Array, patch: jnp.ndarray,
              bank: jnp.ndarray) -> jnp.ndarray:
    """Real-background paste (reference src/bgfill.cpp:67-134).

    ``bank`` [K, 64, 64, 7] is a device-resident bank of pre-cut background
    crops (host prepares them once from color_NNNN/depth_NNNN pairs,
    data/backgrounds.py) — the reference's random full-image crop becomes a
    random bank gather, which jits.  Depth is rescaled so the crop center
    reads 0.6 m, clamped to 1.
    """
    ks = jax.random.split(key, 2)
    idx = jax.random.randint(ks[0], (), 0, bank.shape[0])
    bg = bank[idx]
    bg_rgb, bg_dep, bg_nor = _split_patch(bg)
    center = bg_dep[32, 32]
    bg_dep = jnp.minimum(bg_dep * (0.6 / jnp.maximum(center, 1e-3)), 1.0)

    m, _, outline = _mask_and_outline(patch[..., 3])
    rgb, dep, nor = _split_patch(patch)
    rgb = jnp.where(m[..., None], bg_rgb, rgb)
    dep = jnp.where(m, bg_dep, dep)
    nor = jnp.where(m[..., None], bg_nor, nor)
    rgb = jnp.where(outline[..., None], _median3(rgb), rgb)
    nor = jnp.where(outline[..., None], _median3(nor), nor)
    return _merge_patch(rgb, dep, nor)


@partial(jax.jit, static_argnames=("mode",))
def random_fill(key: jax.Array, patches: jnp.ndarray, mode: int,
                bank: jnp.ndarray | None = None,
                noise_bank: jnp.ndarray | None = None) -> jnp.ndarray:
    """Batched dispatch (reference randomFill, src/datasetmanager.cpp:786-800).

    patches [B, 64, 64, 7]; mode in {-1, 0, 1, 2, 3, 4}.  mode 0 is the
    identity.  mode -1 picks uniformly from {1, 2, 3} per sample via
    lax.switch.  ``noise_bank`` (make_noise_bank) makes the fractal mode
    a cheap gather; without it the field is evaluated per sample.
    """
    if mode == 0:
        return patches
    B = patches.shape[0]
    keys = jax.random.split(key, B)

    if mode == 4:
        if bank is None:
            raise ValueError("real background fill needs a background bank")
        return jax.vmap(lambda k, p: real_fill(k, p, bank))(keys, patches)

    def fractal(k, p):
        return fractal_fill(k, p, noise_bank)

    branches = [color_fill, shape_fill, fractal]
    if mode in (1, 2, 3):
        fn = branches[mode - 1]
        return jax.vmap(fn)(keys, patches)

    # mode -1: per-sample uniform {1, 2, 3}
    def one(k, p):
        kc, kf = jax.random.split(k)
        which = jax.random.randint(kc, (), 0, 3)
        return jax.lax.switch(which, branches, kf, p)
    return jax.vmap(one)(keys, patches)
