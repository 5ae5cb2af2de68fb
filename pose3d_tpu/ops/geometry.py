"""Pinhole geometry and surface-normal estimation as batched XLA programs.

``depth2normals`` reproduces the reference's 3x3-neighborhood least-squares
plane fit with its 0.05 m depth-discontinuity gate (reference
src/helper.cpp:53-103) — but as one vectorized program over the whole image
(vmap-able over a batch of frames) instead of a scalar CPU double loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Neighborhood radius of the plane fit; taps at {-3, 0, +3} in each axis.
_N = 3
# Depth-discontinuity gate: neighbors further than 5 cm are ignored.
_GATE = 0.05


def depth2normals(depth: jnp.ndarray, fx: float, fy: float) -> jnp.ndarray:
    """Metric depth [H, W] -> unit surface normals [H, W, 3].

    Semantics (reference src/helper.cpp:53-103):
      * only pixels with d > 0 and inside the border get a normal
        (rows/cols [3, H-5] / [3, W-5]; the reference loop excludes the last
        N+1 rows/cols);
      * 9 taps at offsets (di, dj) in {-3,0,3}^2, each weighted by
        1{|depth[r+dj, c+di] - d| < 0.05};
      * normal ∝ (adj(A)·b scaled by (fx, fy), det(A)·d); normalized when
        nonzero, else zero.
    """
    H, W = depth.shape
    d = depth.astype(jnp.float32)

    A00 = jnp.zeros_like(d)
    A01 = jnp.zeros_like(d)
    A11 = jnp.zeros_like(d)
    b0 = jnp.zeros_like(d)
    b1 = jnp.zeros_like(d)

    # Shifted copies via padding; out-of-range taps read 0 which the gate
    # would not necessarily reject, but the border mask below discards every
    # pixel whose 3-neighborhood leaves the image — identical to the
    # reference's loop bounds.
    pad = jnp.pad(d, _N)
    for dj in (-_N, 0, _N):          # row offset (j in the reference)
        for di in (-_N, 0, _N):      # col offset (i in the reference)
            nb = jax.lax.dynamic_slice(pad, (_N + dj, _N + di), (H, W))
            delta = nb - d
            f = (jnp.abs(delta) < _GATE).astype(jnp.float32)
            A00 = A00 + f * (di * di)
            A01 = A01 + f * (di * dj)
            A11 = A11 + f * (dj * dj)
            b0 = b0 + f * di * delta
            b1 = b1 + f * dj * delta

    nx = (A11 * b0 - A01 * b1) * fx
    ny = (-A01 * b0 + A00 * b1) * fy
    nz = (A00 * A11 - A01 * A01) * d

    n = jnp.stack([nx, ny, nz], axis=-1)
    sq = jnp.sum(n * n, axis=-1, keepdims=True)
    n = jnp.where(sq > 0, n * jax.lax.rsqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)

    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    interior = ((rows >= _N) & (rows < H - _N - 1) &
                (cols >= _N) & (cols < W - _N - 1))
    valid = interior & (d > 0)
    return jnp.where(valid[..., None], n, 0.0)


def depth2normals_at(depth: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                     fx: float, fy: float) -> jnp.ndarray:
    """`depth2normals(depth, fx, fy)[ys][:, xs]` without computing the
    full-window normal map.

    The plane fit reads exactly 9 depth taps at offsets {-3, 0, 3}^2, so
    the normals at the `len(ys) x len(xs)` pixel subgrid need only 9
    gathered depth planes — the patch path consumes normals at ~130^2
    resample-tap pixels of a ~294^2 render window, and the full-window fit
    was the dominant VPU term of the sparse patch epilogue
    (PROFILE_GEN_r3.json sparse_post).  Bit-identical to indexing the
    full-window result: same taps, same arithmetic order per pixel.
    """
    H, W = depth.shape
    d = depth[ys][:, xs].astype(jnp.float32)

    A00 = jnp.zeros_like(d)
    A01 = jnp.zeros_like(d)
    A11 = jnp.zeros_like(d)
    b0 = jnp.zeros_like(d)
    b1 = jnp.zeros_like(d)

    pad = jnp.pad(depth.astype(jnp.float32), _N)
    for dj in (-_N, 0, _N):
        rows = pad[ys + _N + dj]            # [Ty, W + 2N] row gather
        for di in (-_N, 0, _N):
            nb = rows[:, xs + _N + di]      # [Ty, Tx]
            delta = nb - d
            f = (jnp.abs(delta) < _GATE).astype(jnp.float32)
            A00 = A00 + f * (di * di)
            A01 = A01 + f * (di * dj)
            A11 = A11 + f * (dj * dj)
            b0 = b0 + f * di * delta
            b1 = b1 + f * dj * delta

    nx = (A11 * b0 - A01 * b1) * fx
    ny = (-A01 * b0 + A00 * b1) * fy
    nz = (A00 * A11 - A01 * A01) * d

    n = jnp.stack([nx, ny, nz], axis=-1)
    sq = jnp.sum(n * n, axis=-1, keepdims=True)
    n = jnp.where(sq > 0, n * jax.lax.rsqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)

    interior = (((ys >= _N) & (ys < H - _N - 1))[:, None] &
                ((xs >= _N) & (xs < W - _N - 1))[None, :])
    valid = interior & (d > 0)
    return jnp.where(valid[..., None], n, 0.0)


def depth2cloud(depth: jnp.ndarray, fx: float, fy: float,
                ox: float, oy: float) -> jnp.ndarray:
    """Back-project metric depth [H, W] to a camera-frame point cloud
    [H, W, 3] (reference src/helper.cpp:105-129)."""
    H, W = depth.shape
    xs = (jnp.arange(W, dtype=jnp.float32) - ox) / fx
    ys = (jnp.arange(H, dtype=jnp.float32) - oy) / fy
    X = xs[None, :] * depth
    Y = ys[:, None] * depth
    return jnp.stack([X, Y, depth], axis=-1)


def project(points: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection: camera-frame points [..., 3] -> pixels [..., 2]."""
    p = points @ K.T
    return p[..., :2] / p[..., 2:3]


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 isometry to [..., 3] points."""
    return points @ T[:3, :3].T + T[:3, 3]


def grow_foreground(depth: jnp.ndarray, seed_rc: tuple | None = None,
                    tol: float = 0.01, max_iters: int = 256) -> jnp.ndarray:
    """Depth-connected flood fill from a seed pixel (reference
    growForeground, src/helper.cpp:131-166): grow a mask from the seed,
    adding 4-neighbors whose depth differs from an already-included neighbor
    by < ``tol``.  XLA-style: iterate masked dilation with lax.while_loop
    until the frontier stops changing.  Returns a bool [H, W] mask.
    """
    H, W = depth.shape
    if seed_rc is None:
        seed_rc = (H // 2, W // 2)
    mask0 = jnp.zeros((H, W), bool).at[seed_rc[0], seed_rc[1]].set(True)

    def shift(m, dr, dc):
        return jnp.roll(m, (dr, dc), axis=(0, 1))

    def grow_once(mask):
        new = mask
        for dr, dc in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb_in = shift(mask, dr, dc)           # neighbor already included
            nb_depth = shift(depth, dr, dc)
            ok = nb_in & (jnp.abs(depth - nb_depth) < tol) & (depth > 0)
            # roll wraps; mask out the wrapped border row/col
            if dr == 1:
                ok = ok.at[0, :].set(False)
            if dr == -1:
                ok = ok.at[-1, :].set(False)
            if dc == 1:
                ok = ok.at[:, 0].set(False)
            if dc == -1:
                ok = ok.at[:, -1].set(False)
            new = new | ok
        return new

    def cond(state):
        i, mask, changed = state
        return changed & (i < max_iters)

    def body(state):
        i, mask, _ = state
        new = grow_once(mask)
        return i + 1, new, jnp.any(new != mask)

    _, mask, _ = jax.lax.while_loop(cond, body,
                                    (jnp.int32(0), mask0, jnp.bool_(True)))
    return mask


def invert_isometry(T: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out
