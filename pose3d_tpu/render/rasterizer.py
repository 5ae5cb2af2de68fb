"""Batched mesh rasterization as XLA programs — the OpenGL replacement.

The reference renders each view through a Qt FBO and reads back color +
z-buffer per view (reference src/painter.cpp:87-112, src/sphere.cpp:37-67) —
a CPU→GL→CPU round trip per pose.  Here the whole pipeline is one XLA
program over *all* views: vertex transform, projection, perspective-correct
barycentric interpolation, and z-buffering as a running min over face chunks.

Math: for screen-space triangle (p0, p1, p2) the three edge functions
w_i(q) and the products  zinv(q)*area = Σ w_i / z_i  and
color(q)*zinv(q)*area = Σ w_i c_i / z_i  are all affine in the pixel q, so
one [P, 3] x [3, 8F] matmul (3 edge rows + 1 zinv row + 3 color rows + pad)
evaluates coverage, depth and color for every pixel/face pair on the MXU;
a VPU epilogue selects the nearest covering face.  Faces are processed in
chunks with a running (depth, color) accumulator, pixels in row blocks.

Conventions: pixel (r, c) samples at image coordinates (c + 0.5, r + 0.5)
under the pinhole K; both triangle windings are rendered (the reference's GL
path does not cull faces); background is black with depth 0
(reference src/sphere.cpp:57 setBackground(0,0,0)); near/far = 0.001/4.0
(reference src/painter.cpp:9-10).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEAR = 0.001
FAR = 4.0
_EPS_AREA = 1e-12


def _face_matrix(p: jnp.ndarray, zc: jnp.ndarray,
                 col: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-face affine coefficient matrix.

    p [F, 3, 2] screen vertices, zc [F, 3] camera-z, col [F, 3, 3] vertex
    colors.  Returns (M [F, 7, 3], valid [F]): rows 0-2 edge functions,
    row 3 = area * zinv(q), rows 4-6 = area * zinv(q) * color(q), each as
    (coef_x, coef_y, const).
    """
    x0, y0 = p[:, 0, 0], p[:, 0, 1]
    x1, y1 = p[:, 1, 0], p[:, 1, 1]
    x2, y2 = p[:, 2, 0], p[:, 2, 1]

    # w_i(q) = a_i qx + b_i qy + c_i
    a = jnp.stack([y1 - y2, y2 - y0, y0 - y1], axis=1)          # [F, 3]
    b = jnp.stack([x2 - x1, x0 - x2, x1 - x0], axis=1)
    c = jnp.stack([x1 * y2 - x2 * y1,
                   x2 * y0 - x0 * y2,
                   x0 * y1 - x1 * y0], axis=1)

    zinv = 1.0 / jnp.maximum(zc, NEAR)                          # [F, 3]
    edges = jnp.stack([a, b, c], axis=2)                        # [F, 3, 3]
    # explicit multiply-sum (not einsum): backend fast-math dots cost ~1e-3
    # and these reductions are over 3 elements only
    zrow = jnp.sum(zinv[:, :, None] * edges, axis=1)[:, None, :]  # [F, 1, 3]
    crow = jnp.sum(zinv[:, :, None, None] * col[:, :, :, None]
                   * edges[:, :, None, :], axis=1)              # [F, 3, 3]

    M = jnp.concatenate([edges, zrow, crow], axis=1)            # [F, 7, 3]
    valid = jnp.all(zc > NEAR, axis=1)
    # Point-degenerate faces (all three screen vertices identical) must
    # never rasterize — GL draws zero-area primitives as nothing
    # (reference renders through GL, src/painter.cpp:87-112).  They can't
    # be caught by an area epsilon: under jit XLA contracts the c-row
    # products x1*y2 - x2*y1 into FMAs whose rounding residue makes the
    # "zero" area tiny-but-nonzero, and the edge functions of a point face
    # are position-INDEPENDENT constants, so that residue once admitted
    # every pixel at the face's depth.  The positional coefficients a, b
    # are pure subtractions — exact even with FMA contraction — so
    # "all a and b exactly 0" is an exact point-degeneracy test.
    valid &= jnp.any((a != 0.0) | (b != 0.0), axis=1)
    return M, valid


def _rasterize_rows(pix: jnp.ndarray, M: jnp.ndarray, area: jnp.ndarray,
                    valid: jnp.ndarray, chunk: int):
    """Rasterize one pixel block against all faces.

    pix [P, 3] homogeneous pixels (qx, qy, 1); M [F, 7, 3]; area [F];
    valid [F].  Returns (depth [P], color [P, 3]).
    """
    F = M.shape[0]
    n_chunks = F // chunk
    Mc = M.reshape(n_chunks, chunk, 7, 3)
    areac = area.reshape(n_chunks, chunk)
    validc = valid.reshape(n_chunks, chunk)
    P = pix.shape[0]

    def body(carry, xs):
        best_d, best_col = carry
        Mf, ar, vl = xs
        # The one big MXU contraction: [P, 3] x [chunk*7, 3]^T
        vals = jnp.matmul(pix, Mf.reshape(chunk * 7, 3).T,
                          precision="highest")
        vals = vals.reshape(P, chunk, 7)

        w = vals[..., 0:3]                                     # [P, chunk, 3]
        s = jnp.sign(ar)[None, :, None]
        # coverage tolerance scaled by |area|: f32 noise in the edge
        # functions otherwise drops seam pixels along shared triangle edges
        # (observed on XLA CPU); tiny double-coverage is harmless under the
        # z-buffer since both faces interpolate the same depth there.
        tol = 1e-4 * jnp.abs(ar)[None, :, None]
        inside = jnp.all(w * s >= -tol, axis=-1)
        inside &= (jnp.abs(ar) > _EPS_AREA)[None, :] & vl[None, :]

        zinv_area = vals[..., 3]                               # [P, chunk]
        depth = ar[None, :] / jnp.where(zinv_area != 0, zinv_area, 1.0)
        ok = inside & (depth > NEAR) & (depth <= FAR) & (zinv_area * s[:, :, 0] > 0)
        depth = jnp.where(ok, depth, jnp.inf)

        arg = jnp.argmin(depth, axis=1)                        # [P]
        d = jnp.take_along_axis(depth, arg[:, None], axis=1)[:, 0]
        za = jnp.take_along_axis(zinv_area, arg[:, None], axis=1)[:, 0]
        crows = jnp.take_along_axis(
            vals[..., 4:7], arg[:, None, None].repeat(3, -1), axis=1)[:, 0]
        colr = crows / jnp.where(za != 0, za, 1.0)[:, None]

        better = d < best_d
        best_d = jnp.where(better, d, best_d)
        best_col = jnp.where(better[:, None], colr, best_col)
        return (best_d, best_col), None

    init = (jnp.full((P,), jnp.inf, jnp.float32),
            jnp.zeros((P, 3), jnp.float32))
    (best_d, best_col), _ = jax.lax.scan(body, init, (Mc, areac, validc))
    return best_d, best_col


@partial(jax.jit, static_argnames=("width", "height", "face_chunk",
                                   "row_block"))
def render_view(vertices: jnp.ndarray, faces: jnp.ndarray,
                colors: jnp.ndarray, pose: jnp.ndarray, K: jnp.ndarray,
                width: int, height: int, x0: int | jnp.ndarray = 0,
                y0: int | jnp.ndarray = 0, face_chunk: int = 512,
                row_block: int = 16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view.

    vertices [N, 3], faces [F, 3] int32, colors [N, 3] in [0,1],
    pose [4, 4] world->cam, K [3, 3].  ``x0, y0`` offset the pixel window
    (the reference's clipped render, src/sphere.cpp:44-53).
    Returns (color [height, width, 3], depth [height, width]); background =
    color 0, depth 0.
    """
    vc = jnp.matmul(vertices, pose[:3, :3].T, precision="highest") + pose[:3, 3]
    fx, fy = K[0, 0], K[1, 1]
    ox, oy = K[0, 2], K[1, 2]
    # Work in window-centered screen coordinates: raw image coordinates are
    # O(10^3) and the edge-function constants multiply pairs of them, which
    # costs ~3 digits to cancellation in f32.  Centering keeps them O(10^2).
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    z = vc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    sx = fx * vc[:, 0] / zs + ox - cx_shift
    sy = fy * vc[:, 1] / zs + oy - cy_shift

    p = jnp.stack([sx, sy], axis=1)[faces]                     # [F, 3, 2]
    zc = z[faces]                                              # [F, 3]
    col = colors[faces]                                        # [F, 3, 3]

    M, valid = _face_matrix(p, zc, col)
    area = (M[:, 0, 0] * p[:, 0, 0] + M[:, 0, 1] * p[:, 0, 1] + M[:, 0, 2] +
            M[:, 1, 0] * p[:, 0, 0] + M[:, 1, 1] * p[:, 0, 1] + M[:, 1, 2] +
            M[:, 2, 0] * p[:, 0, 0] + M[:, 2, 1] * p[:, 0, 1] + M[:, 2, 2])

    F = faces.shape[0]
    padF = (-F) % face_chunk
    if padF:
        M = jnp.pad(M, ((0, padF), (0, 0), (0, 0)))
        area = jnp.pad(area, (0, padF))
        valid = jnp.pad(valid, (0, padF))

    padH = (-height) % row_block
    rows_total = height + padH
    cols = jnp.arange(width, dtype=jnp.float32) + 0.5 + x0 - cx_shift

    def do_block(r_start):
        rr = jnp.arange(row_block, dtype=jnp.float32)
        qy = (r_start + rr + 0.5 + y0 - cy_shift)[:, None]
        qx = cols[None, :]
        pix = jnp.stack([
            jnp.broadcast_to(qx, (row_block, width)),
            jnp.broadcast_to(qy, (row_block, width)),
            jnp.ones((row_block, width), jnp.float32)], axis=-1)
        d, c = _rasterize_rows(pix.reshape(-1, 3), M, area, valid, face_chunk)
        return d.reshape(row_block, width), c.reshape(row_block, width, 3)

    starts = jnp.arange(0, rows_total, row_block, dtype=jnp.float32)
    depth_b, color_b = jax.lax.map(do_block, starts)
    depth = depth_b.reshape(rows_total, width)[:height]
    color = color_b.reshape(rows_total, width, 3)[:height]

    depth = jnp.where(jnp.isinf(depth), 0.0, depth)
    return color, depth


def render_views(vertices: jnp.ndarray, faces: jnp.ndarray,
                 colors: jnp.ndarray, poses: jnp.ndarray, K: jnp.ndarray,
                 width: int, height: int,
                 face_chunk: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a batch of views: poses [V, 4, 4] -> (color [V, H, W, 3],
    depth [V, H, W]).  Sequential over views (lax.map) to bound memory;
    each view's rasterization is internally parallel."""
    def one(pose):
        return render_view(vertices, faces, colors, pose, K,
                           width=width, height=height, face_chunk=face_chunk)
    return jax.lax.map(one, poses)
