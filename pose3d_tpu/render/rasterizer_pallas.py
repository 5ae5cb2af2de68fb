"""Pallas TPU kernel for the rasterizer inner loop.

The XLA inner loop (rasterizer._rasterize_rows) materializes a
[pixels, faces, 8] intermediate per face chunk in HBM; this kernel keeps
everything in VMEM: grid = (pixel_tiles, face_chunks) with the face axis
minor, one [1024, 3] x [3, 8*Fc] MXU dot per step, a VPU epilogue, and the
running (depth, color) z-buffer in VMEM scratch that persists across the
face-chunk axis.  Outputs are written once, on the last face chunk.

Face data is packed attribute-major per chunk so the epilogue slices are
static: columns [a*Fc:(a+1)*Fc] of the dot result hold attribute a for all
faces of the chunk, attributes = (w0, w1, w2, area*zinv, 3x area*zinv*color,
area).

Same math as rasterizer.py (window-centered coordinates, both windings,
area-scaled coverage tolerance, near/far clipping), so outputs bit-match up
to reduction order.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pose3d_tpu.render.rasterizer import _face_matrix, NEAR, FAR

_TILE_P = 1024          # pixels per tile: fits an (8, 128) vreg layout
_EPS_AREA = 1e-12


def _kernel(pix_ref, m_ref, depth_ref, color_ref, accd, accc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        accd[:] = jnp.full_like(accd, jnp.inf)
        accc[:] = jnp.zeros_like(accc)

    vals = jnp.dot(pix_ref[:], m_ref[0], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    fc = vals.shape[1] // 8
    w0 = vals[:, 0 * fc:1 * fc]
    w1 = vals[:, 1 * fc:2 * fc]
    w2 = vals[:, 2 * fc:3 * fc]
    za = vals[:, 3 * fc:4 * fc]
    cb = vals[:, 4 * fc:5 * fc]
    cg = vals[:, 5 * fc:6 * fc]
    cr = vals[:, 6 * fc:7 * fc]
    ar = vals[:, 7 * fc:8 * fc]     # area row: constant per face

    s = jnp.sign(ar)
    tol = 1e-4 * jnp.abs(ar)
    inside = ((w0 * s >= -tol) & (w1 * s >= -tol) & (w2 * s >= -tol) &
              (jnp.abs(ar) > _EPS_AREA))
    zden = jnp.where(za != 0.0, za, 1.0)
    depth = ar / zden
    ok = inside & (depth > NEAR) & (depth <= FAR) & (za * s > 0)
    depth = jnp.where(ok, depth, jnp.inf)

    d = jnp.min(depth, axis=1)                              # [1024]
    arg = jnp.argmin(depth, axis=1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1)
              == arg[:, None])
    zsel = jnp.sum(jnp.where(onehot, zden, 0.0), axis=1)
    zsel = jnp.where(zsel != 0.0, zsel, 1.0)
    csel_b = jnp.sum(jnp.where(onehot, cb, 0.0), axis=1) / zsel
    csel_g = jnp.sum(jnp.where(onehot, cg, 0.0), axis=1) / zsel
    csel_r = jnp.sum(jnp.where(onehot, cr, 0.0), axis=1) / zsel

    d2 = d.reshape(8, 128)
    prev = accd[:]
    better = d2 < prev
    accd[:] = jnp.where(better, d2, prev)
    cstack = jnp.stack([csel_b.reshape(8, 128), csel_g.reshape(8, 128),
                        csel_r.reshape(8, 128)])
    accc[:] = jnp.where(better[None], cstack, accc[:])

    @pl.when(j == nj - 1)
    def _emit():
        final = accd[:]
        depth_ref[0] = jnp.where(jnp.isinf(final), 0.0, final)
        color_ref[0] = accc[:]


def _pack_faces(M: jnp.ndarray, area: jnp.ndarray, valid: jnp.ndarray,
                face_chunk: int) -> jnp.ndarray:
    """[F, 7, 3] + area + valid -> [3, n_chunks * 8 * Fc] attribute-major.

    Invalid faces get area 0 (rejected by the epilogue)."""
    F = M.shape[0]
    pad = (-F) % face_chunk
    area = jnp.where(valid, area, 0.0)
    arow = jnp.concatenate(
        [jnp.zeros((F, 1, 2)), area[:, None, None]], axis=2)  # (0,0,area)
    M8 = jnp.concatenate([M, arow], axis=1)                   # [F, 8, 3]
    if pad:
        M8 = jnp.pad(M8, ((0, pad), (0, 0), (0, 0)))
    n_chunks = M8.shape[0] // face_chunk
    # [n_chunks, Fc, 8, 3] -> [n_chunks, 8, Fc, 3] -> [3, n_chunks*8*Fc]
    M8 = M8.reshape(n_chunks, face_chunk, 8, 3).transpose(0, 2, 1, 3)
    return M8.reshape(n_chunks * 8 * face_chunk, 3).T, n_chunks


@partial(jax.jit, static_argnames=("width", "height", "face_chunk",
                                   "interpret"))
def render_view_pallas(vertices: jnp.ndarray, faces: jnp.ndarray,
                       colors: jnp.ndarray, pose: jnp.ndarray,
                       K: jnp.ndarray, width: int, height: int,
                       x0: int = 0, y0: int = 0,
                       face_chunk: int = 128, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as rasterizer.render_view, Pallas inner loop.
    ``interpret=True`` runs the kernel in the Pallas interpreter (for CPU
    tests)."""
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    vc = jnp.matmul(vertices, pose[:3, :3].T,
                    precision="highest") + pose[:3, 3]
    fx, fy = K[0, 0], K[1, 1]
    ox, oy = K[0, 2], K[1, 2]
    z = vc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    sx = fx * vc[:, 0] / zs + ox - cx_shift
    sy = fy * vc[:, 1] / zs + oy - cy_shift

    p = jnp.stack([sx, sy], axis=1)[faces]
    M, valid = _face_matrix(p, z[faces], colors[faces])
    area = jnp.sum(M[:, 0:3, 0] * p[:, 0:1, 0] +
                   M[:, 0:3, 1] * p[:, 0:1, 1] + M[:, 0:3, 2], axis=1)
    m_packed, n_chunks = _pack_faces(M, area, valid, face_chunk)

    # pixel matrix [T*1024, 3], padded
    P = width * height
    n_tiles = (P + _TILE_P - 1) // _TILE_P
    flat = jnp.arange(n_tiles * _TILE_P)
    qx = (flat % width).astype(jnp.float32) + 0.5 + x0 - cx_shift
    qy = (flat // width).astype(jnp.float32) + 0.5 + y0 - cy_shift
    pix = jnp.stack([qx, qy, jnp.ones_like(qx)], axis=1)

    depth_t, color_t = pl.pallas_call(
        _kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((_TILE_P, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8 * face_chunk), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, 128), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 3, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((3, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(pix, m_packed.reshape(1, 3, -1))

    depth = depth_t.reshape(-1)[:P].reshape(height, width)
    color = color_t.transpose(0, 2, 3, 1).reshape(-1, 3)[:P]
    return color.reshape(height, width, 3), depth


# ----------------------------------------------------------- tiled + Pallas

def _make_tile_kernel(tiles_x: int, tile: int, x0f: float, y0f: float,
                      face_chunk: int, n_tiles: int, g_cap: int):
    """Kernel for the culled path: pixel coordinates derived from the tile
    index (grid dim 0, modulo ``n_tiles`` so a flattened view axis rides
    for free); faces are this tile's culled chunk (grid dim 1).

    Two-pass design: the kernel streams only the GEOMETRY rows (w0, w1, w2,
    za) and z-buffers (depth, winning packed slot) — the color rows never
    enter the kernel.  Attributes are evaluated once per *pixel* afterwards
    (XLA epilogue in render_views_tiled_pallas) instead of once per
    (pixel, face-chunk) here, which halves the per-chunk VPU epilogue
    (no onehot-masked attribute selects) and cuts the dot + the packed
    gather volume from 7 rows to 4.

    The packed face list is [g_cap global slots | per-tile segment];
    scalar-prefetch ``g_ref`` / ``seg_ref`` hold the REAL face counts of
    each section, so zero-padded chunks — the whole global section when the
    mesh has no >2x2-tile faces (the common case), the segment tail, and
    entire silhouette-exterior tiles — are skipped, costing only
    init + emit."""

    def kernel(g_ref, seg_ref, m_ref, depth_ref, idx_ref, accd, acci):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            accd[:] = jnp.full_like(accd, jnp.inf)
            acci[:] = jnp.zeros_like(acci)

        start = j * face_chunk
        in_global = start < g_ref[i]
        in_seg = (start >= g_cap) & (start - g_cap < seg_ref[i])

        @pl.when(in_global | in_seg)
        def _work():
            im = jax.lax.rem(i, n_tiles)           # tile within the view
            ty = (im // tiles_x).astype(jnp.float32)
            tx = (im % tiles_x).astype(jnp.float32)
            p = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1),
                                         0)[:, 0]
            qx = tx * tile + (p % tile).astype(jnp.float32) + 0.5 + x0f
            qy = ty * tile + (p // tile).astype(jnp.float32) + 0.5 + y0f
            pix = jnp.stack([qx, qy, jnp.ones_like(qx)], axis=1)

            # full f32 (HIGHEST): a 3x-bf16 split-dot variant measured only
            # ~1% faster while adding ~7e-5 seam-pixel fuzz — the kernel is
            # epilogue-bound, so exact arithmetic is free in practice
            vals = jnp.dot(pix, m_ref[0],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            fc = vals.shape[1] // 4
            w0 = vals[:, 0 * fc:1 * fc]
            w1 = vals[:, 1 * fc:2 * fc]
            w2 = vals[:, 2 * fc:3 * fc]
            za = vals[:, 3 * fc:4 * fc]
            # the edge functions sum to the (constant) face area at every
            # pixel — the explicit area row was redundant, recomputing it
            # here cuts the dot and the packed layout
            ar = w0 + w1 + w2

            s = jnp.sign(ar)
            tol = 1e-4 * jnp.abs(ar)
            inside = ((w0 * s >= -tol) & (w1 * s >= -tol) &
                      (w2 * s >= -tol) & (jnp.abs(ar) > _EPS_AREA))
            zden = jnp.where(za != 0.0, za, 1.0)
            depth = ar / zden
            ok = inside & (depth > NEAR) & (depth <= FAR) & (za * s > 0)
            depth = jnp.where(ok, depth, jnp.inf)

            d = jnp.min(depth, axis=1)
            arg = jnp.argmin(depth, axis=1).astype(jnp.int32)

            sub = tile * tile // 128
            d2 = d.reshape(sub, 128)
            slot = (start + arg).reshape(sub, 128)
            prev = accd[:]
            better = d2 < prev
            accd[:] = jnp.where(better, d2, prev)
            acci[:] = jnp.where(better, slot, acci[:])

        @pl.when(j == nj - 1)
        def _emit():
            final = accd[:]
            depth_ref[0] = jnp.where(jnp.isinf(final), 0.0, final)
            idx_ref[0] = acci[:]

    return kernel


def _prepare_view(vertices, faces, colors, pose, K, width, height,
                  x0, y0, tile, capacity, face_chunk, G):
    """Project + bin + pack ONE pose -> (m_tiles [nt, 3, nch*4*fc],
    g_counts [nt], seg_len [nt], face_idx [nt, cap_tot],
    attrs [Fp, 4, 3]).  vmap-able over poses (the batched sort is the
    point: a lone 4F-element sort underutilizes the VPU lanes).

    Only the 4 geometry rows (w0, w1, w2, za) are gathered into the
    per-tile packed blocks; the attribute rows (za, cb, cg, cr) stay
    face-indexed in ``attrs`` for the per-pixel XLA epilogue."""
    from pose3d_tpu.render.rasterizer_tiled import (_project_and_pack,
                                                    bin_faces_to_tiles)
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    M, area, valid, bb_min, bb_max = _project_and_pack(
        vertices, faces, colors, pose, K, cx_shift, cy_shift)
    # no explicit area row: the kernel recomputes area = w0 + w1 + w2
    # (edge functions sum to the constant face area); invalid faces never
    # reach the kernel — the binning drops them

    F = M.shape[0]
    padF = (-F) % capacity if F < capacity else (-F) % face_chunk
    if padF:
        M = jnp.pad(M, ((0, padF), (0, 0), (0, 0)))
        bb_min = jnp.pad(bb_min, ((0, padF), (0, 0)), constant_values=1e9)
        bb_max = jnp.pad(bb_max, ((0, padF), (0, 0)), constant_values=-1e9)
        valid = jnp.pad(valid, (0, padF))

    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    n_tiles = tiles_x * tiles_y

    face_idx, face_ok, seg_len, g_count = bin_faces_to_tiles(
        bb_min, bb_max, valid, tiles_x, tiles_y, tile,
        x0 - cx_shift, y0 - cy_shift, capacity, G)

    cap_total = G + capacity
    n_chunks = cap_total // face_chunk
    # gather + pack with the ATTRIBUTE axis leading: the resulting
    # transpose moves contiguous [face_chunk, 3] blocks (1.5 KB) instead of
    # 12-byte granules — the naive face-major pack was transpose-bound
    M_am = jnp.transpose(M[:, :4], (1, 0, 2))      # [4, F, 3] geometry rows
    Mt = M_am[:, face_idx] * face_ok[None, ..., None]  # [4, nt, cap_tot, 3]
    Mt = Mt.reshape(4, n_tiles, n_chunks, face_chunk, 3)
    m_tiles = jnp.transpose(Mt, (1, 2, 0, 3, 4))   # [nt, nch, 4, fc, 3]
    m_tiles = m_tiles.reshape(n_tiles, -1, 3)
    m_tiles = jnp.transpose(m_tiles, (0, 2, 1))    # [nt, 3, nch*4*fc]
    return (m_tiles, jnp.broadcast_to(g_count, seg_len.shape), seg_len,
            face_idx, M[:, 3:7])


def _run_tile_kernel(m_tiles, g_counts, seg_len, width, height, x0, y0,
                     tile, face_chunk, g_cap, interpret):
    """Launch the z-buffer kernel over flattened (view, tile) programs and
    stitch per-view (depth, winning packed slot) images.  m_tiles
    [VT, 3, nch*4*fc], g_counts/seg_len [VT] (real face counts of the
    global/segment sections).  Returns (depth [V, h, w], slot [V, h, w])."""
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    n_tiles = tiles_x * tiles_y
    VT = m_tiles.shape[0]
    V = VT // n_tiles
    n_chunks = m_tiles.shape[2] // (4 * face_chunk)
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5

    sub = tile * tile // 128
    kernel = _make_tile_kernel(tiles_x, tile,
                               float(x0) - cx_shift, float(y0) - cy_shift,
                               face_chunk, n_tiles, g_cap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(VT, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, 4 * face_chunk), lambda i, j, *_: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sub, 128), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, 128), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.float32),
            pltpu.VMEM((sub, 128), jnp.int32),
        ],
    )
    depth_t, slot_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((VT, sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((VT, sub, 128), jnp.int32),
        ],
        interpret=interpret,
    )(g_counts, seg_len, m_tiles)

    # stitch tiles back per view
    def stitch(t):
        t = t.reshape(V, tiles_y, tiles_x, tile, tile)
        return t.transpose(0, 1, 3, 2, 4).reshape(V, tiles_y * tile,
                                                  tiles_x * tile)
    depth = stitch(depth_t)
    slot = stitch(slot_t)
    return depth[:, :height, :width], slot[:, :height, :width]


def _attribute_epilogue(depth, slot, face_idx, attrs, width, height,
                        x0, y0, tile):
    """Per-pixel attribute evaluation (pass 2 of the two-pass design).

    depth/slot [V, h, w] from the kernel; face_idx [V, nt, cap_tot];
    attrs [V, Fp, 4, 3] affine rows (za, cb, cg, cr).  Evaluates the
    winning face's color rows at each covered pixel — O(pixels) work
    instead of O(pixels x face-chunks) inside the kernel."""
    V, h, w = depth.shape
    tiles_x = (width + tile - 1) // tile
    cap_tot = face_idx.shape[2]
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5

    xs = jnp.arange(w, dtype=jnp.int32)
    ys = jnp.arange(h, dtype=jnp.int32)
    tid = (ys[:, None] // tile) * tiles_x + xs[None, :] // tile  # [h, w]
    lin = tid * cap_tot + slot                                   # [V, h, w]
    # row-granular gathers (vmapped advanced indexing -> gather with a
    # 12-float slice): take_along_axis with a repeated component index
    # lowers to element-granular gathers, ~100x slower on TPU
    face = jax.vmap(lambda fi, l: fi[l])(
        face_idx.reshape(V, -1), lin.reshape(V, -1))             # [V, h*w]
    a = jax.vmap(lambda at, f: at[f])(
        attrs.reshape(V, -1, 12), face).reshape(V, h, w, 4, 3)

    qx = xs.astype(jnp.float32) + 0.5 + (x0 - cx_shift)
    qy = ys.astype(jnp.float32) + 0.5 + (y0 - cy_shift)
    vals = (a[..., 0] * qx[None, None, :, None]
            + a[..., 1] * qy[None, :, None, None] + a[..., 2])   # [V,h,w,4]
    zden = jnp.where(vals[..., 0] != 0.0, vals[..., 0], 1.0)
    color = vals[..., 1:4] / zden[..., None]
    covered = (depth > 0.0)[..., None]
    return jnp.where(covered, color, 0.0)


def _round_capacity(capacity, F, face_chunk):
    return min(((capacity + face_chunk - 1) // face_chunk) * face_chunk,
               ((F + face_chunk - 1) // face_chunk) * face_chunk)


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "interpret", "x0", "y0",
                                   "global_capacity"))
def render_view_tiled_pallas(vertices: jnp.ndarray, faces: jnp.ndarray,
                             colors: jnp.ndarray, pose: jnp.ndarray,
                             K: jnp.ndarray, width: int, height: int,
                             x0: int = 0, y0: int = 0, tile: int = 32,
                             capacity: int = 1024, face_chunk: int = 128,
                             global_capacity: int | None = None,
                             interpret: bool = False):
    """Tile-culled rasterization with the Pallas inner loop.

    XLA does the face->tile binning (counting sort, rasterizer_tiled.py);
    the z-buffer loop runs in VMEM with persistent accumulators.  Same
    contract/outputs as render_view.
    """
    col, dep = render_views_tiled_pallas(
        vertices, faces, colors, pose[None], K, width=width, height=height,
        x0=x0, y0=y0, tile=tile, capacity=capacity, face_chunk=face_chunk,
        global_capacity=global_capacity, interpret=interpret)
    return col[0], dep[0]


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "interpret", "x0", "y0",
                                   "global_capacity"))
def render_views_tiled_pallas(vertices: jnp.ndarray, faces: jnp.ndarray,
                              colors: jnp.ndarray, poses: jnp.ndarray,
                              K: jnp.ndarray, width: int, height: int,
                              x0: int = 0, y0: int = 0, tile: int = 32,
                              capacity: int = 1024, face_chunk: int = 128,
                              global_capacity: int | None = None,
                              interpret: bool = False):
    """Batched tile-culled Pallas rendering: poses [V, 4, 4] ->
    (color [V, h, w, 3], depth [V, h, w]).

    The per-view prepare (projection, counting-sort binning, gather/pack)
    is vmapped — one batched sort/gather for all V views — and the kernel
    runs one grid over the flattened (view, tile) axis.  Keep V modest
    (~8): the packed face blocks are ~11 MB per view at LineMOD scale
    (4 geometry rows x capacity x tiles).
    ``global_capacity`` bounds the >2x2-tile face section (size it with
    rasterizer_tiled.count_large_faces; zero-cost when no such faces
    exist thanks to the section-aware chunk skipping).
    """
    F = faces.shape[0]
    cap = _round_capacity(capacity, F, face_chunk)
    G = ((max(128, global_capacity or face_chunk) + face_chunk - 1)
         // face_chunk) * face_chunk

    m_tiles, g_counts, seg_len, face_idx, attrs = jax.vmap(
        lambda p: _prepare_view(vertices, faces, colors, p, K, width,
                                height, x0, y0, tile, cap, face_chunk, G)
    )(poses)
    VT = m_tiles.shape[0] * m_tiles.shape[1]
    m_tiles = m_tiles.reshape((VT,) + m_tiles.shape[2:])
    depth, slot = _run_tile_kernel(m_tiles, g_counts.reshape(VT),
                                   seg_len.reshape(VT), width, height,
                                   x0, y0, tile, face_chunk, G, interpret)
    color = _attribute_epilogue(depth, slot, face_idx, attrs, width,
                                height, x0, y0, tile)
    return color, depth


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "interpret",
                                   "global_capacity"))
def _render_views_offsets(vertices, faces, colors, poses, K, x0s, y0s,
                          width, height, tile, capacity, face_chunk,
                          global_capacity, interpret):
    """Batched Pallas rendering with TRACED per-view window origins.

    The kernel and epilogue only ever see window-centered coordinates
    (x0 - cx_shift == -width/2, a constant), so per-view origins cost
    nothing there; the origin enters solely through the projection shift
    inside _prepare_view, which traces fine.  One compiled program renders
    every off-center window of a given static size."""
    F = faces.shape[0]
    cap = _round_capacity(capacity, F, face_chunk)
    G = ((max(128, global_capacity or face_chunk) + face_chunk - 1)
         // face_chunk) * face_chunk

    m_tiles, g_counts, seg_len, face_idx, attrs = jax.vmap(
        lambda p, xx, yy: _prepare_view(vertices, faces, colors, p, K,
                                        width, height, xx, yy, tile, cap,
                                        face_chunk, G)
    )(poses, x0s, y0s)
    VT = m_tiles.shape[0] * m_tiles.shape[1]
    m_tiles = m_tiles.reshape((VT,) + m_tiles.shape[2:])
    depth, slot = _run_tile_kernel(m_tiles, g_counts.reshape(VT),
                                   seg_len.reshape(VT), width, height,
                                   0, 0, tile, face_chunk, G, interpret)
    color = _attribute_epilogue(depth, slot, face_idx, attrs, width,
                                height, 0, 0, tile)
    return color, depth


def render_views_clipped_pallas(vertices, faces, colors, poses, K, corners,
                                img_w: int = 640, img_h: int = 480,
                                tile: int = 32, capacity: int = 1024,
                                face_chunk: int = 128,
                                global_capacity: int | None = None,
                                interpret: bool = False):
    """Per-view bbox-clipped rendering on the Pallas fast path —
    renderView(clipped=true) (reference src/sphere.cpp:37-67) over a pose
    batch.  Same contract as rasterizer_tiled.render_views_clipped:
    returns (color [V, h, w, 3], depth [V, h, w], x0s [V], y0s [V]) with
    a static window SIZE (max projected AABB extent over the poses) and
    traced per-view origins."""
    import numpy as np
    from pose3d_tpu.render.windows import clipped_windows
    x0s, y0s, w, h = clipped_windows(np.asarray(poses), np.asarray(K),
                                     np.asarray(corners), img_w, img_h,
                                     multiple=tile)
    color, depth = _render_views_offsets(
        vertices, faces, colors, jnp.asarray(poses), K,
        jnp.asarray(x0s, jnp.float32), jnp.asarray(y0s, jnp.float32),
        width=w, height=h, tile=tile, capacity=capacity,
        face_chunk=face_chunk, global_capacity=global_capacity,
        interpret=interpret)
    return color, depth, x0s, y0s
