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

def _make_pair_kernel(tiles_x: int, tile: int, x0f: float, y0f: float,
                      face_chunk: int, n_tiles: int, npc: int, gch: int):
    """Pair-segment kernel: grid (view*tile, j); block j reads chunk
    ``lo[i]//fc + j - gch`` of the view's SHARED sorted-pair block list
    (global-section blocks for j < gch), via a scalar-prefetch index_map —
    no per-tile capacity-padded gather exists.  Chunk-boundary bleed-in
    (faces of the neighboring tile's segment) is harmless: their screen
    bboxes do not overlap this tile, so they can never cover a pixel.

    Global steps are PER-TILE gated: ``gidx[i*gch + k]`` lists (ascending,
    self-padded) the global chunks holding >=1 face whose screen bbox
    overlaps tile i, ``gn[i]`` counts them.  Tiles away from every large
    face skip the global walk entirely — with the ungated walk, a 294x294
    window rasterized e.g. a cube's 12 whole-window faces in all ~100
    tiles per view, the measured floor (~0.45 ms/view) for low-poly
    meshes (PROFILE_GEN_MESHES: 4-face tetra slower than a 1280-face
    sphere).

    Outputs (depth, winning slot) where slot indexes the view's extended
    pair-face table (sorted pairs then global slots), each block
    contributing ``block_local_base + argmin``."""
    fc = face_chunk

    def kernel(lo_ref, hi_ref, gidx_ref, gn_ref, m_ref, depth_ref, idx_ref,
               accd, acci):
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _init():
            accd[:] = jnp.full_like(accd, jnp.inf)
            acci[:] = jnp.zeros_like(acci)

        base = lo_ref[i] // fc
        bj = jnp.clip(base + j - gch, 0, npc - 1)
        in_global = (j < gch) & (j < gn_ref[i])
        gj = gidx_ref[i * gch + jnp.minimum(j, gch - 1)]
        # the lo < hi guard keeps silhouette-exterior tiles at init+emit
        # cost: with lo == hi and an unaligned lo, the chunk-overlap test
        # alone would grind one full (foreign) chunk per empty tile
        in_seg = ((j >= gch) & (lo_ref[i] < hi_ref[i]) &
                  (bj * fc < hi_ref[i]) & (bj * fc + fc > lo_ref[i]))

        @pl.when(in_global | in_seg)
        def _work():
            im = jax.lax.rem(i, n_tiles)
            ty = (im // tiles_x).astype(jnp.float32)
            tx = (im % tiles_x).astype(jnp.float32)
            p = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1),
                                         0)[:, 0]
            qx = tx * tile + (p % tile).astype(jnp.float32) + 0.5 + x0f
            qy = ty * tile + (p // tile).astype(jnp.float32) + 0.5 + y0f
            pix = jnp.stack([qx, qy, jnp.ones_like(qx)], axis=1)

            vals = jnp.dot(pix, m_ref[0],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            w0 = vals[:, 0 * fc:1 * fc]
            w1 = vals[:, 1 * fc:2 * fc]
            w2 = vals[:, 2 * fc:3 * fc]
            za = vals[:, 3 * fc:4 * fc]
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
            block_base = jnp.where(j < gch, (npc + gj) * fc, bj * fc)
            slot = (block_base + arg).reshape(sub, 128)
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






def eval_color_taps(slot_taps, depth_taps, pair_faces, attrs, xw, yw):
    """Affine color evaluation at a sparse grid of window pixels (one view).

    Same per-pixel math as _pair_attribute_epilogue, but only at the
    [n, m] tap grid whose window-centered coordinates are ``yw`` [n] rows
    x ``xw`` [m] cols — the 64x64 patch resample reads at most
    (2*64)^2 source pixels, ~5x fewer than the production window, and
    the full-window epilogue was ~60%% of fused generation-program time
    (PROFILE_GEN_r3.json: fused 1.64 vs kernel 0.5 ms/view).

    slot_taps int32 [n, m]; depth_taps [n, m]; pair_faces [S];
    attrs [F, 4, 3] affine rows (za, cb, cg, cr).  Returns [n, m, 3].
    """
    face = pair_faces[slot_taps.reshape(-1)]
    a = attrs.reshape(-1, 12)[face].reshape(slot_taps.shape + (4, 3))
    vals = (a[..., 0] * xw[None, :, None]
            + a[..., 1] * yw[:, None, None] + a[..., 2])      # [n, m, 4]
    zden = jnp.where(vals[..., 0] != 0.0, vals[..., 0], 1.0)
    color = vals[..., 1:4] / zden[..., None]
    covered = (depth_taps > 0.0)[..., None]
    return jnp.where(covered, color, 0.0)


def _pair_attribute_epilogue(depth, slot, pair_faces, attrs, width, height):
    """Per-pixel attribute evaluation for the pair-segment kernel: slot
    indexes the view's extended pair-face table directly (no per-tile
    arithmetic).  depth/slot [V, h, w]; pair_faces [V, S]; attrs
    [V, F, 4, 3] affine rows (za, cb, cg, cr)."""
    V, h, w = depth.shape
    face = jax.vmap(lambda pf, s: pf[s])(
        pair_faces, slot.reshape(V, -1))                         # [V, h*w]
    a = jax.vmap(lambda at, f: at[f])(
        attrs.reshape(V, -1, 12), face).reshape(V, h, w, 4, 3)

    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 - width * 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 - height * 0.5
    vals = (a[..., 0] * xs[None, None, :, None]
            + a[..., 1] * ys[None, :, None, None] + a[..., 2])   # [V,h,w,4]
    zden = jnp.where(vals[..., 0] != 0.0, vals[..., 0], 1.0)
    color = vals[..., 1:4] / zden[..., None]
    covered = (depth > 0.0)[..., None]
    return jnp.where(covered, color, 0.0)


def _round_capacity(capacity, F, face_chunk):
    return min(((capacity + face_chunk - 1) // face_chunk) * face_chunk,
               ((F + face_chunk - 1) // face_chunk) * face_chunk)


def _prepare_view_pairs(vertices, faces, colors, pose, K, width, height,
                        x0, y0, tile, face_chunk, G, npc,
                        front_sign=None):
    """Project + pair-bin + pack ONE pose for the pair-segment kernel.

    Returns (blocks [npc+gch, 3, 4*fc] — sorted-pair chunks then global
    chunks in kernel layout, lo/hi [nt] segment pair ranges,
    gact_idx [nt, gch] / gact_n [nt] per-tile active-global-chunk table,
    g_count scalar (for overflow detection),
    pair_faces [ (npc+gch)*fc ] slot->face table, attrs [F, 4, 3])."""
    from pose3d_tpu.render.rasterizer_tiled import (_project_and_pack,
                                                    bin_pairs)
    fc = face_chunk
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    M, area, valid, bb_min, bb_max = _project_and_pack(
        vertices, faces, colors, pose, K, cx_shift, cy_shift, front_sign)
    F = M.shape[0]
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile

    sorted_faces, starts, g_faces, g_count = bin_pairs(
        bb_min, bb_max, valid, tiles_x, tiles_y, tile,
        x0 - cx_shift, y0 - cy_shift, G)

    # per-tile active-global-chunk table: tile t only rasterizes global
    # chunks holding >=1 face whose screen bbox overlaps it (a face's bbox
    # contains the face, so a non-overlapping chunk can never cover a
    # pixel of the tile — the same invariant the pair path already rests
    # on).  Same tile-range arithmetic as bin_pairs.
    gch = G // fc
    inv_t = 1.0 / tile
    origin_x = x0 - cx_shift
    origin_y = y0 - cy_shift
    gbl = bb_min[g_faces]
    gbh = bb_max[g_faces]
    gtxl = jnp.floor((gbl[:, 0] - origin_x) * inv_t).astype(jnp.int32)
    gtxh = jnp.floor((gbh[:, 0] - origin_x) * inv_t).astype(jnp.int32)
    gtyl = jnp.floor((gbl[:, 1] - origin_y) * inv_t).astype(jnp.int32)
    gtyh = jnp.floor((gbh[:, 1] - origin_y) * inv_t).astype(jnp.int32)
    gvalid = jnp.arange(G) < g_count
    tx = jnp.arange(tiles_x, dtype=jnp.int32)
    ty = jnp.arange(tiles_y, dtype=jnp.int32)
    ox_hit = (gtxl[None, :] <= tx[:, None]) & (tx[:, None] <= gtxh[None, :])
    oy_hit = (gtyl[None, :] <= ty[:, None]) & (ty[:, None] <= gtyh[None, :])
    act = (oy_hit[:, None, :] & ox_hit[None, :, :] &
           gvalid[None, None, :])                       # [ty, tx, G]
    act = jnp.any(act.reshape(tiles_y * tiles_x, gch, fc), axis=-1)
    gact_n = jnp.sum(act, axis=1).astype(jnp.int32)     # [nt]
    # ascending active chunk indices, self-padded with the LAST active
    # one (or 0): consecutive inactive grid steps then map to an
    # already-fetched block, so Mosaic elides their copies
    score = jnp.where(act, gch - jnp.arange(gch, dtype=jnp.int32)[None, :],
                      0)
    vals, pos = jax.lax.top_k(score, gch)               # ascending chunks
    idx = jnp.where(vals > 0, pos, -1)
    last = jnp.max(jnp.where(idx >= 0, idx, 0), axis=1, keepdims=True)
    gact_idx = jnp.where(idx >= 0, idx, last).astype(jnp.int32)

    P = npc * fc
    pad = P - sorted_faces.shape[0]
    sf = jnp.pad(sorted_faces, (0, pad))       # pad with face 0: inert
    # (duplicate or non-overlapping VALID rows never change the z-buffer
    # winner — but INVALID faces, e.g. near-plane crossers with finite
    # bogus rows, live decoded in the sentinel/pad region and would
    # rasterize garbage if a chunk-aligned read straddles it, so zero
    # their rows at the source)
    M_am = (jnp.transpose(M[:, :4], (1, 0, 2))
            * valid[None, :, None])            # [4, F, 3] geometry rows
    Mp = M_am[:, sf]                           # [4, P, 3]
    # global rows: mask empty slots to zero so a partially-filled last
    # global chunk cannot rasterize anything
    gmask = (jnp.arange(G) < g_count)[None, :, None]
    Mg = M_am[:, g_faces] * gmask              # [4, G, 3]
    X = jnp.concatenate([Mp, Mg], axis=1)      # [4, P+G, 3]
    NB = npc + gch
    X = X.reshape(4, NB, fc, 3).transpose(1, 0, 2, 3)   # [NB, 4, fc, 3]
    blocks = X.reshape(NB, 4 * fc, 3).transpose(0, 2, 1)  # [NB, 3, 4fc]

    pair_faces = jnp.concatenate([sf, g_faces])          # [(npc+gch)*fc]
    lo = starts[:-1]
    hi = starts[1:]
    return blocks, lo, hi, gact_idx, gact_n, g_count, pair_faces, M[:, 3:7]


def _run_pair_kernel(blocks, lo, hi, gact_idx, gact_n, width, height, tile,
                     face_chunk, npc, gch, jseg, interpret):
    """Launch the pair-segment kernel over flattened (view, tile) programs.
    blocks [V*NB, 3, 4fc]; lo/hi/gact_n [VT]; gact_idx [VT*gch].  Returns
    per-view stitched (depth [V, h, w], slot [V, h, w])."""
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    n_tiles = tiles_x * tiles_y
    VT = lo.shape[0]
    V = VT // n_tiles
    NB = npc + gch
    fc = face_chunk
    sub = tile * tile // 128

    kernel = _make_pair_kernel(tiles_x, tile, -width * 0.5, -height * 0.5,
                               fc, n_tiles, npc, gch)

    def m_index(i, j, lo_ref, hi_ref, gidx_ref, gn_ref):
        # Clamp INACTIVE steps to the previous step's block index: the
        # Mosaic pipeline elides the block copy when consecutive grid
        # steps map to the same block, so steps past a tile's actual
        # segment (or past its active-global list) cost neither DMA
        # nor compute (the kernel body's in_global/in_seg gates already
        # skip the math).  jseg/gch are sized for the WORST tile; most
        # tiles' segments are far shorter, and silhouette-exterior tiles
        # are empty — without the clamp every one of them still fetched
        # gch + jseg 6 KB blocks per view.  Active steps are clamp-free:
        # gact_idx is self-padded past gact_n (prepare), and bj*fc < hi
        # implies bj <= seg_last, so fetched blocks match the body's
        # indexing.
        view = i // n_tiles
        base = lo_ref[i] // fc
        seg_last = jnp.maximum((hi_ref[i] - 1) // fc, base)
        bj = jnp.clip(base + j - gch, 0, jnp.minimum(seg_last, npc - 1))
        gj = gidx_ref[i * gch + jnp.minimum(j, gch - 1)]
        return (view * NB + jnp.where(j < gch, npc + gj, bj), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(VT, gch + jseg),
        in_specs=[
            pl.BlockSpec((1, 3, 4 * fc), m_index,
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
    )(lo, hi, gact_idx, gact_n, blocks)

    def stitch(t):
        t = t.reshape(V, tiles_y, tiles_x, tile, tile)
        return t.transpose(0, 1, 3, 2, 4).reshape(V, tiles_y * tile,
                                                  tiles_x * tile)
    return (stitch(depth_t)[:, :height, :width],
            stitch(slot_t)[:, :height, :width])


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

    XLA does the pair-sort face->tile binning (rasterizer_tiled.bin_pairs);
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
                                   "global_capacity", "return_overflow"))
def render_views_tiled_pallas(vertices: jnp.ndarray, faces: jnp.ndarray,
                              colors: jnp.ndarray, poses: jnp.ndarray,
                              K: jnp.ndarray, width: int, height: int,
                              x0: int = 0, y0: int = 0, tile: int = 32,
                              capacity: int = 1024, face_chunk: int = 128,
                              global_capacity: int | None = None,
                              interpret: bool = False,
                              return_overflow: bool = False):
    """Batched tile-culled Pallas rendering: poses [V, 4, 4] ->
    (color [V, h, w, 3], depth [V, h, w]).

    The per-view prepare (projection, pair-sort binning, one gather in
    sorted pair order) is vmapped — one batched sort/gather for all V
    views — and the kernel runs one grid over the flattened (view, tile)
    axis, each tile reading its SEGMENT of the view's shared sorted-pair
    block list via a scalar-prefetch index_map (no per-tile
    capacity-padded table exists; blocks are [4*F pairs + global] x 4
    geometry rows ≈ 3.9 MB/view at 20k faces, independent of tile count).
    ``capacity`` bounds only the per-tile chunk GRID (overflowing tails
    are dropped, as in the XLA path); ``global_capacity`` bounds the
    >2x2-tile face section (size it with
    rasterizer_tiled.count_large_faces; zero-cost when no such faces
    exist thanks to the section-aware chunk skipping).
    """
    return _render_views_pairs(vertices, faces, colors, poses, K,
                               jnp.full(poses.shape[:1], float(x0)),
                               jnp.full(poses.shape[:1], float(y0)),
                               width, height, tile, capacity, face_chunk,
                               global_capacity, interpret, return_overflow)


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "interpret",
                                   "global_capacity"))
def _render_views_slots(vertices, faces, colors, poses, K, x0s, y0s,
                        width, height, tile, capacity, face_chunk,
                        global_capacity, interpret, front_sign=None):
    """Batched pair-segment z-buffer pass (traced per-view origins), no
    color epilogue: returns (depth [V, h, w], slot [V, h, w],
    pair_faces [V, S], attrs [V, F, 4, 3], overflow).

    The kernel only ever sees window-centered coordinates
    (x0 - cx_shift == -width/2, a constant), so per-view origins cost
    nothing there; the origin enters solely through the projection shift
    inside the prepare, which traces fine.  One compiled program renders
    every (possibly off-center) window of a given static size."""
    F = faces.shape[0]
    fc = face_chunk
    cap = _round_capacity(capacity, F, fc)
    G = ((max(128, global_capacity or fc) + fc - 1) // fc) * fc
    npc = (4 * F + fc - 1) // fc
    gch = G // fc
    # +1 chunk: segments are read chunk-ALIGNED, so a capacity-sized
    # segment can straddle one extra chunk boundary
    jseg = min(npc, cap // fc + 1)

    blocks, lo, hi, gact_idx, gact_n, g_count, pair_faces, attrs = jax.vmap(
        lambda p, xx, yy: _prepare_view_pairs(vertices, faces, colors, p,
                                              K, width, height, xx, yy,
                                              tile, fc, G, npc, front_sign)
    )(poses, x0s, y0s)
    V, NB = blocks.shape[:2]
    blocks = blocks.reshape((V * NB,) + blocks.shape[2:])
    depth, slot = _run_pair_kernel(blocks, lo.reshape(-1), hi.reshape(-1),
                                   gact_idx.reshape(-1),
                                   gact_n.reshape(-1), width, height, tile,
                                   fc, npc, gch, jseg, interpret)
    # geometry dropped iff a tile's pair segment exceeds the chunk
    # budget the kernel walks (jseg chunks cover >= cap faces from the
    # aligned base) or the >2x2-tile population exceeds G
    overflow = (jnp.max(hi - lo) > cap) | (jnp.max(g_count) > G)
    return depth, slot, pair_faces, attrs, overflow


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "interpret",
                                   "global_capacity", "return_overflow"))
def _render_views_pairs(vertices, faces, colors, poses, K, x0s, y0s,
                        width, height, tile, capacity, face_chunk,
                        global_capacity, interpret,
                        return_overflow: bool = False, front_sign=None):
    """Batched pair-segment Pallas rendering with the full-window color
    epilogue (see _render_views_slots for the split)."""
    depth, slot, pair_faces, attrs, overflow = _render_views_slots(
        vertices, faces, colors, poses, K, x0s, y0s, width, height, tile,
        capacity, face_chunk, global_capacity, interpret, front_sign)
    color = _pair_attribute_epilogue(depth, slot, pair_faces, attrs,
                                     width, height)
    if return_overflow:
        return color, depth, overflow
    return color, depth


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "interpret", "x0", "y0",
                                   "global_capacity"))
def render_views_slots_pallas(vertices: jnp.ndarray, faces: jnp.ndarray,
                              colors: jnp.ndarray, poses: jnp.ndarray,
                              K: jnp.ndarray, width: int, height: int,
                              x0: int = 0, y0: int = 0, tile: int = 32,
                              capacity: int = 1024, face_chunk: int = 128,
                              global_capacity: int | None = None,
                              interpret: bool = False, front_sign=None):
    """Batched z-buffer rendering WITHOUT the color epilogue.

    Returns (depth [V, h, w], slot [V, h, w], pair_faces [V, S],
    attrs [V, F, 4, 3], overflow).  Callers that consume color only at a
    sparse pixel set (the 64x64 patch taps — dataset generation) gather
    slot/attrs there and use eval_color_taps, skipping the full-window
    epilogue entirely.  ``front_sign`` (traced scalar, None/0 = off)
    culls backfaces of closed oriented meshes before binning."""
    return _render_views_slots(vertices, faces, colors, poses, K,
                               jnp.full(poses.shape[:1], float(x0)),
                               jnp.full(poses.shape[:1], float(y0)),
                               width, height, tile, capacity, face_chunk,
                               global_capacity, interpret, front_sign)


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
    color, depth = _render_views_pairs(
        vertices, faces, colors, jnp.asarray(poses), K,
        jnp.asarray(x0s, jnp.float32), jnp.asarray(y0s, jnp.float32),
        width=w, height=h, tile=tile, capacity=capacity,
        face_chunk=face_chunk, global_capacity=global_capacity,
        interpret=interpret)
    return color, depth, x0s, y0s
