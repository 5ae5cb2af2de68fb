"""Tile-culled rasterization — the production render path.

The brute-force rasterizer (rasterizer.py) evaluates every (pixel, face)
pair: O(P*F) work where typically <2% of faces touch a given 64x64 pixel
tile.  This version bins faces to tiles first (screen-bbox overlap test +
``top_k`` to a fixed per-tile capacity — XLA-friendly fixed shapes), then
runs the same affine-evaluation inner loop per tile against only its faces.
For a LineMOD-scale render (294^2 window, ~20k faces) this cuts arithmetic
by ~20-100x; the inner loop stays the shared `_rasterize_rows` so both
paths are bit-identical per covered pixel.

Capacity overflow policy: faces beyond ``capacity`` per tile are dropped
(silently at trace time — validate with ``max_tile_overlap`` which reports
the true per-tile maximum for a mesh/pose so callers can size capacity).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pose3d_tpu.render.rasterizer import (_face_matrix, _rasterize_rows,
                                          NEAR)


def _project_and_pack(vertices, faces, colors, pose, K, cx_shift, cy_shift,
                      front_sign=None):
    """Project + per-face affine rows + screen bboxes.

    ``front_sign`` (traced scalar, None/0 = off) enables backface culling:
    faces with ``area * front_sign <= 0`` are invalidated before binning,
    halving face-tile incidences for closed meshes.  Only safe when
    render.mesh.front_sign proved the mesh closed + consistently oriented
    (the z-buffer winner is then provably unchanged); traced (not static)
    so culled and unculled meshes share one compiled program."""
    vc = jnp.matmul(vertices, pose[:3, :3].T,
                    precision="highest") + pose[:3, 3]
    fx, fy = K[0, 0], K[1, 1]
    ox, oy = K[0, 2], K[1, 2]
    z = vc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    sx = fx * vc[:, 0] / zs + ox - cx_shift
    sy = fy * vc[:, 1] / zs + oy - cy_shift

    p = jnp.stack([sx, sy], axis=1)[faces]
    zc = z[faces]
    col = colors[faces]
    M, valid = _face_matrix(p, zc, col)
    # point-degenerate faces (all three indices equal) are bucket padding
    # (dataset._render_patches pads face arrays with [0, 0, 0]); excluding
    # them here keeps them out of the binning so they neither occupy
    # capacity slots nor trip the overflow detector
    valid = valid & ~((faces[:, 0] == faces[:, 1]) &
                      (faces[:, 1] == faces[:, 2]))
    area = jnp.sum(M[:, 0:3, 0] * p[:, 0:1, 0] +
                   M[:, 0:3, 1] * p[:, 0:1, 1] + M[:, 0:3, 2], axis=1)
    if front_sign is not None:
        fs = jnp.asarray(front_sign, area.dtype)
        valid = valid & ((fs == 0.0) | (area * fs > 0.0))
    bb_min = jnp.min(p, axis=1)            # [F, 2]
    bb_max = jnp.max(p, axis=1)
    # faces touching the camera plane get degenerate screen bboxes; kill them
    bb_min = jnp.where(valid[:, None], bb_min, 1e9)
    bb_max = jnp.where(valid[:, None], bb_max, -1e9)
    return M, area, valid, bb_min, bb_max


def bin_faces_to_tiles(bb_min: jnp.ndarray, bb_max: jnp.ndarray,
                       valid: jnp.ndarray, tiles_x: int, tiles_y: int,
                       tile: int, origin_x, origin_y,
                       capacity: int, global_capacity: int = 128):
    """Counting-sort face->tile binning (replaces per-tile ``top_k``).

    The old binning ranked ALL padded faces per tile (n_tiles x top_k(F)) —
    the measured bottleneck of dataset generation.  Here each *small* face
    (screen bbox spanning <= 2x2 tiles — virtually all faces of a dense
    mesh) emits up to 4 (tile, face) candidate pairs; ONE stable sort by
    tile id + searchsorted segment lookup then yields every tile's face
    list.  Faces spanning more tiles land in a short *global* section
    prepended to every tile (zero-padded when absent), so arbitrarily large
    triangles stay correct.

    Overlap semantics match the previous test exactly:
    ``bb_max >= lo && bb_min < lo + tile`` per axis.

    Overflow policy: large faces beyond ``global_capacity`` are DROPPED
    (trace-time static shapes) — size G with ``count_large_faces`` exactly
    like ``capacity`` is sized with ``max_tile_overlap``.  Dense meshes at
    sane view distances have zero large faces, in which case the global
    section costs nothing (g_count == 0 lets consumers skip it).

    Returns (face_idx [n_tiles, G+capacity] int32 — G global slots then
             the per-tile segment,
             face_ok  [n_tiles, G+capacity] bool,
             seg_len  [n_tiles] int32 — real faces in the segment section,
             g_count  scalar int32 — real faces in the global section,
             overflow scalar bool — True when any tile's face count exceeds
             ``capacity`` or the large-face population exceeds
             ``global_capacity``, i.e. geometry was dropped).
    """
    F = bb_min.shape[0]
    n_tiles = tiles_x * tiles_y
    G = global_capacity
    sorted_faces, starts, g_faces, g_count = bin_pairs(
        bb_min, bb_max, valid, tiles_x, tiles_y, tile,
        origin_x, origin_y, G)

    raw_len = starts[1:] - starts[:-1]
    overflow = (jnp.max(raw_len) > capacity) | (g_count > G)
    seg_len = jnp.minimum(raw_len, capacity)
    gidx = jnp.clip(starts[:-1, None] + jnp.arange(capacity)[None],
                    0, 4 * F - 1)
    seg_faces = sorted_faces[gidx]                 # [n_tiles, capacity]
    seg_ok = jnp.arange(capacity)[None, :] < seg_len[:, None]
    g_ok = jnp.arange(G) < g_count

    face_idx = jnp.concatenate(
        [jnp.broadcast_to(g_faces[None], (n_tiles, G)),
         seg_faces], axis=1).astype(jnp.int32)
    face_ok = jnp.concatenate(
        [jnp.broadcast_to(g_ok[None], (n_tiles, G)), seg_ok], axis=1)
    return face_idx, face_ok, seg_len.astype(jnp.int32), g_count, overflow


def bin_pairs(bb_min: jnp.ndarray, bb_max: jnp.ndarray,
              valid: jnp.ndarray, tiles_x: int, tiles_y: int,
              tile: int, origin_x, origin_y, global_capacity: int = 128):
    """Pair-ordered variant of :func:`bin_faces_to_tiles` for consumers
    that read per-tile SEGMENTS of one shared sorted pair list instead of
    gathering a capacity-padded face table per tile (3x less gather/memory
    at LineMOD density — the padded table repeats every face for every
    slot of every tile it does not fill).

    Same candidate-pair emission and overlap semantics; returns
    (sorted_faces [4F] int32 — face ids in (tile, original-order) order,
     starts [n_tiles+1] int32 — tile t's pairs live at
       sorted_faces[starts[t]:starts[t+1]],
     g_faces [G] int32 / g_count scalar — the shared >2x2-tile section).
    Pairs at/after starts[n_tiles] are sentinel padding (arbitrary ids)."""
    F = bb_min.shape[0]
    n_tiles = tiles_x * tiles_y
    inv_t = 1.0 / tile

    txl = jnp.floor((bb_min[:, 0] - origin_x) * inv_t).astype(jnp.int32)
    txh = jnp.floor((bb_max[:, 0] - origin_x) * inv_t).astype(jnp.int32)
    tyl = jnp.floor((bb_min[:, 1] - origin_y) * inv_t).astype(jnp.int32)
    tyh = jnp.floor((bb_max[:, 1] - origin_y) * inv_t).astype(jnp.int32)

    empty = (~valid | (txh < 0) | (tyh < 0) |
             (txl > tiles_x - 1) | (tyl > tiles_y - 1))
    cxl = jnp.clip(txl, 0, tiles_x - 1)
    cxh = jnp.clip(txh, 0, tiles_x - 1)
    cyl = jnp.clip(tyl, 0, tiles_y - 1)
    cyh = jnp.clip(tyh, 0, tiles_y - 1)
    small = ~empty & (cxh - cxl <= 1) & (cyh - cyl <= 1)
    large = ~empty & ~small

    sent = jnp.int32(n_tiles)
    t00 = cyl * tiles_x + cxl
    t10 = cyl * tiles_x + cxh
    t01 = cyh * tiles_x + cxl
    t11 = cyh * tiles_x + cxh
    pair_tile = jnp.stack([
        jnp.where(small, t00, sent),
        jnp.where(small & (cxh > cxl), t10, sent),
        jnp.where(small & (cyh > cyl), t01, sent),
        jnp.where(small & (cxh > cxl) & (cyh > cyl), t11, sent),
    ], axis=1).reshape(-1)
    pair_bits = max(1, (4 * F - 1).bit_length())
    if (n_tiles + 1) << pair_bits < 2**31:
        key = (pair_tile << pair_bits) | jnp.arange(4 * F, dtype=jnp.int32)
        skey = jnp.sort(key)
        sorted_tiles = skey >> pair_bits
        sorted_faces = (skey & ((1 << pair_bits) - 1)) >> 2
    else:
        order = jnp.argsort(pair_tile, stable=True)
        sorted_tiles = pair_tile[order]
        sorted_faces = order >> 2

    starts = jnp.searchsorted(sorted_tiles,
                              jnp.arange(n_tiles + 1, dtype=jnp.int32)
                              ).astype(jnp.int32)

    G = global_capacity
    gscore, g_faces = jax.lax.top_k(large.astype(jnp.int32), min(G, F))
    if G > F:
        gscore = jnp.pad(gscore, (0, G - F))
        g_faces = jnp.pad(g_faces, (0, G - F))
    # UNCLIPPED total so callers can detect global-section overflow
    # (consumers mask slots with ``arange(G) < g_count``, which saturates
    # at G by construction, so the unclipped value is safe everywhere)
    g_count = jnp.sum(large.astype(jnp.int32))
    # zero the ids of empty global slots so gathered rows are inert
    g_faces = jnp.where(gscore > 0, g_faces, 0).astype(jnp.int32)
    return sorted_faces.astype(jnp.int32), starts, g_faces, g_count


@partial(jax.jit, static_argnames=("width", "height", "tile", "capacity",
                                   "face_chunk", "global_capacity",
                                   "return_overflow"))
def render_view_tiled(vertices: jnp.ndarray, faces: jnp.ndarray,
                      colors: jnp.ndarray, pose: jnp.ndarray,
                      K: jnp.ndarray, width: int, height: int,
                      x0: int = 0, y0: int = 0, tile: int = 64,
                      capacity: int = 1024,
                      face_chunk: int = 256,
                      global_capacity: int | None = None,
                      return_overflow: bool = False,
                      front_sign=None
                      ) -> Tuple[jnp.ndarray, ...]:
    """Tile-culled render; same contract as rasterizer.render_view.

    ``return_overflow=True`` appends a scalar bool that is True when the
    binning dropped geometry (per-tile capacity or global-section
    overflow) — callers resize and re-render instead of silently
    producing holes.  ``front_sign`` (traced scalar) enables backface
    culling for closed oriented meshes (see _project_and_pack)."""
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    M, area, valid, bb_min, bb_max = _project_and_pack(
        vertices, faces, colors, pose, K, cx_shift, cy_shift, front_sign)

    # pad the face axis so both top_k and the chunked inner loop see
    # face_chunk multiples
    F = faces.shape[0]
    padF = (-F) % face_chunk
    if padF:
        M = jnp.pad(M, ((0, padF), (0, 0), (0, 0)))
        area = jnp.pad(area, (0, padF))
        valid = jnp.pad(valid, (0, padF))
        bb_min = jnp.pad(bb_min, ((0, padF), (0, 0)),
                         constant_values=1e9)
        bb_max = jnp.pad(bb_max, ((0, padF), (0, 0)),
                         constant_values=-1e9)
    F_padded = F + padF
    capacity = min(((capacity + face_chunk - 1) // face_chunk) * face_chunk,
                   F_padded)
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile

    # tile bounds in the centered coordinate frame
    tx0 = (jnp.arange(tiles_x) * tile + x0 - cx_shift).astype(jnp.float32)
    ty0 = (jnp.arange(tiles_y) * tile + y0 - cy_shift).astype(jnp.float32)

    # counting-sort binning: one sort instead of a top_k over all faces
    # per tile; big faces ride the shared global section (size it with
    # count_large_faces when a mesh/pose can exceed the default)
    G = ((max(128, global_capacity or face_chunk) + face_chunk - 1)
         // face_chunk) * face_chunk
    face_idx, face_ok, _, _, overflow = bin_faces_to_tiles(
        bb_min, bb_max, valid, tiles_x, tiles_y, tile,
        x0 - cx_shift, y0 - cy_shift, capacity, G)

    def do_tile(t):
        ty = t // tiles_x
        tx = t % tiles_x
        lo_x = tx0[tx]
        lo_y = ty0[ty]

        idx = face_idx[t]
        okm = face_ok[t]
        Mt = M[idx]
        areat = jnp.where(okm, area[idx], 0.0)
        validt = okm

        rr = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0)
        cc = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1)
        qx = lo_x + cc + 0.5
        qy = lo_y + rr + 0.5
        pix = jnp.stack([qx, qy, jnp.ones_like(qx)], axis=-1).reshape(-1, 3)
        d, c = _rasterize_rows(pix, Mt, areat, validt, face_chunk)
        return d.reshape(tile, tile), c.reshape(tile, tile, 3)

    depth_t, color_t = jax.lax.map(do_tile, jnp.arange(tiles_y * tiles_x))
    # stitch [T, tile, tile] -> [H, W]
    depth = depth_t.reshape(tiles_y, tiles_x, tile, tile)
    depth = depth.transpose(0, 2, 1, 3).reshape(tiles_y * tile,
                                                tiles_x * tile)
    color = color_t.reshape(tiles_y, tiles_x, tile, tile, 3)
    color = color.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tile,
                                                   tiles_x * tile, 3)
    depth = jnp.where(jnp.isinf(depth), 0.0, depth)[:height, :width]
    if return_overflow:
        return color[:height, :width], depth, overflow
    return color[:height, :width], depth


def max_tile_overlap(vertices, faces, colors, pose, K, width, height,
                     x0: int = 0, y0: int = 0, tile: int = 64,
                     front_sign=None) -> int:
    """True maximum face count over tiles for capacity sizing (host utility,
    not jitted into the hot path)."""
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    _, _, valid, bb_min, bb_max = _project_and_pack(
        jnp.asarray(vertices), jnp.asarray(faces), jnp.asarray(colors),
        jnp.asarray(pose), jnp.asarray(K), cx_shift, cy_shift, front_sign)
    import numpy as np
    bb_min = np.asarray(bb_min)
    bb_max = np.asarray(bb_max)
    valid = np.asarray(valid)
    best = 0
    for ty in range(0, height, tile):
        for tx in range(0, width, tile):
            lo_x = tx + x0 - cx_shift
            lo_y = ty + y0 - cy_shift
            n = int(np.sum((bb_max[:, 0] >= lo_x) &
                           (bb_min[:, 0] < lo_x + tile) &
                           (bb_max[:, 1] >= lo_y) &
                           (bb_min[:, 1] < lo_y + tile) & valid))
            best = max(best, n)
    return best


def count_large_faces(vertices, faces, colors, pose, K, width, height,
                      x0: int = 0, y0: int = 0, tile: int = 64,
                      front_sign=None) -> int:
    """Faces whose screen bbox spans more than 2x2 tiles for a mesh/pose —
    the population of the binning's shared global section.  Host utility
    for sizing ``global_capacity`` (cf. max_tile_overlap for ``capacity``);
    zero for dense meshes at sane view distances."""
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    _, _, valid, bb_min, bb_max = _project_and_pack(
        jnp.asarray(vertices), jnp.asarray(faces), jnp.asarray(colors),
        jnp.asarray(pose), jnp.asarray(K), cx_shift, cy_shift, front_sign)
    import numpy as np
    bb_min = np.asarray(bb_min)
    bb_max = np.asarray(bb_max)
    ok = np.asarray(valid)
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    txl = np.clip(np.floor((bb_min[:, 0] - (x0 - cx_shift)) / tile), 0,
                  tiles_x - 1)
    txh = np.clip(np.floor((bb_max[:, 0] - (x0 - cx_shift)) / tile), 0,
                  tiles_x - 1)
    tyl = np.clip(np.floor((bb_min[:, 1] - (y0 - cy_shift)) / tile), 0,
                  tiles_y - 1)
    tyh = np.clip(np.floor((bb_max[:, 1] - (y0 - cy_shift)) / tile), 0,
                  tiles_y - 1)
    return int(np.sum(ok & ((txh - txl > 1) | (tyh - tyl > 1))))


@partial(jax.jit, static_argnames=("width", "height", "x0", "y0", "tile"))
def probe_capacity(vertices: jnp.ndarray, faces: jnp.ndarray,
                   poses: jnp.ndarray, K: jnp.ndarray, width: int,
                   height: int, x0: int = 0, y0: int = 0, tile: int = 32,
                   front_sign=None):
    """Batched capacity probe: ONE device program computing, over a pose
    spread [P, 4, 4], the worst-case per-tile face overlap and the
    worst-case count of >2x2-tile ("large") faces.

    Replaces per-pose host loops (``max_tile_overlap``/``count_large_faces``
    called 8+8 times per mesh), which cost one host-synced round trip each —
    seconds of latency per call through a tunneled device.  Returns two
    int32 scalars (fetch them together with one ``jax.device_get``).

    Semantics match the host utilities exactly: overlap test
    ``bb_max >= lo && bb_min < lo + tile`` per axis; ``large`` is the
    population of the binning's shared global section (``bin_pairs``).
    Bucket-padding point-degenerate faces are excluded, as in
    ``_project_and_pack``.
    """
    cx_shift = x0 + width * 0.5
    cy_shift = y0 + height * 0.5
    origin_x = x0 - cx_shift
    origin_y = y0 - cy_shift
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    fx, fy = K[0, 0], K[1, 1]
    ox, oy = K[0, 2], K[1, 2]
    inv_t = 1.0 / tile
    degenerate = ((faces[:, 0] == faces[:, 1]) &
                  (faces[:, 1] == faces[:, 2]))

    def one(pose):
        vc = jnp.matmul(vertices, pose[:3, :3].T,
                        precision="highest") + pose[:3, 3]
        z = vc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        sx = fx * vc[:, 0] / zs + ox - cx_shift
        sy = fy * vc[:, 1] / zs + oy - cy_shift
        p = jnp.stack([sx, sy], axis=1)[faces]
        valid = jnp.all(z[faces] > NEAR, axis=1) & ~degenerate
        if front_sign is not None:
            # shoelace area == _face_matrix's edge-function sum, so the
            # probe sizes capacity for exactly the faces the render bins
            area = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
                    - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1]))
            fs = jnp.asarray(front_sign, area.dtype)
            valid = valid & ((fs == 0.0) | (area * fs > 0.0))
        bb_min = jnp.min(p, axis=1)
        bb_max = jnp.max(p, axis=1)

        txl = jnp.floor((bb_min[:, 0] - origin_x) * inv_t).astype(jnp.int32)
        txh = jnp.floor((bb_max[:, 0] - origin_x) * inv_t).astype(jnp.int32)
        tyl = jnp.floor((bb_min[:, 1] - origin_y) * inv_t).astype(jnp.int32)
        tyh = jnp.floor((bb_max[:, 1] - origin_y) * inv_t).astype(jnp.int32)
        empty = (~valid | (txh < 0) | (tyh < 0) |
                 (txl > tiles_x - 1) | (tyl > tiles_y - 1))
        cxl = jnp.clip(txl, 0, tiles_x - 1)
        cxh = jnp.clip(txh, 0, tiles_x - 1)
        cyl = jnp.clip(tyl, 0, tiles_y - 1)
        cyh = jnp.clip(tyh, 0, tiles_y - 1)
        w = jnp.where(empty, 0, 1)

        # per-tile overlap counts via a 2-D difference grid + prefix sums:
        # O(F) scatter instead of O(F * n_tiles) tests
        gw, gh = tiles_x + 1, tiles_y + 1
        grid = jnp.zeros((gh * gw,), jnp.int32)
        grid = (grid.at[cyl * gw + cxl].add(w)
                    .at[cyl * gw + cxh + 1].add(-w)
                    .at[(cyh + 1) * gw + cxl].add(-w)
                    .at[(cyh + 1) * gw + cxh + 1].add(w))
        counts = jnp.cumsum(jnp.cumsum(grid.reshape(gh, gw), axis=0),
                            axis=1)[:tiles_y, :tiles_x]
        small = ~empty & (cxh - cxl <= 1) & (cyh - cyl <= 1)
        n_large = jnp.sum((~empty & ~small).astype(jnp.int32))
        return jnp.max(counts), n_large

    mo, nl = jax.vmap(one)(poses)
    return jnp.max(mo), jnp.max(nl)


def render_views_tiled(vertices, faces, colors, poses, K, width, height,
                       tile: int = 64, capacity: int = 1024,
                       face_chunk: int = 256):
    """Batch over poses (lax.map keeps memory bounded)."""
    def one(pose):
        return render_view_tiled(vertices, faces, colors, pose, K,
                                 width=width, height=height, tile=tile,
                                 capacity=capacity, face_chunk=face_chunk)
    return jax.lax.map(one, poses)


def render_views_clipped(vertices, faces, colors, poses, K, corners,
                         img_w: int = 640, img_h: int = 480,
                         tile: int = 32, capacity: int = 1024,
                         face_chunk: int = 256):
    """Per-view bbox-clipped rendering — renderView(clipped=true)
    (reference src/sphere.cpp:37-67) over a pose batch.

    The window SIZE is static (max projected AABB extent over the poses,
    windows.clipped_windows) while each view's ORIGIN is a traced value, so
    one compiled program renders every off-center pose.  Returns
    (color [V, h, w, 3], depth [V, h, w], x0s [V], y0s [V]); pixel (r, c)
    of view i lives at image coordinates (x0s[i] + c, y0s[i] + r).
    """
    import numpy as np
    from pose3d_tpu.render.windows import clipped_windows
    x0s, y0s, w, h = clipped_windows(np.asarray(poses), np.asarray(K),
                                     np.asarray(corners), img_w, img_h,
                                     multiple=tile)

    def one(args):
        pose, x0, y0 = args
        return render_view_tiled(vertices, faces, colors, pose, K,
                                 width=w, height=h, x0=x0, y0=y0,
                                 tile=tile, capacity=capacity,
                                 face_chunk=face_chunk)

    color, depth = jax.lax.map(
        one, (jnp.asarray(poses), jnp.asarray(x0s), jnp.asarray(y0s)))
    return color, depth, x0s, y0s
