"""Component profile of the tiled-Pallas render path on the live device:
binning (sort + gather + pack) vs the Pallas z-buffer kernel itself.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_render.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp


def timed(jfn, args, n_lo=4, n_hi=68):
    def chain(a, n):
        def body(i, c):
            out = jfn(*a[:-1], c)
            return c * (1.0 + 1e-12 * out)
        r = jax.lax.fori_loop(0, n, body, a[-1])
        return jnp.sum(r)
    jc = jax.jit(chain, static_argnums=(1,))
    float(jc(args, n_lo))
    float(jc(args, n_hi))
    t0 = time.perf_counter(); float(jc(args, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jc(args, n_hi))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    from pose3d_tpu.render import make_test_mesh
    from pose3d_tpu.render.rasterizer_tiled import (_project_and_pack,
                                                    bin_faces_to_tiles,
                                                    max_tile_overlap)
    from pose3d_tpu.data.benchmarks import LINEMOD_K

    mesh = make_test_mesh("sphere", 0.1, detail=5)
    fx = float(LINEMOD_K[0, 0])
    z, m, border = 0.4, 0.2, 4
    sw = int(fx * m / z) + 2 * border
    sh = int(float(LINEMOD_K[1, 1]) * m / z) + 2 * border
    x0 = int(LINEMOD_K[0, 2]) - sw // 2
    y0 = int(LINEMOD_K[1, 2]) - sh // 2
    tile = 32
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = z

    overlap = max_tile_overlap(mesh.vertices, mesh.faces, mesh.colors,
                               pose, np.asarray(LINEMOD_K), sw, sh, x0, y0,
                               tile)
    capacity = max(256, int(np.ceil(overlap * 1.5 / 256)) * 256)
    tiles_x = (sw + tile - 1) // tile
    tiles_y = (sh + tile - 1) // tile
    print(f"device: {jax.devices()[0]} faces={len(mesh.faces)} "
          f"capacity={capacity} tiles={tiles_x}x{tiles_y}", flush=True)

    verts = jnp.asarray(mesh.vertices)
    faces = jnp.asarray(mesh.faces)
    colors = jnp.asarray(mesh.colors)
    K = jnp.asarray(LINEMOD_K)
    cx_shift = x0 + sw * 0.5
    cy_shift = y0 + sh * 0.5

    def project(scale):
        return _project_and_pack(verts, faces, colors,
                                 jnp.asarray(pose) * scale + (1 - scale)
                                 * jnp.asarray(pose), K, cx_shift, cy_shift)

    def proj_fn(s):
        M, area, valid, bmin, bmax = project(s)
        return jnp.sum(M) + jnp.sum(bmin)
    dt = timed(jax.jit(lambda s: proj_fn(s)), (jnp.float32(1.0),))
    print(f"project+pack       {dt*1e3:7.2f} ms", flush=True)

    M, area, valid, bb_min, bb_max = _project_and_pack(
        verts, faces, colors, jnp.asarray(pose), K, cx_shift, cy_shift)

    def bin_fn(bmin):
        fi, fo, seg, gc, _ = bin_faces_to_tiles(bmin, bb_max, valid, tiles_x,
                                             tiles_y, tile, x0 - cx_shift,
                                             y0 - cy_shift, capacity, 128)
        return jnp.sum(fi) + jnp.sum(seg) + gc
    dt = timed(jax.jit(bin_fn), (bb_min,))
    print(f"bin (sort+seg)     {dt*1e3:7.2f} ms", flush=True)

    # gather + pack (the M8[face_idx] materialization)
    area0 = jnp.where(valid, area, 0.0)
    arow = jnp.concatenate([jnp.zeros((len(area0), 1, 2)),
                            area0[:, None, None]], axis=2)
    M8 = jnp.concatenate([M, arow], axis=1)
    fi, fo, _, _, _ = bin_faces_to_tiles(bb_min, bb_max, valid, tiles_x,
                                      tiles_y, tile, x0 - cx_shift,
                                      y0 - cy_shift, capacity, 128)

    def gather_fn(m8):
        m_am = jnp.transpose(m8[:, :7], (1, 0, 2))          # [7, F, 3]
        n_tiles = fi.shape[0]
        ct = fi.shape[1]
        fc = 128
        nch = ct // fc
        Mt = m_am[:, fi] * fo[None, ..., None]
        Mt = Mt.reshape(7, n_tiles, nch, fc, 3)
        mt = jnp.transpose(Mt, (1, 2, 0, 3, 4)).reshape(n_tiles, -1, 3)
        return jnp.sum(mt)
    dt = timed(jax.jit(gather_fn), (M8,))
    print(f"gather+pack (am)   {dt*1e3:7.2f} ms", flush=True)

    # old binning for comparison: per-tile top_k over all faces
    def topk_bin(bmin):
        def one(t):
            ty = t // tiles_x
            tx = t % tiles_x
            lo_x = (tx * tile + x0 - cx_shift).astype(jnp.float32)
            lo_y = (ty * tile + y0 - cy_shift).astype(jnp.float32)
            overlap = ((bb_max[:, 0] >= lo_x) & (bmin[:, 0] < lo_x + tile) &
                       (bb_max[:, 1] >= lo_y) & (bmin[:, 1] < lo_y + tile) &
                       valid)
            score, idx = jax.lax.top_k(overlap.astype(jnp.int32), capacity)
            return idx, score
        idx, score = jax.lax.map(one, jnp.arange(tiles_x * tiles_y))
        return jnp.sum(idx) + jnp.sum(score)
    dt = timed(jax.jit(topk_bin), (bb_min,))
    print(f"bin (old top_k)    {dt*1e3:7.2f} ms", flush=True)

    # full render for reference
    from pose3d_tpu.render.rasterizer_pallas import render_view_tiled_pallas

    def full_fn(p):
        col, dep = render_view_tiled_pallas(
            verts, faces, colors, p, K, width=sw, height=sh, x0=x0, y0=y0,
            tile=tile, capacity=capacity, face_chunk=128)
        return jnp.sum(dep)
    dt = timed(jax.jit(full_fn), (jnp.asarray(pose),))
    print(f"full pallas render {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
