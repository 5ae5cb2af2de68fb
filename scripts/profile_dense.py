"""Phase profile of DENSE-mesh rendering (subdiv-4 icosphere, 5120 faces).

PROFILE_GEN_MESHES.json shows the 5120-face sphere at 123 views/s vs 1425
for the 1280-face one — 11x worse per view for 4x the faces.  Real LineMOD
CAD meshes are this dense or denser, so supra-linear face scaling is the
live perf risk.  This script decomposes one production render chunk
(8 views, bucket-padded faces, speculative capacity — exactly what
data/dataset._render_patches dispatches) into:

  project    vertex transform + _face_matrix + screen bboxes
  bin        bin_pairs (the 4F-key sort + searchsorted + top_k)
  pack       sorted-order gather + block layout (the [4,4F,3] gather)
  kernel     the pair-segment Pallas z-buffer pass (slots minus prepare)
  slots      prepare + kernel (render_views_slots_pallas)
  patches    the fused production program (_render_program)

Both at the TRUE face count (5120) and at the production BUCKET (8192,
37.5% inert padding) to price the padding.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_dense.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, reps=3):
    """Median wall time of fn() (fn must block)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main(out_path=None):
    from pose3d_tpu.utils.tpuguard import require_tpu
    on_tpu = require_tpu()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import (_pow2_at_least,
                                         _speculative_capacity,
                                         _synth_window)
    from pose3d_tpu.ops.sphere import create_view_poses
    from pose3d_tpu.render import make_test_mesh
    from pose3d_tpu.render.mesh import front_sign
    from pose3d_tpu.render.rasterizer import _face_matrix
    from pose3d_tpu.render.rasterizer_tiled import bin_pairs
    from pose3d_tpu.render.rasterizer_pallas import (
        _prepare_view_pairs, render_views_slots_pallas)

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    results = {"device": str(dev), "platform": jax.default_backend()}

    K = LINEMOD_K
    fx, fy = float(K[0, 0]), float(K[1, 1])
    z = 0.4
    sw, sh, x0, y0, ox, oy = _synth_window(np.asarray(K), z)
    tile = 32
    Kj = jnp.asarray(K)

    mesh = make_test_mesh("sphere", 0.10, detail=4)
    F_true = len(mesh.faces)
    print(f"mesh: sphere d4, {F_true} faces, window {sw}x{sh}", flush=True)
    results["mesh_faces"] = F_true

    poses, _ = create_view_poses(2, (z, 1.1, 1.0), (-45.0, 15.0, 45.0),
                                 True)
    chunk = jnp.asarray(np.asarray(poses[:8], np.float32))
    fs = jnp.float32(front_sign(mesh))

    for tag, pad_to in (("true", F_true), ("bucket", 8192)):
        F = pad_to
        faces_np = np.concatenate(
            [mesh.faces, np.zeros((F - F_true, 3), np.int32)]) \
            if F > F_true else mesh.faces
        verts = jnp.asarray(mesh.vertices)
        faces = jnp.asarray(faces_np)
        colors = jnp.asarray(mesh.colors)
        bucket = _pow2_at_least(F, 2048)
        capacity, global_cap = _speculative_capacity("tpu", bucket, 2048,
                                                     512)
        results[f"{tag}_F"] = F
        results[f"{tag}_capacity"] = capacity

        fc = 128
        G = global_cap
        npc = (4 * F + fc - 1) // fc
        cx_shift = x0 + sw * 0.5
        cy_shift = y0 + sh * 0.5
        tiles_x = (sw + tile - 1) // tile
        tiles_y = (sh + tile - 1) // tile

        # --- project (+ face matrix + bboxes)
        from pose3d_tpu.render.rasterizer_tiled import _project_and_pack

        @jax.jit
        def project8(poses_):
            M, area, valid, bb_min, bb_max = jax.vmap(
                lambda p: _project_and_pack(verts, faces, colors, p, Kj,
                                            cx_shift, cy_shift, fs))(poses_)
            return M, area, valid, bb_min, bb_max

        out = jax.block_until_ready(project8(chunk))
        dt = timed(lambda: jax.block_until_ready(project8(chunk)))
        results[f"{tag}_project_ms"] = round(dt * 1e3 / 8, 3)

        M, area, valid, bb_min, bb_max = out

        # --- bin (sort + searchsorted + top_k)
        @jax.jit
        def bin8(bb_min_, bb_max_, valid_):
            return jax.vmap(
                lambda lo, hi, va: bin_pairs(lo, hi, va, tiles_x, tiles_y,
                                             tile, x0 - cx_shift,
                                             y0 - cy_shift, G)
            )(bb_min_, bb_max_, valid_)

        binned = jax.block_until_ready(bin8(bb_min, bb_max, valid))
        dt = timed(lambda: jax.block_until_ready(bin8(bb_min, bb_max,
                                                      valid)))
        results[f"{tag}_bin_ms"] = round(dt * 1e3 / 8, 3)

        # --- full prepare (project + bin + pack); pack = prepare - the two
        @jax.jit
        def prep8(poses_):
            return jax.vmap(
                lambda p: _prepare_view_pairs(verts, faces, colors, p, Kj,
                                              sw, sh, x0, y0, tile, fc, G,
                                              npc, fs))(poses_)

        jax.block_until_ready(prep8(chunk))
        dt = timed(lambda: jax.block_until_ready(prep8(chunk)))
        results[f"{tag}_prepare_ms"] = round(dt * 1e3 / 8, 3)
        results[f"{tag}_pack_ms"] = round(
            results[f"{tag}_prepare_ms"] - results[f"{tag}_project_ms"]
            - results[f"{tag}_bin_ms"], 3)

        # --- slots = prepare + kernel
        def slots8():
            d, s, pf, at, ovf = render_views_slots_pallas(
                verts, faces, colors, chunk, Kj, width=sw, height=sh,
                x0=x0, y0=y0, tile=tile, capacity=capacity, face_chunk=fc,
                global_capacity=global_cap, front_sign=fs)
            jax.block_until_ready(d)
            return ovf

        ovf = slots8()
        results[f"{tag}_overflow"] = bool(ovf)
        dt = timed(slots8)
        results[f"{tag}_slots_ms"] = round(dt * 1e3 / 8, 3)
        results[f"{tag}_kernel_ms"] = round(
            results[f"{tag}_slots_ms"] - results[f"{tag}_prepare_ms"], 3)

        print(f"[{tag} F={F}] project {results[f'{tag}_project_ms']} | "
              f"bin {results[f'{tag}_bin_ms']} | "
              f"pack {results[f'{tag}_pack_ms']} | "
              f"kernel {results[f'{tag}_kernel_ms']} | "
              f"slots {results[f'{tag}_slots_ms']} ms/view "
              f"(overflow={results[f'{tag}_overflow']})", flush=True)

    # --- the fused production program at the bucket (what e2e pays)
    from pose3d_tpu.data.dataset import _render_patches
    t0 = time.perf_counter()
    pats, ovf, _ = _render_patches(mesh, np.asarray(K), np.asarray(poses),
                                   sw, sh, x0, y0, ox, oy, z,
                                   to_host=False, defer_overflow=True)
    jax.block_until_ready(pats)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    pats, ovf, _ = _render_patches(mesh, np.asarray(K), np.asarray(poses),
                                   sw, sh, x0, y0, ox, oy, z,
                                   to_host=False, defer_overflow=True)
    jax.block_until_ready(pats)
    wall = time.perf_counter() - t0
    results["production_overflow"] = bool(ovf)
    results["production_views"] = int(len(poses))
    results["production_ms_per_view"] = round(wall * 1e3 / len(poses), 3)
    results["production_views_per_s"] = round(len(poses) / wall, 1)
    print(f"production fused: {len(poses)} views in {wall:.2f}s "
          f"({len(poses)/wall:,.0f} views/s; warm-up pass {warm:.2f}s)",
          flush=True)

    results["tpu"] = bool(on_tpu)
    out_path = out_path or os.path.join(os.path.dirname(__file__), "..",
                                        "PROFILE_DENSE.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
