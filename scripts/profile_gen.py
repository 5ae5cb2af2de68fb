"""Per-phase profile of dataset generation on the live device.

Decomposes the in-pipeline generation rate (bench_e2e's gen_views_per_s)
into its phases to localize the gap against the render-only rate
(profile_render.py):

  probe_loop     the round-2 capacity sizing: 8x max_tile_overlap +
                 8x count_large_faces host loops (one host-synced round
                 trip each)
  probe_batched  the round-3 replacement: ONE jitted program + one fetch
  render         the Pallas pair-segment kernel, 8-view chunks, no epilogue
  epilogue       depth2normals + patch resample per view (the _post step)
  render+post    the fused per-chunk program exactly as _render_program
                 compiles it
  e2e_mesh       wall-clock create_synth_samples per mesh (subdiv 2 + 3),
                 compile-warm, including probe + dispatch + host overheads

Writes a JSON summary (default PROFILE_GEN.json at the repo root).

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_gen.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed_chain(jfn, args, n_lo=2, n_hi=18):
    """Delta-method timing: chain n dependent evaluations inside one jitted
    program and difference two chain lengths (tunnel dispatch latency and
    transfer cost cancel)."""
    import jax
    import jax.numpy as jnp

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


def main(out_path=None):
    from pose3d_tpu.utils.tpuguard import require_tpu
    on_tpu = require_tpu()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import (_render_program, _render_patches,
                                         create_synth_samples)
    from pose3d_tpu.ops.geometry import depth2normals
    from pose3d_tpu.ops.patch import sample_patch
    from pose3d_tpu.ops.sphere import create_view_poses
    from pose3d_tpu.render import make_test_mesh
    from pose3d_tpu.render.rasterizer_tiled import (count_large_faces,
                                                    max_tile_overlap,
                                                    probe_capacity)
    from pose3d_tpu.render.rasterizer_pallas import \
        render_views_tiled_pallas

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    results = {"device": str(dev), "platform": jax.default_backend()}

    # the e2e window geometry (create_synth_samples, z=0.4) — from the
    # same helper production uses, so the profile can't drift from it
    from pose3d_tpu.data.dataset import _synth_window
    K = LINEMOD_K
    fx, fy = float(K[0, 0]), float(K[1, 1])
    z = 0.4
    sw, sh, x0, y0, ox, oy = _synth_window(np.asarray(K), z)
    tile = 32

    mesh = make_test_mesh("sphere", 0.10, detail=3)
    F = len(mesh.faces)
    print(f"mesh: sphere d3, {F} faces, window {sw}x{sh}", flush=True)
    results["mesh_faces"] = F

    poses, _ = create_view_poses(2, (z, 1.1, 1.0), (-45.0, 15.0, 45.0),
                                 True)
    poses = np.asarray(poses, np.float32)
    pr = poses[:: max(1, len(poses) // 8)][:8]

    verts = jnp.asarray(mesh.vertices)
    faces = jnp.asarray(mesh.faces)
    colors = jnp.asarray(mesh.colors)
    Kj = jnp.asarray(K)

    # ---- phase: old probe loop (16 host-synced calls)
    t0 = time.perf_counter()
    overlap = max(max_tile_overlap(mesh.vertices, mesh.faces, mesh.colors,
                                   p, np.asarray(K), sw, sh, x0, y0, tile)
                  for p in pr)
    n_large = max(count_large_faces(mesh.vertices, mesh.faces, mesh.colors,
                                    p, np.asarray(K), sw, sh, x0, y0, tile)
                  for p in pr)
    results["probe_loop_s"] = round(time.perf_counter() - t0, 3)

    # ---- phase: batched probe (one dispatch, warm)
    prj = jnp.asarray(pr)
    jax.device_get(probe_capacity(verts, faces, prj, Kj, width=sw,
                                  height=sh, x0=x0, y0=y0, tile=tile))
    t0 = time.perf_counter()
    mo, nl = jax.device_get(probe_capacity(verts, faces, prj, Kj, width=sw,
                                           height=sh, x0=x0, y0=y0,
                                           tile=tile))
    results["probe_batched_s"] = round(time.perf_counter() - t0, 3)
    assert int(mo) == overlap and int(nl) == n_large, \
        (int(mo), overlap, int(nl), n_large)
    capacity = max(256, -(-int(np.ceil(overlap * 1.5)) // 512) * 512)
    global_cap = max(256, -(-int(np.ceil(n_large * 1.5)) // 512) * 512)
    results["capacity"] = capacity
    print(f"probe: loop {results['probe_loop_s']}s vs batched "
          f"{results['probe_batched_s']}s (overlap {overlap}, "
          f"large {n_large})", flush=True)

    # ---- phase: render only (8-view chunk, pair kernel)
    chunk = jnp.asarray(poses[:8])

    def render_fn(pc):
        col, dep = render_views_tiled_pallas(
            verts, faces, colors, pc, Kj, width=sw, height=sh, x0=x0,
            y0=y0, tile=tile, capacity=capacity, face_chunk=128,
            global_capacity=global_cap)
        return jnp.sum(dep)
    dt = timed_chain(render_fn, (chunk,))
    results["render_ms_per_view"] = round(dt * 1e3 / 8, 3)
    print(f"render only        {dt*1e3/8:7.2f} ms/view "
          f"({8/dt:,.0f} views/s)", flush=True)

    # ---- phase: epilogue only (normals + patch resample per view)
    col8, dep8 = render_views_tiled_pallas(
        verts, faces, colors, chunk, Kj, width=sw, height=sh, x0=x0, y0=y0,
        tile=tile, capacity=capacity, face_chunk=128,
        global_capacity=global_cap)
    oxw = jnp.float32(ox - x0)
    oyw = jnp.float32(oy - y0)
    zj = jnp.float32(z)

    def post_fn(cols, deps):
        def one(c, d):
            nor = depth2normals(d, fx, fy)
            return sample_patch(c * 255.0, d, nor, oxw, oyw, zj,
                                fx=fx, fy=fy)
        return jnp.sum(jax.vmap(one)(cols, deps))
    dt = timed_chain(jax.jit(post_fn), (col8, dep8))
    results["epilogue_ms_per_view"] = round(dt * 1e3 / 8, 3)
    print(f"epilogue only      {dt*1e3/8:7.2f} ms/view", flush=True)

    # ---- phase: fused render+post exactly as _render_program runs it
    program = _render_program(jax.default_backend(), False, sw, sh, x0, y0,
                              tile, capacity, global_cap, fx, fy)
    texture = jnp.zeros((1, 1, 3), jnp.float32)
    from pose3d_tpu.render.mesh import front_sign
    fs_cull = jnp.float32(front_sign(mesh))

    for tag, fs in (("", jnp.float32(0.0)), ("_culled", fs_cull)):
        def fused_fn(pc, fs=fs):
            patches, ovf = program(verts, faces, colors, Kj, pc[None],
                                   texture, oxw, oyw, zj, fs)
            return jnp.sum(patches)
        dt = timed_chain(fused_fn, (chunk,))
        results[f"fused{tag}_ms_per_view"] = round(dt * 1e3 / 8, 3)
        print(f"fused render+post{tag or '  '}  {dt*1e3/8:7.2f} ms/view "
              f"({8/dt:,.0f} views/s)", flush=True)

    # ---- phase: whole create_synth_samples per mesh, compile-warm
    # (two meshes sharing the shape bucket: second call = warm path)
    m2 = make_test_mesh("sphere", 0.11, detail=3)
    for name, m in [("warmup", mesh), ("e2e_mesh", m2)]:
        t0 = time.perf_counter()
        tmpl = create_synth_samples(m, np.asarray(K), 0, 2, True,
                                    to_host=False)
        synth = create_synth_samples(m, np.asarray(K), 0, 3, True,
                                     to_host=False)
        jax.block_until_ready((tmpl.patches, synth.patches))
        wall = time.perf_counter() - t0
        nv = len(tmpl.patches) + len(synth.patches)
        if name == "e2e_mesh":
            results["e2e_mesh_s"] = round(wall, 2)
            results["e2e_views"] = nv
            results["e2e_views_per_s"] = round(nv / wall, 1)
        print(f"{name}: {nv} views in {wall:.1f}s ({nv/wall:,.0f} views/s)",
              flush=True)

    results["tpu"] = bool(on_tpu)
    out_path = out_path or os.path.join(os.path.dirname(__file__), "..",
                                        "PROFILE_GEN.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
