"""Decision data for render-program unification + global-walk gating.

Measures, on the live device:
  1. chained cost of the bin_pairs SORT at the 2048 and 8192 face buckets
     (is unifying every mesh into one 8192-face program affordable?)
  2. serialized executable size of the two production render programs
     (the per-process load through a ~1.6 MB/s tunnel is ~size/rate — the
     single biggest generation line item after the kernels themselves)
  3. production per-view rate of a TINY mesh (tetra, 4 faces) under its
     own 2048 program vs forced into the 8192 program

Run: python scripts/profile_unify.py   (from the repo root)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def chain_time(fn, x, n_lo=2, n_hi=34):
    import jax
    import jax.numpy as jnp

    def chain(a, n):
        def body(_, c):
            out = fn(c)
            # int-safe data dependence: the shifted sum is almost surely 0
            # but not constant-foldable, so iterations cannot be elided or
            # overlapped (and c keeps its dtype across the loop)
            return c + (jnp.sum(out) >> 30).astype(c.dtype)
        r = jax.lax.fori_loop(0, n, body, a)
        return jnp.sum(r)

    jc = jax.jit(chain, static_argnums=(1,))
    float(jc(x, n_lo)); float(jc(x, n_hi))
    t0 = time.perf_counter(); float(jc(x, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jc(x, n_hi))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    from pose3d_tpu.utils.tpuguard import require_tpu
    if not require_tpu():
        print("TPU unavailable", file=sys.stderr)
        return 1
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import (_render_patches, _synth_window,
                                         _render_program)
    from pose3d_tpu.ops.sphere import create_view_poses
    from pose3d_tpu.render import make_test_mesh

    results = {"device": str(jax.devices()[0]),
               "platform": jax.default_backend()}
    jnp.zeros((8, 128)).sum().block_until_ready()

    # ---- 1. sort cost per 8-view chunk at both buckets (f32 keys would
    # differ; bin_pairs sorts int32 composite keys)
    for F in (2048, 8192):
        keys = jax.random.randint(jax.random.key(0), (8, 4 * F), 0,
                                  2**30, dtype=jnp.int32)

        def sortfn(k):
            return jnp.sort(k, axis=-1)

        dt = chain_time(sortfn, keys)
        results[f"sort_ms_per_chunk_F{F}"] = round(dt * 1e3, 3)
        print(f"sort 8x{4*F} i32: {dt*1e3:.3f} ms/chunk "
              f"({dt*1e3/8:.3f} ms/view)", flush=True)

    # ---- 2. executable sizes of the two production render programs
    K = LINEMOD_K
    fx, fy = float(K[0, 0]), float(K[1, 1])
    z = 0.4
    sw, sh, x0, y0, ox, oy = _synth_window(np.asarray(K), z)
    poses, _ = create_view_poses(2, (z, 1.1, 1.0), (-45.0, 15.0, 45.0),
                                 True)
    n_chunks = -(-len(poses) // 8)
    chunks_shape = (n_chunks, 8, 4, 4)

    for tag, (bucket, vbucket, cap) in (("b2048", (2048, 1024, 512)),
                                        ("b8192", (8192, 4096, 2048))):
        program = _render_program("tpu", False, sw, sh, x0, y0, 32, cap,
                                  512, fx, fy, 1, "bfloat16")
        lowered = program.lower(
            jax.ShapeDtypeStruct((vbucket, 3), jnp.float32),
            jax.ShapeDtypeStruct((bucket, 3), jnp.int32),
            jax.ShapeDtypeStruct((vbucket, 3), jnp.float32),
            jax.ShapeDtypeStruct((3, 3), jnp.float32),
            jax.ShapeDtypeStruct(chunks_shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1, 3), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32))
        t0 = time.perf_counter()
        compiled = lowered.compile()
        results[f"compile_s_{tag}"] = round(time.perf_counter() - t0, 1)
        try:
            size = len(compiled.runtime_executable().serialize())
        except Exception:
            try:
                size = len(jax.export.export(program)(
                    *lowered.in_avals).serialize())
            except Exception:
                size = -1
        results[f"exe_bytes_{tag}"] = int(size)
        mem = compiled.memory_analysis()
        if mem is not None:
            results[f"exe_code_bytes_{tag}"] = int(
                getattr(mem, "generated_code_size_in_bytes", -1))
        print(f"{tag}: compile {results[f'compile_s_{tag}']}s, "
              f"serialized {size/1e6 if size > 0 else -1:.1f} MB, "
              f"code {results.get(f'exe_code_bytes_{tag}', -1)/1e6:.1f} MB",
              flush=True)

    # ---- 3. tetra production rate: native bucket vs forced 8192 program
    mesh = make_test_mesh("tetra", 0.12, detail=2)
    poses3, _ = create_view_poses(3, (z, 1.1, 1.0), (-45.0, 15.0, 45.0),
                                 True)

    def run_padded(pad_faces, capacity):
        m = mesh
        if pad_faces:
            import dataclasses
            f = np.concatenate([m.faces,
                                np.zeros((pad_faces - len(m.faces), 3),
                                         np.int32)])
            v = np.concatenate([m.vertices,
                                np.zeros((4096 - len(m.vertices), 3),
                                         np.float32)])
            c = np.concatenate([m.colors,
                                np.zeros((4096 - len(m.colors), 3),
                                         np.float32)])
            m = dataclasses.replace(m, faces=f, vertices=v, colors=c)
        t0 = time.perf_counter()
        pats, ovf, _ = _render_patches(
            m, np.asarray(K), np.asarray(poses3), sw, sh, x0, y0, ox, oy,
            z, to_host=False, defer_overflow=True, out_dtype="bfloat16")
        jax.block_until_ready(pats)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        pats, ovf, _ = _render_patches(
            m, np.asarray(K), np.asarray(poses3), sw, sh, x0, y0, ox, oy,
            z, to_host=False, defer_overflow=True, out_dtype="bfloat16")
        jax.block_until_ready(pats)
        return time.perf_counter() - t0, warm, bool(jax.device_get(ovf))

    wall, warm, ovf = run_padded(0, None)
    results["tetra_b2048_ms_per_view"] = round(wall * 1e3 / len(poses3), 3)
    results["tetra_b2048_warm_s"] = round(warm, 2)
    print(f"tetra @2048: {len(poses3)/wall:,.0f} views/s "
          f"(warm-up {warm:.1f}s, overflow={ovf})", flush=True)

    wall, warm, ovf = run_padded(8192, None)
    results["tetra_b8192_ms_per_view"] = round(wall * 1e3 / len(poses3), 3)
    results["tetra_b8192_warm_s"] = round(warm, 2)
    results["tetra_b8192_overflow"] = ovf
    print(f"tetra @8192: {len(poses3)/wall:,.0f} views/s "
          f"(warm-up {warm:.1f}s, overflow={ovf})", flush=True)

    out = os.path.join(os.path.dirname(__file__), "..",
                       "PROFILE_UNIFY.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    sys.exit(main())
