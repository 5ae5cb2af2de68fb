"""Per-mesh anatomy of the 15-object generation phase of bench_e2e.

BENCH_E2E_r3 shows all 15 meshes DISPATCH in ~17 s but the device queue
takes ~100 s to drain — ~3x the per-mesh profile's steady rate.  This
script renders the same 15 meshes but BLOCKS after each one, attributing
wall time per mesh: the first mesh of each (face-bucket, capacity)
program pays the executable load, dense meshes (bucket 8192, capacity
2048) pay a bigger per-view kernel.  Writes PROFILE_GEN_MESHES.json.

Run on TPU:  python scripts/profile_gen_meshes.py
(plain `python` from the repo root — the script inserts its own sys.path;
NEVER `PYTHONPATH=.` which clobbers the ambient TPU-plugin site dir)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    from pose3d_tpu.utils.tpuguard import require_tpu
    if not require_tpu():
        # the 15-mesh subdiv-3 workload on a CPU fallback runs for hours
        # and would overwrite the artifact with CPU-platform rows
        print("TPU unavailable; refusing the full render workload on CPU",
              file=sys.stderr)
        return 1
    jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import create_synth_samples_pair
    from pose3d_tpu.render import make_test_mesh
    from scripts.bench_e2e import SHAPES

    jnp.zeros((8, 128)).sum().block_until_ready()   # tunnel warm-up

    rows = []
    t_all = time.time()
    for i, (kind, size, detail) in enumerate(SHAPES):
        mesh = make_test_mesh(kind, size, detail=detail)
        t0 = time.time()
        # bfloat16 like bench_e2e's generation phase: out_dtype is part of
        # the program cache key, so f32 here would time (and pay the
        # executable-load tax for) program variants the bench never runs
        tmpl, synth, overflow, _ = create_synth_samples_pair(
            mesh, LINEMOD_K, i, 2, 3, True, to_host=False,
            defer_overflow=True, out_dtype="bfloat16")
        # BLOCK: attribute this mesh's device time to this mesh
        synth.patches.block_until_ready()
        ovf = bool(jax.device_get(overflow))
        dt = time.time() - t0
        v = len(tmpl.patches) + len(synth.patches)
        rows.append({"mesh": f"{kind}{i}", "faces": int(len(mesh.faces)),
                     "views": int(v), "seconds": round(dt, 2),
                     "views_per_s": round(v / dt, 1), "overflow": ovf})
        print(f"  {kind}{i}: {len(mesh.faces)} faces, {v} views, "
              f"{dt:.1f}s ({v/dt:.0f} views/s){' OVERFLOW' if ovf else ''}",
              flush=True)
    total = time.time() - t_all
    out = {"device": str(jax.devices()[0]),
           "platform": jax.default_backend(),
           "total_seconds": round(total, 1),
           "total_views": int(sum(r["views"] for r in rows)),
           "meshes": rows}
    path = os.path.join(os.path.dirname(__file__), "..",
                        "PROFILE_GEN_MESHES.json")
    for a in sys.argv[1:]:
        if a.endswith(".json"):
            path = a
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path), flush=True)


if __name__ == "__main__":
    sys.exit(main())
