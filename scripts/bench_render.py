"""Renderer throughput at the LineMOD generation geometry.

Measures ms/view of the production tiled-Pallas path (and the XLA tiled
path for comparison) on a ~20k-face icosphere over the same window the
dataset generator uses (fx*0.2/0.4 + border ~= 294^2, tile 32), with the
delta method (lax.map over n vs n+K poses inside one program) so tunnel
latency cancels.

Run on TPU: PYTHONPATH=.:/root/.axon_site python scripts/bench_render.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp


def _time_views(render_one, poses, n_lo=4, n_hi=36):
    @jax.jit
    def chain(poses_, n_ones):
        def one(pose):
            col, dep = render_one(pose)
            return jnp.sum(dep) + jnp.sum(col[..., 0])
        return jnp.sum(jax.lax.map(one, poses_) * n_ones)

    lo, hi = poses[:n_lo], poses[:n_hi]
    float(chain(lo, jnp.ones(n_lo)))          # compile lo
    float(chain(hi, jnp.ones(n_hi)))          # compile hi
    t0 = time.perf_counter()
    float(chain(lo, jnp.ones(n_lo)))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(hi, jnp.ones(n_hi)))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    from pose3d_tpu.ops.sphere import create_view_poses
    from pose3d_tpu.render import make_test_mesh
    from pose3d_tpu.render.rasterizer_tiled import (max_tile_overlap,
                                                    render_view_tiled)
    from pose3d_tpu.render.rasterizer_pallas import render_view_tiled_pallas
    from pose3d_tpu.data.benchmarks import LINEMOD_K

    mesh = make_test_mesh("sphere", 0.1, detail=5)        # 20480 faces
    print(f"device: {jax.devices()[0]}  faces: {len(mesh.faces)}",
          flush=True)

    fx, fy = float(LINEMOD_K[0, 0]), float(LINEMOD_K[1, 1])
    ox, oy = float(LINEMOD_K[0, 2]), float(LINEMOD_K[1, 2])
    z = 0.4
    m = 0.2
    border = 4
    sw = int(fx * m / z) + 2 * border
    sh = int(fy * m / z) + 2 * border
    x0, y0 = int(ox) - sw // 2, int(oy) - sh // 2
    tile = 32

    poses, _ = create_view_poses(1, (z, 1.1, 1.0), (-45, 15, 45), True)
    poses = jnp.asarray(poses)

    overlap = max_tile_overlap(mesh.vertices, mesh.faces, mesh.colors,
                               np.asarray(poses[0]), np.asarray(LINEMOD_K),
                               sw, sh, x0, y0, tile)
    capacity = max(256, int(np.ceil(overlap * 1.5 / 256)) * 256)
    print(f"window {sw}x{sh} @ ({x0},{y0})  capacity {capacity}", flush=True)

    verts = jnp.asarray(mesh.vertices)
    faces = jnp.asarray(mesh.faces)
    colors = jnp.asarray(mesh.colors)
    K = jnp.asarray(LINEMOD_K)

    def pallas_one(pose):
        return render_view_tiled_pallas(verts, faces, colors, pose, K,
                                        width=sw, height=sh, x0=x0, y0=y0,
                                        tile=tile, capacity=capacity,
                                        face_chunk=128)

    def xla_one(pose):
        return render_view_tiled(verts, faces, colors, pose, K,
                                 width=sw, height=sh, x0=x0, y0=y0,
                                 tile=tile, capacity=capacity,
                                 face_chunk=256)

    dt = _time_views(pallas_one, poses)
    print(f"tiled-Pallas: {dt*1e3:7.2f} ms/view ({1/dt:6.1f} views/s)",
          flush=True)

    # production path: batched prepare + one kernel grid per 8 views
    from pose3d_tpu.render.rasterizer_pallas import render_views_tiled_pallas

    @jax.jit
    def chain8(poses_, n):
        def body(i, c):
            col, dep = render_views_tiled_pallas(
                verts, faces, colors, poses_ * (1.0 + 1e-12 * c), K,
                width=sw, height=sh, x0=x0, y0=y0, tile=tile,
                capacity=capacity, face_chunk=128)
            return c * (1.0 + 1e-12 * jnp.sum(dep))
        return jax.lax.fori_loop(0, n, body, 1.0)

    p8 = poses[:8]
    float(chain8(p8, 1))
    float(chain8(p8, 9))
    t0 = time.perf_counter(); float(chain8(p8, 1))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain8(p8, 9))
    t_hi = time.perf_counter() - t0
    dt = max(t_hi - t_lo, 1e-9) / (8 * 8)
    print(f"tiled-Pallas batched(8): {dt*1e3:7.2f} ms/view "
          f"({1/dt:6.1f} views/s)", flush=True)

    dt = _time_views(xla_one, poses)
    print(f"tiled-XLA:    {dt*1e3:7.2f} ms/view ({1/dt:6.1f} views/s)",
          flush=True)


if __name__ == "__main__":
    main()
