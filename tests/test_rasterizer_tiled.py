import numpy as np
import jax.numpy as jnp

from pose3d_tpu.ops.sphere import create_view_poses, icosphere
from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.mesh import Mesh, vertex_normals
from pose3d_tpu.render.rasterizer import render_view
from pose3d_tpu.render.rasterizer_tiled import (max_tile_overlap,
                                                render_view_tiled)

K = jnp.asarray([[150.0, 0.0, 64.0],
                 [0.0, 150.0, 64.0],
                 [0.0, 0.0, 1.0]])
W = H = 128


def _sphere_mesh(subdiv=2, radius=0.08):
    """A denser test mesh: icosphere with per-vertex colors."""
    from pose3d_tpu.ops.sphere import _ICO_FACES, _ICO_VERTS  # base topology
    # build faces by subdividing with shared vertices
    import numpy as np

    verts = [v / np.linalg.norm(v) for v in _ICO_VERTS]
    faces = list(_ICO_FACES)
    for _ in range(subdiv):
        cache = {}
        new_faces = []

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts[a] + verts[b]
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for (a, b, c) in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc),
                          (ab, bc, ca)]
        faces = new_faces
    v = np.stack(verts).astype(np.float32) * radius
    f = np.asarray(faces, np.int32)
    colors = (np.stack(verts).astype(np.float32) + 1.0) / 2.0
    return Mesh(v, f, colors, vertex_normals(v, f))


def _pose(z=0.4):
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = z
    return jnp.asarray(T)


def test_tiled_matches_brute_force_cube():
    mesh = make_test_mesh("cube", 0.1)
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), _pose(), K)
    colb, depb = render_view(*args, width=W, height=H, face_chunk=8)
    colt, dept = render_view_tiled(*args, width=W, height=H, tile=32,
                                   capacity=16, face_chunk=8)
    np.testing.assert_allclose(np.asarray(dept), np.asarray(depb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(colt), np.asarray(colb), atol=1e-5)


def test_tiled_matches_brute_force_sphere_multi_pose():
    mesh = _sphere_mesh(2)              # 1280 faces
    poses, _ = create_view_poses(0, (0.4, 1.0, 0.4), (0, 30, 30), True)
    for T in poses[:3]:
        args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                jnp.asarray(mesh.colors), jnp.asarray(T), K)
        colb, depb = render_view(*args, width=W, height=H, face_chunk=64)
        colt, dept = render_view_tiled(*args, width=W, height=H, tile=32,
                                       capacity=512, face_chunk=64)
        np.testing.assert_allclose(np.asarray(dept), np.asarray(depb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(colt), np.asarray(colb),
                                   atol=1e-4)


def test_capacity_reporting():
    mesh = _sphere_mesh(2)
    n = max_tile_overlap(mesh.vertices, mesh.faces, mesh.colors,
                         np.asarray(_pose()), np.asarray(K), W, H, tile=32)
    assert 0 < n <= len(mesh.faces)
    # the object projects to ~60px: a 32px tile sees a fraction of faces
    assert n < len(mesh.faces)


def test_window_offset_tiled():
    mesh = make_test_mesh("tetra", 0.12)
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), _pose(0.45), K)
    colf, depf = render_view_tiled(*args, width=W, height=H, tile=32,
                                   capacity=16, face_chunk=8)
    colw, depw = render_view_tiled(*args, width=40, height=40, x0=50, y0=44,
                                   tile=32, capacity=16, face_chunk=8)
    np.testing.assert_allclose(np.asarray(depw),
                               np.asarray(depf)[44:84, 50:90], atol=1e-5)
