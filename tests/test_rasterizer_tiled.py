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


def test_probe_capacity_matches_host_loops():
    """The single-dispatch batched probe must agree with the per-pose host
    utilities it replaces (max_tile_overlap / count_large_faces)."""
    from pose3d_tpu.render.rasterizer_tiled import (count_large_faces,
                                                    probe_capacity)
    for kind, size, z in [("cube", 0.1, 0.4), ("sphere", 0.1, 0.35),
                          ("tetra", 0.12, 0.5)]:
        mesh = (make_test_mesh(kind, size) if kind != "sphere"
                else _sphere_mesh(2, size))
        poses, _ = create_view_poses(0, (z, z + 0.1, 1.0), (0, 30, 30),
                                     True)
        poses = np.asarray(poses[:8], np.float32)
        if len(poses) < 8:
            poses = np.concatenate(
                [poses, np.tile(poses[-1:], (8 - len(poses), 1, 1))])
        mo, nl = probe_capacity(jnp.asarray(mesh.vertices),
                                jnp.asarray(mesh.faces),
                                jnp.asarray(poses), K,
                                width=W, height=H, tile=32)
        want_mo = max(max_tile_overlap(mesh.vertices, mesh.faces,
                                       mesh.colors, p, np.asarray(K),
                                       W, H, tile=32) for p in poses)
        want_nl = max(count_large_faces(mesh.vertices, mesh.faces,
                                        mesh.colors, p, np.asarray(K),
                                        W, H, tile=32) for p in poses)
        assert int(mo) == want_mo, kind
        assert int(nl) == want_nl, kind


def test_probe_capacity_ignores_bucket_padding():
    """Point-degenerate [0,0,0] pad faces must not count toward capacity
    (and must not render): the probe and the binning both exclude them."""
    from pose3d_tpu.render.rasterizer_tiled import probe_capacity
    mesh = make_test_mesh("cube", 0.1)
    poses = np.tile(np.asarray(_pose())[None], (8, 1, 1))
    base = probe_capacity(jnp.asarray(mesh.vertices),
                          jnp.asarray(mesh.faces), jnp.asarray(poses), K,
                          width=W, height=H, tile=32)
    faces_padded = np.concatenate(
        [mesh.faces, np.zeros((100, 3), np.int32)])
    padded = probe_capacity(jnp.asarray(mesh.vertices),
                            jnp.asarray(faces_padded), jnp.asarray(poses),
                            K, width=W, height=H, tile=32)
    assert int(base[0]) == int(padded[0])
    assert int(base[1]) == int(padded[1])
    # and the padded render matches the unpadded one exactly
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), _pose(), K)
    colb, depb = render_view_tiled(*args, width=W, height=H, tile=32,
                                   capacity=16, face_chunk=8)
    colp, depp = render_view_tiled(
        jnp.asarray(mesh.vertices), jnp.asarray(faces_padded),
        jnp.asarray(mesh.colors), _pose(), K, width=W, height=H, tile=32,
        capacity=16, face_chunk=8)
    np.testing.assert_array_equal(np.asarray(depp), np.asarray(depb))


def test_overflow_flag_tiled():
    """return_overflow reports dropped geometry exactly: False at adequate
    capacity, True when a tile's face population exceeds it."""
    mesh = _sphere_mesh(2)              # 1280 faces, ~60 px across
    true_cap = max_tile_overlap(mesh.vertices, mesh.faces, mesh.colors,
                                np.asarray(_pose()), np.asarray(K), W, H,
                                tile=32)
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), _pose(), K)
    *_, ovf_ok = render_view_tiled(*args, width=W, height=H, tile=32,
                                   capacity=true_cap, face_chunk=1,
                                   return_overflow=True)
    assert not bool(ovf_ok)
    *_, ovf_bad = render_view_tiled(*args, width=W, height=H, tile=32,
                                    capacity=max(1, true_cap // 4),
                                    face_chunk=1, return_overflow=True)
    assert bool(ovf_bad)


def test_render_patches_overflow_autoresize(monkeypatch, tmp_path):
    """A pose whose tile overlap exceeds the probed capacity must trigger
    the loud re-render path (not silent holes): force a lowballed probe
    and check the output still matches an adequately-sized render."""
    import pose3d_tpu.render.rasterizer_tiled as rt
    from pose3d_tpu.data.dataset import _render_patches, _render_program
    mesh = _sphere_mesh(3, 0.1)         # 5120 faces: overlap > 256 up close
    cam = np.asarray([[300.0, 0.0, 64.0], [0.0, 300.0, 64.0],
                      [0.0, 0.0, 1.0]], np.float32)
    pose = np.asarray(_pose(0.4))[None]

    real_probe = rt.probe_capacity

    def lowball(*a, **k):
        mo, nl = real_probe(*a, **k)
        return jnp.minimum(mo, 1), jnp.minimum(nl, 1)

    monkeypatch.setattr(rt, "probe_capacity", lowball)
    _render_program.cache_clear()
    low = _render_patches(mesh, cam, pose, 128, 128, 0, 0, 64.0, 64.0, 0.4)

    monkeypatch.setattr(rt, "probe_capacity", real_probe)
    _render_program.cache_clear()
    good = _render_patches(mesh, cam, pose, 128, 128, 0, 0, 64.0, 64.0, 0.4)
    np.testing.assert_allclose(low, good, atol=1e-5)
