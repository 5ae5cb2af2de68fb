import numpy as np
import pytest

from pose3d_tpu.render import load_mesh
from pose3d_tpu.render.mesh import Mesh, vertex_normals
from pose3d_tpu.render.texture import (render_view_textured,
                                       sample_texture_nearest)


def _write_obj(tmp_path, with_uv=True):
    obj = tmp_path / "tex.obj"
    lines = ["v 0 0 0", "v 1 0 0", "v 0 1 0"]
    if with_uv:
        lines += ["vt 0.0 0.0", "vt 1.0 0.0", "vt 0.0 1.0",
                  "f 1/1 2/2 3/3"]
    else:
        lines += ["f 1 2 3"]
    obj.write_text("\n".join(lines) + "\n")
    return obj


def test_obj_without_texture_defaults_grey(tmp_path):
    m = load_mesh(str(_write_obj(tmp_path, with_uv=False)))
    np.testing.assert_allclose(m.colors, 0.5)
    assert m.faces.shape == (1, 3)


def test_obj_with_texture_samples_vertex_colors(tmp_path):
    cv2 = pytest.importorskip("cv2")
    obj = _write_obj(tmp_path, with_uv=True)
    # 2x2 texture: after the vertical flip, uv (0,0) lands on the BOTTOM row
    tex = np.zeros((2, 2, 3), np.uint8)
    tex[1, 0] = (100, 0, 0)      # bottom-left (BGR) -> uv (0, 0)
    tex[1, 1] = (0, 100, 0)      # bottom-right     -> uv (1, 0)
    tex[0, 0] = (0, 0, 100)      # top-left         -> uv (0, 1)
    cv2.imwrite(str(tmp_path / "tex.png"), tex)
    m = load_mesh(str(obj))
    # colors pass through the reference's x1.8 +20 adjustment, /255
    def adj(v):
        return min(v * 1.8 + 20.0, 255.0) / 255.0
    np.testing.assert_allclose(m.colors[0], [adj(100), adj(0), adj(0)],
                               atol=1e-5)
    np.testing.assert_allclose(m.colors[1], [adj(0), adj(100), adj(0)],
                               atol=1e-5)
    np.testing.assert_allclose(m.colors[2], [adj(0), adj(0), adj(100)],
                               atol=1e-5)
    # the loader must also carry the per-pixel texturing inputs
    assert m.tcoords is not None and m.tcoords.shape == (3, 2)
    np.testing.assert_allclose(m.tcoords, [[0, 0], [1, 0], [0, 1]])
    assert m.texture is not None and m.texture.shape == (2, 2, 3)
    # stored pre-flipped: row 0 = uv v=0 (the image's bottom row)
    np.testing.assert_allclose(m.texture[0, 0], [adj(100), adj(0), adj(0)],
                               atol=1e-5)


# ---------------------------------------------------- per-pixel rasterization

K = np.asarray([[150.0, 0.0, 64.0],
                [0.0, 150.0, 64.0],
                [0.0, 0.0, 1.0]], np.float32)


def _quad_mesh(uv_scale=1.0):
    """A screen-facing unit quad (two triangles) with UVs spanning [0,1]^2."""
    s = 0.1
    verts = np.asarray([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                       np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]],
                    np.float32) * uv_scale
    colors = np.full((4, 3), 0.5, np.float32)
    return Mesh(verts, faces, colors, vertex_normals(verts, faces),
                tcoords=uv, texture=None)


def _pose(z=0.4):
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = z
    return T


def test_per_pixel_texturing_reproduces_checker_pattern():
    """A 2x2 checker texture on a quad must produce four solid quadrants in
    the render — impossible at vertex rate (4 verts), so this pins true
    per-pixel sampling (reference GL texturing, src/model.cpp:29-71)."""
    import jax.numpy as jnp
    mesh = _quad_mesh()
    # texture array is in sampler space: row = v*th (v=0 -> row 0)
    tex = np.zeros((2, 2, 3), np.float32)
    tex[0, 0] = (1, 0, 0)     # u<.5, v<.5
    tex[0, 1] = (0, 1, 0)     # u>.5, v<.5
    tex[1, 0] = (0, 0, 1)     # u<.5, v>.5
    tex[1, 1] = (1, 1, 0)
    color, depth = render_view_textured(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
        jnp.asarray(mesh.tcoords), jnp.asarray(tex), jnp.asarray(_pose()),
        jnp.asarray(K), width=128, height=128, tile=32, capacity=8,
        face_chunk=2)
    color, depth = np.asarray(color), np.asarray(depth)
    assert (depth > 0).sum() > 1000
    # quad projects to x,y in [26.5, 101.5); vertex (-s,-s) [uv (0,0)] lands
    # top-left in screen space (pinhole y grows downward), so screen rows
    # map directly to v: top rows = v<.5, bottom rows = v>.5
    probes = {(45, 45): tex[0, 0],      # upper-left screen = u<.5, v<.5
              (45, 83): tex[0, 1],
              (83, 45): tex[1, 0],
              (83, 83): tex[1, 1]}
    for (r, c), want in probes.items():
        assert depth[r, c] > 0
        np.testing.assert_allclose(color[r, c], want, atol=1e-5,
                                   err_msg=f"probe ({r},{c})")


def test_textured_matches_vertex_colors_for_constant_texture():
    """With a constant texture the per-pixel path must equal the vertex-color
    path wherever the quad covers (same kernels, same coverage)."""
    import jax.numpy as jnp
    from pose3d_tpu.render.rasterizer_tiled import render_view_tiled
    mesh = _quad_mesh()
    const = np.full((4, 4, 3), 0.7, np.float32)
    colt, dept = render_view_textured(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
        jnp.asarray(mesh.tcoords), jnp.asarray(const), jnp.asarray(_pose()),
        jnp.asarray(K), width=128, height=128, tile=32, capacity=8,
        face_chunk=2)
    colv, depv = render_view_tiled(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
        jnp.asarray(np.full((4, 3), 0.7, np.float32)), jnp.asarray(_pose()),
        jnp.asarray(K), width=128, height=128, tile=32, capacity=8,
        face_chunk=2)
    np.testing.assert_allclose(np.asarray(dept), np.asarray(depv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(colt), np.asarray(colv), atol=1e-6)


def test_sample_texture_nearest_indexing():
    import jax.numpy as jnp
    tex = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 2, 3))
    u = jnp.asarray([0.0, 0.9, 0.49, 0.51])
    v = jnp.asarray([0.0, 0.9, 0.51, 0.49])
    out = np.asarray(sample_texture_nearest(u, v, tex))
    np.testing.assert_allclose(out[0], np.arange(0, 3))      # (y0, x0)
    np.testing.assert_allclose(out[1], np.arange(9, 12))     # (y1, x1)
    np.testing.assert_allclose(out[2], np.arange(6, 9))      # (y1, x0)
    np.testing.assert_allclose(out[3], np.arange(3, 6))      # (y0, x1)
