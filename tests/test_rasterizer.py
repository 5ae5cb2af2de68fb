import numpy as np
import jax.numpy as jnp

from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.rasterizer import render_view, render_views

K = jnp.asarray([[100.0, 0.0, 32.0],
                 [0.0, 100.0, 32.0],
                 [0.0, 0.0, 1.0]])
W = H = 64


def _identity_pose(z=0.4):
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = z
    return jnp.asarray(T)


def _tri(verts, colors=None):
    v = np.asarray(verts, np.float32)
    f = np.asarray([[0, 1, 2]], np.int32)
    c = np.asarray(colors if colors is not None else np.ones((3, 3)),
                   np.float32)
    return jnp.asarray(v), jnp.asarray(f), jnp.asarray(c)


def test_single_triangle_coverage_and_depth():
    # big triangle centered on the axis at z = 0.5
    v, f, c = _tri([[-0.1, -0.1, 0.0], [0.1, -0.1, 0.0], [0.0, 0.15, 0.0]])
    col, dep = render_view(v, f, c, _identity_pose(0.5), K, W, H,
                           face_chunk=8)
    col, dep = np.asarray(col), np.asarray(dep)
    assert abs(dep[32, 32] - 0.5) < 1e-4          # center covered, exact z
    assert dep[2, 2] == 0.0                        # background
    assert abs(col[32, 32, 0] - 1.0) < 1e-5
    assert col[2, 2, 0] == 0.0


def test_winding_independence():
    v, f, c = _tri([[-0.1, -0.1, 0.0], [0.1, -0.1, 0.0], [0.0, 0.15, 0.0]])
    f_rev = jnp.asarray([[0, 2, 1]], np.int32)
    _, d1 = render_view(v, f, c, _identity_pose(0.5), K, W, H, face_chunk=8)
    _, d2 = render_view(v, f_rev, c, _identity_pose(0.5), K, W, H,
                        face_chunk=8)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_perspective_correct_depth_on_tilted_plane():
    # plane z = 0.5 + 0.5 * x  (in camera frame), covering the view center
    v = jnp.asarray([[-0.2, -0.3, 0.4], [0.2, -0.3, 0.6],
                     [0.2, 0.3, 0.6], [-0.2, 0.3, 0.4]], jnp.float32)
    f = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    c = jnp.ones((4, 3), jnp.float32)
    pose = jnp.asarray(np.eye(4, dtype=np.float32))
    col, dep = render_view(v, f, c, pose, K, W, H, face_chunk=8)
    dep = np.asarray(dep)
    for (r, cc) in [(32, 32), (20, 40), (40, 25)]:
        # ray through pixel center: x = (u - ox)/fx * z; plane z = 0.5+0.5x
        u = cc + 0.5
        xr = (u - 32.0) / 100.0
        z_expect = 0.5 / (1.0 - 0.5 * xr)
        if dep[r, cc] > 0:
            assert abs(dep[r, cc] - z_expect) < 1e-3, (r, cc)


def test_zbuffer_occlusion():
    # two stacked triangles; the nearer one must win and contribute color
    v = jnp.asarray([
        [-0.1, -0.1, 0.0], [0.1, -0.1, 0.0], [0.0, 0.15, 0.0],   # far @0.5
        [-0.1, -0.1, -0.1], [0.1, -0.1, -0.1], [0.0, 0.15, -0.1],  # near @0.4
    ], jnp.float32)
    f = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    c = jnp.asarray([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, jnp.float32)
    col, dep = render_view(v, f, c, _identity_pose(0.5), K, W, H,
                           face_chunk=8)
    col, dep = np.asarray(col), np.asarray(dep)
    assert abs(dep[32, 32] - 0.4) < 1e-4
    np.testing.assert_allclose(col[32, 32], [0, 1, 0], atol=1e-5)


def test_cube_render_extent_and_depth():
    mesh = make_test_mesh("cube", size=0.1)
    pose = _identity_pose(0.4)
    col, dep = render_view(jnp.asarray(mesh.vertices),
                           jnp.asarray(mesh.faces),
                           jnp.asarray(mesh.colors), pose, K, W, H,
                           face_chunk=8)
    dep = np.asarray(dep)
    # front face at z = 0.4 - 0.05
    assert abs(dep[32, 32] - 0.35) < 1e-4
    # projected half-extent: fx * 0.05 / 0.35 = ~14.3 px
    covered = dep > 0
    ys, xs = np.nonzero(covered)
    half_w = (xs.max() - xs.min()) / 2
    assert 12 <= half_w <= 17
    assert not covered[0].any() and not covered[-1].any()


def test_vertex_color_interpolation():
    # single triangle with distinct vertex colors: center pixel blends them
    v, f, c = _tri([[-0.1, -0.1, 0.0], [0.1, -0.1, 0.0], [0.0, 0.15, 0.0]],
                   colors=[[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    col, dep = render_view(v, f, c, _identity_pose(0.5), K, W, H,
                           face_chunk=8)
    col = np.asarray(col)
    px = col[32, 32]
    assert abs(px.sum() - 1.0) < 1e-4          # barycentric partition of unity
    assert (px > 0.05).all()                   # all three colors contribute


def test_clipped_window_offset():
    # rendering a 16x16 window at (24, 24) must match the same region of the
    # full-frame render (the reference's clipped renderView mode)
    mesh = make_test_mesh("tetra", size=0.12)
    pose = _identity_pose(0.45)
    colf, depf = render_view(jnp.asarray(mesh.vertices),
                             jnp.asarray(mesh.faces),
                             jnp.asarray(mesh.colors), pose, K, W, H,
                             face_chunk=8)
    colw, depw = render_view(jnp.asarray(mesh.vertices),
                             jnp.asarray(mesh.faces),
                             jnp.asarray(mesh.colors), pose, K, 16, 16,
                             x0=24, y0=24, face_chunk=8)
    np.testing.assert_allclose(np.asarray(depw),
                               np.asarray(depf)[24:40, 24:40], atol=1e-6)
    np.testing.assert_allclose(np.asarray(colw),
                               np.asarray(colf)[24:40, 24:40], atol=1e-6)


def test_render_views_batch():
    mesh = make_test_mesh("cube", size=0.1)
    poses = np.stack([np.asarray(_identity_pose(0.4)),
                      np.asarray(_identity_pose(0.6))])
    col, dep = render_views(jnp.asarray(mesh.vertices),
                            jnp.asarray(mesh.faces),
                            jnp.asarray(mesh.colors),
                            jnp.asarray(poses), K, W, H, face_chunk=8)
    dep = np.asarray(dep)
    assert dep.shape == (2, H, W)
    assert abs(dep[0, 32, 32] - 0.35) < 1e-4
    assert abs(dep[1, 32, 32] - 0.55) < 1e-4
    # nearer view covers more pixels
    assert (dep[0] > 0).sum() > (dep[1] > 0).sum()


def test_mesh_loader_roundtrip(tmp_path):
    # ascii PLY with vertex colors
    ply = tmp_path / "tri.ply"
    ply.write_text("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 1
property list uchar int vertex_indices
end_header
0 0 0 255 0 0
1 0 0 0 255 0
0 1 0 0 0 255
3 0 1 2
""")
    from pose3d_tpu.render import load_mesh
    m = load_mesh(str(ply))
    assert m.vertices.shape == (3, 3)
    assert m.faces.shape == (1, 3)
    # colors are BGR in [0,1]
    np.testing.assert_allclose(m.colors[0], [0, 0, 1])
    np.testing.assert_allclose(m.colors[2], [1, 0, 0])
    assert m.normals.shape == (3, 3)
    np.testing.assert_allclose(np.abs(m.normals[:, 2]), 1.0, atol=1e-6)
