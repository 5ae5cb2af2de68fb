"""Per-view bbox-clipped render windows (renderView(clipped=true),
reference src/sphere.cpp:37-67): off-center poses render only the window
covering the projected AABB, and the clipped output must equal the same
crop of a full-frame render, bit for bit."""

import numpy as np
import jax.numpy as jnp

from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.rasterizer_tiled import (render_view_tiled,
                                                render_views_clipped)
from pose3d_tpu.render.windows import (bbox_window, clipped_windows,
                                       project_bbox)

K = np.asarray([[150.0, 0.0, 64.0],
                [0.0, 150.0, 64.0],
                [0.0, 0.0, 1.0]], np.float32)
W = H = 128


def _offcenter_pose(tx, ty, z=0.45, rot_deg=30.0):
    a = np.deg2rad(rot_deg)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[np.cos(a), -np.sin(a), 0],
                          [np.sin(a), np.cos(a), 0],
                          [0, 0, 1]], np.float32)
    T[:3, 3] = [tx, ty, z]
    return T


def test_bbox_window_reference_semantics():
    """x/y truncated from max(0, min coord); w/h clipped at the image edge
    (src/sphere.cpp:44-53)."""
    mesh = make_test_mesh("cube", 0.1)
    pose = _offcenter_pose(0.06, -0.03)
    x, y, w, h = bbox_window(pose, K, mesh.bounding_box, W, H)
    u, v = project_bbox(pose, K, mesh.bounding_box)
    assert x == int(max(0.0, u.min()))
    assert y == int(max(0.0, v.min()))
    assert w == max(0, min(W, int(u.max())) - x)
    assert h == max(0, min(H, int(v.max())) - y)
    assert 0 <= x and x + w <= W and 0 <= y and y + h <= H


def test_bbox_window_clamps_offscreen():
    mesh = make_test_mesh("cube", 0.1)
    pose = _offcenter_pose(-0.5, 0.0)           # object far left of frame
    x, y, w, h = bbox_window(pose, K, mesh.bounding_box, W, H)
    assert x == 0 and w == 0                    # fully clipped


def test_clipped_windows_cover_each_reference_rect():
    mesh = make_test_mesh("cube", 0.1)
    poses = np.stack([_offcenter_pose(dx, dy, z, r)
                      for (dx, dy, z, r) in [(0.0, 0.0, 0.4, 0),
                                             (0.08, -0.05, 0.45, 20),
                                             (-0.06, 0.07, 0.5, 65)]])
    x0s, y0s, w, h = clipped_windows(poses, K, mesh.bounding_box, W, H,
                                     multiple=32)
    assert w % 32 == 0 and h % 32 == 0
    for i, pose in enumerate(poses):
        x, y, ww, hh = bbox_window(pose, K, mesh.bounding_box, W, H)
        assert x0s[i] <= x and x + ww <= x0s[i] + w
        assert y0s[i] <= y and y + hh <= y0s[i] + h
        assert 0 <= x0s[i] and x0s[i] + w <= W
        assert 0 <= y0s[i] and y0s[i] + h <= H


def test_offcenter_clipped_render_equals_fullframe_crop():
    """The VERDICT's done-condition: an off-center pose rendered through the
    clipped-window path equals the full-frame render cropped at the window."""
    mesh = make_test_mesh("tetra", 0.12)
    poses = np.stack([_offcenter_pose(0.09, -0.06, 0.45, 30),
                      _offcenter_pose(-0.07, 0.05, 0.5, 100)])
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors))
    color, depth, x0s, y0s = render_views_clipped(
        *args, jnp.asarray(poses), jnp.asarray(K), mesh.bounding_box,
        img_w=W, img_h=H, tile=32, capacity=16, face_chunk=8)
    h, w = depth.shape[1:3]
    for i, pose in enumerate(poses):
        colf, depf = render_view_tiled(*args, jnp.asarray(pose),
                                       jnp.asarray(K), width=W, height=H,
                                       tile=32, capacity=16, face_chunk=8)
        x0, y0 = int(x0s[i]), int(y0s[i])
        np.testing.assert_allclose(
            np.asarray(depth[i]),
            np.asarray(depf)[y0:y0 + h, x0:x0 + w], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(color[i]),
            np.asarray(colf)[y0:y0 + h, x0:x0 + w], atol=1e-5)
        # the object is actually in the window (non-trivial crop)
        assert (np.asarray(depth[i]) > 0).sum() > 50


def test_clipped_pallas_path_matches_xla_clipped():
    """The Pallas fast path with traced per-view origins
    (render_views_clipped_pallas) must reproduce the XLA clipped path."""
    from pose3d_tpu.render.rasterizer_pallas import \
        render_views_clipped_pallas
    mesh = make_test_mesh("tetra", 0.12)
    poses = np.stack([_offcenter_pose(0.09, -0.06, 0.45, 30),
                      _offcenter_pose(-0.07, 0.05, 0.5, 100)])
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors))
    colx, depx, x0x, y0x = render_views_clipped(
        *args, jnp.asarray(poses), jnp.asarray(K), mesh.bounding_box,
        img_w=W, img_h=H, tile=32, capacity=16, face_chunk=8)
    colp, depp, x0p, y0p = render_views_clipped_pallas(
        *args, jnp.asarray(poses), jnp.asarray(K), mesh.bounding_box,
        img_w=W, img_h=H, tile=32, capacity=16, face_chunk=8,
        interpret=True)
    np.testing.assert_array_equal(x0x, x0p)
    np.testing.assert_array_equal(y0x, y0p)
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depx),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(colp), np.asarray(colx),
                               atol=1e-5)
    assert (np.asarray(depp) > 0).sum() > 100


def test_fuzz_clipped_soup_equals_fullframe_crop():
    """Clipped-window rendering on the adversarial mixed soup (fixtures.
    _mixed_soup: global-section faces, degenerates, a near-plane-invalid
    face) with off-center poses: both clipped paths must equal the
    full-frame render cropped at each traced window, with the soup's AABB
    partially offscreen so the window clamps engage."""
    from fixtures import _mixed_soup
    from pose3d_tpu.render.rasterizer_pallas import \
        render_views_clipped_pallas
    soup_v, soup_f, soup_c = _mixed_soup(6)
    vv = np.asarray(soup_v)
    corners = np.stack(np.meshgrid(*[(vv[:, i].min(), vv[:, i].max())
                                     for i in range(3)],
                                   indexing="ij"), -1).reshape(-1, 3)
    # far enough that the soup's AABB projects to a SUB-frame window
    # (a full-frame clamp would make the crop comparison trivial)
    poses = np.stack([_offcenter_pose(0.25, -0.20, 2.0, 25),
                      _offcenter_pose(-0.30, 0.15, 2.2, 140)])
    args = (soup_v, soup_f, soup_c)
    colx, depx, x0x, y0x = render_views_clipped(
        *args, jnp.asarray(poses), jnp.asarray(K), corners,
        img_w=W, img_h=H, tile=32, capacity=64, face_chunk=32)
    colp, depp, x0p, y0p = render_views_clipped_pallas(
        *args, jnp.asarray(poses), jnp.asarray(K), corners,
        img_w=W, img_h=H, tile=32, capacity=64, face_chunk=32,
        interpret=True)
    np.testing.assert_array_equal(x0x, x0p)
    np.testing.assert_array_equal(y0x, y0p)
    h, w = depx.shape[1:3]
    assert (h, w) != (H, W)                      # clamps actually clipped
    for i, pose in enumerate(poses):
        colf, depf = render_view_tiled(
            *args, jnp.asarray(pose), jnp.asarray(K), width=W, height=H,
            tile=32, capacity=64, face_chunk=32)
        x0, y0 = int(x0x[i]), int(y0x[i])
        crop_d = np.asarray(depf)[y0:y0 + h, x0:x0 + w]
        crop_c = np.asarray(colf)[y0:y0 + h, x0:x0 + w]
        assert (np.asarray(depx[i]) > 0).sum() > 100
        # depth atol 5e-5 (25 um at this ~2 m range): the clipped program
        # centers its edge-function coordinates on the WINDOW, the full
        # frame on the image, so a borderline coverage-sliver pixel can
        # round to a winner whose interpolated depth differs by a few
        # dozen ulps (~0.01% of pixels on this soup)
        np.testing.assert_allclose(np.asarray(depx[i]), crop_d, atol=5e-5)
        np.testing.assert_allclose(np.asarray(colx[i]), crop_c, atol=1e-4)
        np.testing.assert_allclose(np.asarray(depp[i]), crop_d, atol=5e-5)
        np.testing.assert_allclose(np.asarray(colp[i]), crop_c, atol=1e-4)
