"""Backface culling for closed oriented meshes.

The reference renders without GL face culling (src/painter.cpp never
enables GL_CULL_FACE), so culling here is gated on a PROOF of output
equivalence: render.mesh.front_sign qualifies a mesh only when it is a
closed, consistently oriented 2-manifold — then every camera ray's
nearest hit is front-facing and dropping backfaces cannot change the
z-buffer winner.  These tests pin (a) the qualification logic, (b) the
screen-area sign convention, and (c) z-buffer equality of culled vs
unculled renders on every production rasterizer path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.ops.sphere import create_view_poses
from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.mesh import Mesh, front_sign, vertex_normals
from pose3d_tpu.render.rasterizer_tiled import (probe_capacity,
                                                render_view_tiled)

K = np.asarray([[150.0, 0.0, 64.0],
                [0.0, 150.0, 64.0],
                [0.0, 0.0, 1.0]], np.float32)
W = H = 128


def _poses(n=4, z=0.35):
    poses, _ = create_view_poses(1, (z, 1.1, 1.0), (-45.0, 45.0, 45.0),
                                 True)
    return np.asarray(poses, np.float32)[:: max(1, len(poses) // n)][:n]


# ---------------------------------------------------------------- detection

def test_front_sign_closed_meshes():
    """Every watertight procedural mesh qualifies, at every subdivision
    level, with a CONSISTENT sign across levels (subdivision preserves
    orientation — a level-dependent sign was exactly the v-vs-welded
    indexing bug this pins).  The cone does NOT qualify: its zero-radius
    top ring welds every side triangle's top edge to the apex, leaving
    positionally-degenerate faces — conservative 0 is the contract."""
    for kind in ("cube", "tetra", "sphere", "torus", "cylinder"):
        signs = {front_sign(make_test_mesh(kind, 0.1, detail=d))
                 for d in (1, 2, 3)}
        assert len(signs) == 1 and 0 not in signs, \
            f"{kind} should qualify with one sign, got {signs}"
    assert front_sign(make_test_mesh("cone", 0.1, detail=2)) == 0


def test_front_sign_flips_with_winding():
    mesh = make_test_mesh("sphere", 0.1, detail=1)
    s = front_sign(mesh)
    flipped = Mesh(mesh.vertices, mesh.faces[:, ::-1].copy(), mesh.colors,
                   mesh.normals)
    assert front_sign(flipped) == -s


def test_front_sign_open_mesh_disqualifies():
    mesh = make_test_mesh("sphere", 0.1, detail=1)
    open_mesh = Mesh(mesh.vertices, mesh.faces[:-1].copy(), mesh.colors,
                     mesh.normals)
    assert front_sign(open_mesh) == 0


def test_front_sign_mixed_winding_disqualifies():
    mesh = make_test_mesh("sphere", 0.1, detail=1)
    f = mesh.faces.copy()
    f[0] = f[0, ::-1]
    assert front_sign(Mesh(mesh.vertices, f, mesh.colors, mesh.normals)) == 0


def test_front_sign_degenerate_face_disqualifies():
    mesh = make_test_mesh("cube", 0.1)
    f = np.concatenate([mesh.faces, [[0, 0, 0]]]).astype(np.int32)
    assert front_sign(Mesh(mesh.vertices, f, mesh.colors, mesh.normals)) == 0


def test_front_sign_welds_duplicate_vertices():
    """Per-face vertex soups (common PLY export) still qualify after
    positional welding."""
    mesh = make_test_mesh("tetra", 0.1)
    v = mesh.vertices[mesh.faces.reshape(-1)]          # 3 verts per face
    f = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    cols = np.full_like(v, 0.5)
    soup = Mesh(v, f, cols, vertex_normals(v, f))
    assert front_sign(soup) == front_sign(mesh)


# ------------------------------------------------------------- render parity

@pytest.mark.parametrize("kind,detail", [("sphere", 2), ("cube", 2),
                                         ("torus", 2)])
def test_cull_tiled_z_buffer_identical(kind, detail):
    """Culled render == unculled render on the XLA tiled path: for a
    closed oriented mesh the z-buffer winner never changes."""
    mesh = make_test_mesh(kind, 0.1, detail=detail)
    s = front_sign(mesh)
    assert s != 0
    verts = jnp.asarray(mesh.vertices)
    faces = jnp.asarray(mesh.faces)
    cols = jnp.asarray(mesh.colors)
    Kj = jnp.asarray(K)
    for pose in _poses():
        base_c, base_d = render_view_tiled(
            verts, faces, cols, jnp.asarray(pose), Kj, width=W, height=H,
            tile=32, capacity=256, face_chunk=128,
            front_sign=jnp.float32(0.0))
        cull_c, cull_d = render_view_tiled(
            verts, faces, cols, jnp.asarray(pose), Kj, width=W, height=H,
            tile=32, capacity=256, face_chunk=128,
            front_sign=jnp.float32(s))
        np.testing.assert_array_equal(np.asarray(base_d),
                                      np.asarray(cull_d))
        np.testing.assert_array_equal(np.asarray(base_c),
                                      np.asarray(cull_c))
        assert float(jnp.sum(base_d > 0)) > 50      # actually covered


def test_cull_wrong_sign_breaks_render():
    """The inverted sign renders ONLY backfaces — a sign-convention error
    in front_sign would be caught by the parity test above, and this one
    pins that the convention test has teeth (the depth map changes)."""
    mesh = make_test_mesh("sphere", 0.1, detail=2)
    s = front_sign(mesh)
    verts, faces, cols = map(jnp.asarray,
                             (mesh.vertices, mesh.faces, mesh.colors))
    pose = jnp.asarray(_poses()[0])
    _, d_ok = render_view_tiled(verts, faces, cols, pose, jnp.asarray(K),
                                width=W, height=H, tile=32, capacity=256,
                                face_chunk=128, front_sign=jnp.float32(s))
    _, d_bad = render_view_tiled(verts, faces, cols, pose, jnp.asarray(K),
                                 width=W, height=H, tile=32, capacity=256,
                                 face_chunk=128,
                                 front_sign=jnp.float32(-s))
    # backface depths are strictly behind: every covered pixel differs
    both = (np.asarray(d_ok) > 0) & (np.asarray(d_bad) > 0)
    assert both.sum() > 50
    assert (np.asarray(d_bad)[both] > np.asarray(d_ok)[both]).all()


def test_cull_pallas_z_buffer_identical():
    """Culled == unculled on the Pallas pair-segment path (interpret mode
    off-TPU).  Slot indices legitimately differ (the binned segments
    shrink), so compare depth and the winning FACE id via pair_faces."""
    from pose3d_tpu.render.rasterizer_pallas import \
        render_views_slots_pallas
    interp = jax.default_backend() != "tpu"
    mesh = make_test_mesh("sphere", 0.1, detail=2)
    s = front_sign(mesh)
    verts, faces, cols = map(jnp.asarray,
                             (mesh.vertices, mesh.faces, mesh.colors))
    poses = jnp.asarray(_poses(2))
    outs = {}
    for tag, fs in (("base", 0.0), ("cull", float(s))):
        dep, slot, pf, attrs, ovf = render_views_slots_pallas(
            verts, faces, cols, poses, jnp.asarray(K), width=W, height=H,
            tile=32, capacity=256, face_chunk=128, global_capacity=256,
            interpret=interp, front_sign=jnp.float32(fs))
        fid = jnp.take_along_axis(
            pf, slot.reshape(len(poses), -1), axis=1).reshape(slot.shape)
        outs[tag] = (np.asarray(dep), np.asarray(fid), bool(ovf))
    assert not outs["base"][2] and not outs["cull"][2]
    np.testing.assert_array_equal(outs["base"][0], outs["cull"][0])
    covered = outs["base"][0] > 0
    assert covered.sum() > 100
    np.testing.assert_array_equal(outs["base"][1][covered],
                                  outs["cull"][1][covered])


def test_probe_capacity_cull_consistent():
    """The capacity probe culls with the same predicate as the render, so
    sized capacity reflects the culled segment population (~half)."""
    mesh = make_test_mesh("sphere", 0.1, detail=3)
    s = front_sign(mesh)
    verts, faces = jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces)
    poses = jnp.asarray(_poses(4))
    mo0, _ = jax.device_get(probe_capacity(
        verts, faces, poses, jnp.asarray(K), width=W, height=H, tile=32,
        front_sign=jnp.float32(0.0)))
    mo1, _ = jax.device_get(probe_capacity(
        verts, faces, poses, jnp.asarray(K), width=W, height=H, tile=32,
        front_sign=jnp.float32(s)))
    assert int(mo1) < int(mo0)
    assert int(mo1) >= int(mo0) * 0.3          # roughly half, not zero


def test_dataset_gen_cull_protocol_identical(monkeypatch, tmp_path):
    """The production generation path produces protocol-identical patches
    with culling enabled (auto, closed mesh) vs force-disabled.

    Not bit-identical: the rasterizer's coverage tolerance (scaled by
    |area|, rasterizer._rasterize_rows) shades a sub-pixel sliver just
    past each edge, so at silhouette edges an unculled render can let the
    adjacent BACKFACE win tolerance-ring pixels the front face does not
    cover.  Culling removes those sliver pixels — which a GL rasterizer
    with exact edge rules (the reference) never shades in the first
    place.  Measured on this fixture: 135 of 5,017,600 elements, 13 of
    175 patches, color/normal channels only, max |diff| 0.088.  The test
    pins that the disagreement stays in that regime (a sign-convention or
    indexing bug flips entire depth maps, caught by the bounds below)."""
    from pose3d_tpu.data import dataset as ds
    from pose3d_tpu.data.benchmarks import LINEMOD_K

    mesh = make_test_mesh("sphere", 0.1, detail=2)
    assert front_sign(mesh) != 0
    culled = ds.create_synth_samples(mesh, LINEMOD_K, 0, 1, True,
                                     to_host=True)
    monkeypatch.setattr(ds, "front_sign", lambda m: 0)
    plain = ds.create_synth_samples(mesh, LINEMOD_K, 0, 1, True,
                                    to_host=True)
    np.testing.assert_array_equal(culled.labels, plain.labels)
    a = np.asarray(culled.patches, np.float32)
    b = np.asarray(plain.patches, np.float32)
    mism = a != b
    assert mism.mean() < 1e-4, f"sliver mismatch too large: {mism.mean()}"
    assert float(np.abs(a[mism] - b[mism]).max(initial=0.0)) < 0.25
