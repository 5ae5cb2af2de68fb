import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.render import make_test_mesh
from fixtures import _mixed_soup
from pose3d_tpu.render.rasterizer import render_view
from pose3d_tpu.render.rasterizer_pallas import (render_view_pallas,
                                                 render_view_tiled_pallas)

K = jnp.asarray([[100.0, 0.0, 32.0], [0.0, 100.0, 32.0], [0.0, 0.0, 1.0]])


def _interp():
    # run compiled on real TPU, interpreted elsewhere (tests force CPU)
    return jax.devices()[0].platform != "tpu"


def test_pallas_matches_brute_force():
    mesh = make_test_mesh("cube", 0.1)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.4
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), jnp.asarray(T), K)
    colb, depb = render_view(*args, width=64, height=64, face_chunk=8)
    colp, depp = render_view_pallas(*args, width=64, height=64,
                                    face_chunk=128, interpret=_interp())
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(colp), np.asarray(colb), atol=1e-5)


def test_tiled_pallas_matches_tiled_xla():
    from pose3d_tpu.render.rasterizer_pallas import render_view_tiled_pallas
    from pose3d_tpu.render.rasterizer_tiled import render_view_tiled
    mesh = make_test_mesh("cube", 0.1)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.4
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), jnp.asarray(T), K)
    colx, depx = render_view_tiled(*args, width=64, height=64, tile=32,
                                   capacity=16, face_chunk=8)
    colp, depp = render_view_tiled_pallas(*args, width=64, height=64,
                                          tile=32, capacity=128,
                                          face_chunk=128,
                                          interpret=_interp())
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(colp), np.asarray(colx), atol=1e-5)


def test_pallas_window_offset():
    mesh = make_test_mesh("tetra", 0.12)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.45
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), jnp.asarray(T), K)
    colf, depf = render_view_pallas(*args, width=64, height=64,
                                    interpret=_interp())
    colw, depw = render_view_pallas(*args, width=32, height=32, x0=16,
                                    y0=16, interpret=_interp())
    np.testing.assert_allclose(np.asarray(depw),
                               np.asarray(depf)[16:48, 16:48], atol=1e-5)


def test_large_faces_use_global_section():
    # two triangles spanning nearly the whole window (>2x2 tiles of 32 px)
    # must render through the binning's shared global section
    verts = jnp.asarray([[-0.2, -0.2, 0.0], [0.2, -0.2, 0.0],
                         [0.2, 0.2, 0.0], [-0.2, 0.2, 0.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    colors = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                          [0.0, 0.0, 1.0], [1.0, 1.0, 0.0]], jnp.float32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.35
    args = (verts, faces, colors, jnp.asarray(T), K)

    from pose3d_tpu.render.rasterizer_tiled import count_large_faces
    n_large = count_large_faces(verts, faces, colors, T, K, 160, 160,
                                tile=32)
    assert n_large == 2

    from pose3d_tpu.render.rasterizer_pallas import render_view_tiled_pallas
    colb, depb = render_view(*args, width=160, height=160, face_chunk=8)
    colp, depp = render_view_tiled_pallas(*args, width=160, height=160,
                                          tile=32, capacity=128,
                                          face_chunk=128,
                                          interpret=_interp())
    assert float(jnp.sum(depp > 0)) > 1000    # actually covered pixels
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(colp), np.asarray(colb),
                               atol=1e-5)


def test_global_gating_multi_chunk():
    """Per-tile active-global-chunk gating with >face_chunk large faces:
    the global section spans several 32-face chunks and different tiles
    overlap DIFFERENT chunk subsets (gact_idx remaps non-contiguous
    chunk lists), so a gating/indexing bug shifts z-winners or drops
    coverage vs the brute-force reference."""
    rng = np.random.default_rng(7)
    # 80 large quads (160 triangles -> 5 global chunks at fc=32), each
    # spanning >2x2 tiles of 32 px, scattered so left-edge tiles see
    # different chunks than right-edge tiles; random depths force real
    # z-buffer contests between chunks
    verts, faces, colors = [], [], []
    for i in range(80):
        cx, cy = rng.uniform(-0.28, 0.28, size=2)
        z = rng.uniform(-0.06, 0.06)
        s = 0.17                                  # ~97 px at z=0.35
        base = len(verts)
        verts += [[cx - s, cy - s, z], [cx + s, cy - s, z],
                  [cx + s, cy + s, z], [cx - s, cy + s, z]]
        faces += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
        colors += [list(rng.uniform(0, 1, size=3)) for _ in range(4)]
    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    colors = jnp.asarray(colors, jnp.float32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.35
    args = (verts, faces, colors, jnp.asarray(T), K)

    from pose3d_tpu.render.rasterizer_tiled import count_large_faces
    n_large = int(count_large_faces(verts, faces, colors, T, K, 160, 160,
                                    tile=32))
    assert n_large > 32                        # really spans >1 chunk

    from pose3d_tpu.render.rasterizer_pallas import render_view_tiled_pallas
    colb, depb = render_view(*args, width=160, height=160, face_chunk=8)
    colp, depp = render_view_tiled_pallas(*args, width=160, height=160,
                                          tile=32, capacity=32,
                                          face_chunk=32,
                                          global_capacity=192,
                                          interpret=_interp())
    assert float(jnp.sum(depp > 0)) > 5000
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(colp), np.asarray(colb),
                               atol=1e-4)


def test_bin_counts_sections():
    # seg_len counts only the per-tile segment; g_count only >2x2 spans
    from pose3d_tpu.render.rasterizer_tiled import bin_faces_to_tiles
    bb_min = jnp.asarray([[1.0, 1.0], [0.0, 0.0], [40.0, 8.0]])
    bb_max = jnp.asarray([[10.0, 10.0], [90.0, 90.0], [50.0, 12.0]])
    valid = jnp.asarray([True, True, True])
    fi, fo, seg_len, g_count, _ = bin_faces_to_tiles(
        bb_min, bb_max, valid, 4, 4, 32, 0.0, 0.0, 8, 8)
    assert int(g_count) == 1                   # the 0..90 face
    seg = np.asarray(seg_len).reshape(4, 4)
    assert seg[0, 0] == 1 and seg[0, 1] == 1   # small faces' tiles
    assert seg.sum() == 2
    # global slots precede the segment and carry the large face
    assert np.asarray(fo)[:, 0].all()
    assert (np.asarray(fi)[:, 0] == 1).all()


def test_invalid_near_plane_face_never_rasterizes():
    """A face with a vertex at camera z <= NEAR is invalid and must not
    render — its pairs land in the sentinel region of the sorted pair
    list, and an unmasked chunk-aligned read there once rasterized its
    bogus rows (regression: the pair path must zero invalid faces' rows
    at the source, like face_ok did for the padded-table path)."""
    verts = jnp.asarray([[0.0, 0.0, 0.45], [0.05, 0.0, 0.45],
                         [0.0, 0.05, 0.45],
                         # triangle crossing the near plane whose clamped
                         # projection covers the window center
                         [-0.02, -0.02, 0.0005], [0.1, 0.0, 0.3],
                         [0.0, 0.1, 0.3]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.ones((6, 3), jnp.float32)
    K = jnp.asarray([[150.0, 0.0, 32.0], [0.0, 150.0, 32.0],
                     [0.0, 0.0, 1.0]], jnp.float32)
    T = jnp.eye(4)

    from pose3d_tpu.render.rasterizer import render_view
    colb, depb = render_view(verts, faces, colors, T, K, 64, 64)
    colp, depp = render_view_tiled_pallas(verts, faces, colors, T, K,
                                          width=64, height=64, tile=32,
                                          capacity=8, face_chunk=8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(colp), np.asarray(colb),
                               atol=1e-5)
    assert (np.asarray(depp) > 0).sum() > 0          # valid face renders


def test_slot_sparse_patch_bit_identical():
    """The slot-sparse generation path (face colors evaluated only at the
    64x64 patch resample taps — dataset._patch_from_slots) must reproduce
    the full-window color epilogue + sample_patch pipeline bit-for-bit."""
    from pose3d_tpu.data.dataset import _patch_from_slots
    from pose3d_tpu.ops.geometry import depth2normals
    from pose3d_tpu.ops.patch import sample_patch
    from pose3d_tpu.render.rasterizer_pallas import (
        render_views_slots_pallas, render_views_tiled_pallas)

    mesh = make_test_mesh("cube", 0.1)
    poses = []
    for rz, z in ((0.3, 0.4), (-0.7, 0.5), (1.9, 0.45)):
        c, s = np.cos(rz), np.sin(rz)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                               np.float32)
        T[2, 3] = z
        poses.append(T)
    poses = jnp.asarray(np.stack(poses))
    args = (jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
            jnp.asarray(mesh.colors), poses, K)
    fx, fy = 100.0, 100.0
    oxw = jnp.float32(32.0)
    oyw = jnp.float32(32.0)
    zs = poses[:, 2, 3]

    col, dep, _ = render_views_tiled_pallas(
        *args, width=64, height=64, tile=32, capacity=128, face_chunk=128,
        interpret=_interp(), return_overflow=True)
    old = jax.vmap(lambda c, d, z: sample_patch(
        c * 255.0, d, depth2normals(d, fx, fy), oxw, oyw, z,
        fx=fx, fy=fy))(col, dep, zs)

    dep2, slot, pf, attrs, _ = render_views_slots_pallas(
        *args, width=64, height=64, tile=32, capacity=128, face_chunk=128,
        interpret=_interp())
    new = jax.vmap(lambda d, s, p, a, z: _patch_from_slots(
        d, s, p, a, jnp.zeros((1, 1, 3), jnp.float32), False,
        oxw, oyw, z, fx, fy))(dep2, slot, pf, attrs, zs)

    np.testing.assert_array_equal(np.asarray(dep2), np.asarray(dep))
    assert float(jnp.sum(dep > 0)) > 100          # the cube is in frame
    # same arithmetic, but XLA contracts fmas differently between the two
    # programs: color/normals agree to one f32 ulp, and the depth channel
    # (whose exact-zero bit is the augmentation background mask) is
    # bit-exact
    np.testing.assert_array_equal(np.asarray(new)[..., 3],
                                  np.asarray(old)[..., 3])
    np.testing.assert_allclose(np.asarray(new), np.asarray(old), atol=2e-7)


def test_slot_sparse_patch_textured_identical():
    """Textured branch of the slot-sparse path: per-pixel (u, v)
    interpolation + nearest texel lookup at the patch taps must match the
    full-window texturing + sample_patch pipeline (dataset._render_program's
    textured _post)."""
    from pose3d_tpu.data.dataset import _patch_from_slots
    from pose3d_tpu.ops.geometry import depth2normals
    from pose3d_tpu.ops.patch import sample_patch
    from pose3d_tpu.render.rasterizer_pallas import (
        render_views_slots_pallas, render_views_tiled_pallas)
    from pose3d_tpu.render.texture import sample_texture_nearest

    s = 0.1
    verts = jnp.asarray([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                        jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    uv = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     jnp.float32)          # (u, v, pad) as dataset packs it
    tex = jnp.asarray(
        np.stack([np.full((2, 2), c) for c in (0.9, 0.2, 0.5)], axis=-1)
        * np.asarray([[0.3, 1.0], [1.0, 0.6]])[..., None], jnp.float32)

    poses = []
    for rz, z in ((0.2, 0.4), (-0.9, 0.5)):
        c, si = np.cos(rz), np.sin(rz)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray([[c, -si, 0], [si, c, 0], [0, 0, 1]],
                               np.float32)
        T[2, 3] = z
        poses.append(T)
    poses = jnp.asarray(np.stack(poses))
    fx, fy = 100.0, 100.0
    oxw = jnp.float32(32.0)
    oyw = jnp.float32(32.0)
    zs = poses[:, 2, 3]
    args = (verts, faces, uv, poses, K)

    col, dep, _ = render_views_tiled_pallas(
        *args, width=64, height=64, tile=32, capacity=128, face_chunk=128,
        interpret=_interp(), return_overflow=True)

    def old_one(c, d, z):
        rgb = sample_texture_nearest(c[..., 0], c[..., 1], tex)
        c = jnp.where((d > 0.0)[..., None], rgb, 0.0)
        return sample_patch(c * 255.0, d, depth2normals(d, fx, fy),
                            oxw, oyw, z, fx=fx, fy=fy)
    old = jax.vmap(old_one)(col, dep, zs)

    dep2, slot, pf, attrs, _ = render_views_slots_pallas(
        *args, width=64, height=64, tile=32, capacity=128, face_chunk=128,
        interpret=_interp())
    new = jax.vmap(lambda d, s_, p, a, z: _patch_from_slots(
        d, s_, p, a, tex, True, oxw, oyw, z, fx, fy))(dep2, slot, pf,
                                                      attrs, zs)

    assert float(jnp.sum(dep > 0)) > 100
    np.testing.assert_array_equal(np.asarray(new)[..., 3],
                                  np.asarray(old)[..., 3])
    np.testing.assert_allclose(np.asarray(new), np.asarray(old), atol=2e-7)


def test_fuzz_mixed_soup_matches_brute_force():
    """Adversarial mixed soup, seeded: small faces, tile-spanning faces,
    >2x2-tile global-section faces, a near-plane-invalid face and zero-area
    degenerates in ONE scene — stressing the pair binning's per-tile
    segments, the gated global-section walk, invalid-face masking and
    z-buffer contests against each other rather than one feature per test
    (the reference renders such soups through one GL pass,
    reference src/painter.cpp:87-112, so any interaction bug here is a
    parity break, not just a perf path divergence)."""
    Kf = jnp.asarray([[100.0, 0.0, 48.0], [0.0, 100.0, 48.0],
                      [0.0, 0.0, 1.0]], jnp.float32)
    for seed in (0, 1):
        soup_v, soup_f, soup_c = _mixed_soup(seed)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 0.35
        args = (soup_v, soup_f, soup_c, jnp.asarray(T), Kf)

        colb, depb = render_view(*args, width=96, height=96, face_chunk=8)
        colp, depp = render_view_tiled_pallas(
            *args, width=96, height=96, tile=32, capacity=64,
            face_chunk=32, global_capacity=64, interpret=_interp())
        assert float(jnp.sum(depb > 0)) > 2000     # scene actually covers
        np.testing.assert_allclose(np.asarray(depp), np.asarray(depb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(colp), np.asarray(colb),
                                   atol=1e-4)


def test_point_degenerate_face_never_rasterizes():
    """A zero-area face with three IDENTICAL vertex positions must cover
    nothing on any path (GL draws zero-area primitives as nothing).
    Regression: under jit, XLA FMA-contracts the edge-constant products,
    leaving a tiny nonzero 'area' residue for point faces; their edge
    functions are position-independent constants, so the residue once
    admitted EVERY pixel of the window (brute force) / tile (pair kernel)
    at the face's depth.  Exercises the exact a,b==0 point test in
    _face_matrix under jit (jax.disable_jit never reproduced it)."""
    from pose3d_tpu.render.rasterizer_tiled import render_view_tiled
    Kf = jnp.asarray([[100.0, 0.0, 48.0], [0.0, 100.0, 48.0],
                      [0.0, 0.0, 1.0]], jnp.float32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.35
    # three distinct vertex INDICES with identical positions (the
    # duplicate-index guard alone must not be what saves us)
    verts = jnp.asarray([[0.05, 0.05, 0.0]] * 3
                        + [[-0.1, -0.1, 0.0], [0.0, -0.1, 0.0],
                           [-0.05, 0.0, 0.0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    colors = jnp.ones((6, 3), jnp.float32)
    args = (verts, faces, colors, jnp.asarray(T), Kf)

    colb, depb = render_view(*args, width=96, height=96, face_chunk=8)
    colx, depx = render_view_tiled(*args, width=96, height=96, tile=32,
                                   capacity=8, face_chunk=8)
    colp, depp = render_view_tiled_pallas(*args, width=96, height=96,
                                          tile=32, capacity=8, face_chunk=8,
                                          interpret=_interp())
    # the real face still renders; the point face contributes nothing
    for dep in (depb, depx, depp):
        d = np.asarray(dep)
        assert 0 < (d > 0).sum() < 600
    np.testing.assert_allclose(np.asarray(depx), np.asarray(depb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depp), np.asarray(depb), atol=1e-5)


def test_fuzz_slot_sparse_mixed_soup():
    """The production slot-sparse generation path (dataset._patch_from_slots
    over render_views_slots_pallas) against the full-window epilogue +
    sample_patch pipeline on the adversarial mixed soup: global-section
    faces, degenerates and a near-plane-invalid face must not perturb the
    slot packing or the tap-sparse color evaluation (depth bit-exact,
    attributes to one f32 ulp — same contract as the fixture-mesh test)."""
    from pose3d_tpu.data.dataset import _patch_from_slots
    from pose3d_tpu.ops.geometry import depth2normals
    from pose3d_tpu.ops.patch import sample_patch
    from pose3d_tpu.render.rasterizer_pallas import (
        render_views_slots_pallas, render_views_tiled_pallas)

    fx, fy = 100.0, 100.0
    oxw = jnp.float32(32.0)
    oyw = jnp.float32(32.0)
    for seed in (3, 4):
        soup_v, soup_f, soup_c = _mixed_soup(seed)
        poses = []
        for rz, z in ((0.4, 0.4), (-1.1, 0.5)):
            c, s = np.cos(rz), np.sin(rz)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                                   np.float32)
            T[2, 3] = z
            poses.append(T)
        poses = jnp.asarray(np.stack(poses))
        args = (soup_v, soup_f, soup_c, poses, K)
        zs = poses[:, 2, 3]

        col, dep, _ = render_views_tiled_pallas(
            *args, width=64, height=64, tile=32, capacity=64,
            face_chunk=32, global_capacity=64, interpret=_interp(),
            return_overflow=True)
        old = jax.vmap(lambda c, d, z: sample_patch(
            c * 255.0, d, depth2normals(d, fx, fy), oxw, oyw, z,
            fx=fx, fy=fy))(col, dep, zs)

        dep2, slot, pf, attrs, _ = render_views_slots_pallas(
            *args, width=64, height=64, tile=32, capacity=64,
            face_chunk=32, global_capacity=64, interpret=_interp())
        new = jax.vmap(lambda d, s, p, a, z: _patch_from_slots(
            d, s, p, a, jnp.zeros((1, 1, 3), jnp.float32), False,
            oxw, oyw, z, fx, fy))(dep2, slot, pf, attrs, zs)

        assert float(jnp.sum(dep > 0)) > 100       # soup is in frame
        np.testing.assert_array_equal(np.asarray(dep2), np.asarray(dep))
        np.testing.assert_array_equal(np.asarray(new)[..., 3],
                                      np.asarray(old)[..., 3])
        # attributes: the fixture-mesh test holds 1 ulp on axis-aligned
        # geometry; the random soup's steep color/normal gradients expose
        # a few ~5-ulp FMA-contraction differences between the two
        # separately-fused programs (0.07% of elements) — still pure
        # rounding, the depth/background bit above stays exact
        np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                                   atol=1e-6)
