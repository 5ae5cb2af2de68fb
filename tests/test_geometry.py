import numpy as np
import jax.numpy as jnp

from pose3d_tpu.ops import geometry as G


def reference_depth2normals(dep, fx, fy):
    """Direct NumPy transcription of the reference scalar loop
    (reference src/helper.cpp:53-103) used as the golden model."""
    H, W = dep.shape
    nor = np.zeros((H, W, 3), np.float32)
    N = 3
    for r in range(N, H - N - 1):
        for c in range(N, W - N - 1):
            d = dep[r, c]
            if d <= 0:
                continue
            A = np.zeros(4, np.float32)
            b = np.zeros(2, np.float32)
            for i in (-N, 0, N):
                for j in (-N, 0, N):
                    delta = dep[r + j, c + i] - d
                    f = float(abs(delta) < 0.05)
                    A[0] += f * i * i
                    A[1] += f * i * j
                    A[3] += f * j * j
                    b[0] += f * i * delta
                    b[1] += f * j * delta
            n = np.array([(A[3] * b[0] - A[1] * b[1]) * fx,
                          (-A[1] * b[0] + A[0] * b[1]) * fy,
                          (A[0] * A[3] - A[1] * A[1]) * d], np.float32)
            sq = float(n @ n)
            if sq > 0:
                nor[r, c] = n / np.sqrt(sq)
    return nor


def _synthetic_depth(H=32, W=40, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dep = 0.6 + 0.002 * xx + 0.001 * yy
    dep += rng.normal(0, 0.0005, size=dep.shape)
    # holes and a discontinuity step
    dep[10:14, 5:9] = 0.0
    dep[:, 25:] += 0.5
    return dep.astype(np.float32)


def test_depth2normals_matches_reference_loop():
    dep = _synthetic_depth()
    fx, fy = 572.4114, 573.5704
    want = reference_depth2normals(dep, fx, fy)
    got = np.asarray(G.depth2normals(jnp.asarray(dep), fx, fy))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_depth2normals_border_and_holes_are_zero():
    dep = _synthetic_depth()
    got = np.asarray(G.depth2normals(jnp.asarray(dep), 500.0, 500.0))
    assert np.all(got[:3] == 0)
    assert np.all(got[-4:] == 0)
    assert np.all(got[:, :3] == 0)
    assert np.all(got[:, -4:] == 0)
    assert np.all(got[11, 6] == 0)  # hole pixel


def test_depth2normals_flat_plane_points_to_camera():
    dep = np.full((32, 32), 0.7, np.float32)
    got = np.asarray(G.depth2normals(jnp.asarray(dep), 500.0, 500.0))
    inner = got[4:-5, 4:-5]
    # flat, facing the camera: n = (0, 0, +-1); reference convention keeps
    # det(A)*d > 0 so nz is positive
    np.testing.assert_allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)
    np.testing.assert_allclose(inner[..., 0], 0.0, atol=1e-5)


def test_depth2normals_at_bit_identical_to_full():
    """The sparse tap-subgrid fit must equal indexing the full-window
    normal map BITWISE (the production slot-sparse patch path relies on
    it), including border/hole/discontinuity pixels and repeated indices
    (bilinear floor/floor+1 taps can coincide)."""
    dep = jnp.asarray(_synthetic_depth())
    fx, fy = 572.4114, 573.5704
    full = np.asarray(G.depth2normals(dep, fx, fy))
    ys = jnp.asarray(np.array([0, 2, 3, 9, 10, 11, 12, 13, 13, 27, 31]))
    xs = jnp.asarray(np.array([0, 3, 4, 5, 6, 24, 25, 26, 26, 36, 39]))
    got = np.asarray(G.depth2normals_at(dep, ys, xs, fx, fy))
    want = full[np.asarray(ys)][:, np.asarray(xs)]
    np.testing.assert_array_equal(got, want)


def test_depth2cloud():
    dep = _synthetic_depth(8, 8)
    fx = fy = 100.0
    ox = oy = 4.0
    cloud = np.asarray(G.depth2cloud(jnp.asarray(dep), fx, fy, ox, oy))
    r, c = 5, 6
    z = dep[r, c]
    np.testing.assert_allclose(cloud[r, c],
                               [(c - ox) / fx * z, (r - oy) / fy * z, z],
                               rtol=1e-6)


def test_project_invert():
    K = jnp.asarray([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]])
    pts = jnp.asarray([[0.1, -0.05, 0.6], [0.0, 0.0, 1.0]])
    uv = np.asarray(G.project(pts, K))
    np.testing.assert_allclose(uv[1], [320, 240], atol=1e-5)
    want = np.float32(500) * np.float32(0.1) / np.float32(0.6) + 320
    np.testing.assert_allclose(uv[0, 0], want, rtol=1e-3)


def test_invert_isometry():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    from pose3d_tpu.ops.quaternion import matrix_from_quat
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(matrix_from_quat(jnp.asarray(q)))
    T[:3, 3] = [0.1, -0.2, 0.5]
    Ti = np.asarray(G.invert_isometry(jnp.asarray(T)))
    np.testing.assert_allclose(Ti @ T, np.eye(4), atol=1e-6)
