import numpy as np
import jax.numpy as jnp

from pose3d_tpu.ops import quaternion as Q


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    # Random unit quaternions -> rotation matrices (uniform over SO(3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def test_quat_matrix_roundtrip():
    q = random_rotations(64)
    R = np.asarray(Q.matrix_from_quat(jnp.asarray(q)))
    # orthonormality
    ident = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape),
                               atol=1e-5)
    q2 = np.asarray(Q.quat_from_matrix(jnp.asarray(R)))
    # double cover: compare up to sign
    dots = np.abs(np.sum(q * q2, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_angular_distance_matches_eigen_definition():
    q = random_rotations(32, seed=1)
    p = random_rotations(32, seed=2)
    got = np.asarray(Q.angular_distance(jnp.asarray(q), jnp.asarray(p)))
    # Eigen: 2*atan2(|vec(d)|, |w(d)|), d = q * conj(p)
    d = np.asarray(Q.quat_mul(jnp.asarray(q), Q.quat_conj(jnp.asarray(p))))
    want = 2.0 * np.arctan2(np.linalg.norm(d[:, :3], axis=1),
                            np.abs(d[:, 3]))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.all(got >= 0) and np.all(got <= np.pi + 1e-6)


def test_pairwise_matches_elementwise():
    qa = random_rotations(10, seed=3)
    qb = random_rotations(7, seed=4)
    D = np.asarray(Q.pairwise_angular_distance(jnp.asarray(qa),
                                               jnp.asarray(qb)))
    for i in range(10):
        for j in range(7):
            d = float(Q.angular_distance(jnp.asarray(qa[i]),
                                         jnp.asarray(qb[j])))
            assert abs(D[i, j] - d) < 1e-5


def test_elevation_matches_rotation_matrix():
    q = random_rotations(50, seed=5)
    R = np.asarray(Q.matrix_from_quat(jnp.asarray(q)))
    want = np.arccos(np.clip(R[:, 2, 2], -1, 1))
    got = np.asarray(Q.elevation(jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_top2_similar_excludes_equal_distance():
    # identical quats at idx 0 and 3: second-best must skip the duplicate of
    # the best, matching the reference's `temp_dist == best_dist` exclusion
    base = random_rotations(4, seed=6)
    tmpl = np.stack([base[0], base[1], base[2], base[0]])
    train = base[0:1]
    idx = np.asarray(Q.top2_similar_templates(jnp.asarray(train),
                                              jnp.asarray(tmpl)))
    assert idx[0, 0] == 0
    assert idx[0, 1] not in (0, 3)


def test_top2_similar_all_matches_per_object_loop():
    """The batched (one-dispatch) variants must reproduce the per-object
    calls exactly — dataset assembly uses them over the O axis."""
    rng = np.random.default_rng(8)
    train_q = np.stack([random_rotations(6, seed=10 + o) for o in range(3)])
    tmpl_q = np.stack([random_rotations(9, seed=20 + o) for o in range(3)])
    got = np.asarray(Q.top2_similar_templates_all(jnp.asarray(train_q),
                                                  jnp.asarray(tmpl_q)))
    want = np.stack([np.asarray(Q.top2_similar_templates(
        jnp.asarray(train_q[o]), jnp.asarray(tmpl_q[o])))
        for o in range(3)])
    np.testing.assert_array_equal(got, want)

    train_t = rng.normal(size=(3, 6, 3)).astype(np.float32)
    tmpl_t = rng.normal(size=(3, 9, 3)).astype(np.float32)
    got_t = np.asarray(Q.top2_similar_templates_trans_all(
        jnp.asarray(train_t), jnp.asarray(tmpl_t)))
    want_t = np.stack([np.asarray(Q.top2_similar_templates_trans(
        jnp.asarray(train_t[o]), jnp.asarray(tmpl_t[o])))
        for o in range(3)])
    np.testing.assert_array_equal(got_t, want_t)


def test_nearest_template():
    tmpl = random_rotations(20, seed=7)
    train = tmpl[[3, 11, 19]]
    idx = np.asarray(Q.nearest_template(jnp.asarray(train), jnp.asarray(tmpl)))
    np.testing.assert_array_equal(idx, [3, 11, 19])
