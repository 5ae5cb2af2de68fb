import numpy as np

from pose3d_tpu.ops import sphere as S


def test_icosphere_vertex_counts():
    # Invariants from the reference pipeline: subdiv 2 -> 162 verts (template
    # sphere), subdiv 3 -> 642 (training sphere); 0 -> 12, 1 -> 42.
    assert len(S.icosphere(0)) == 12
    assert len(S.icosphere(1)) == 42
    assert len(S.icosphere(2)) == 162
    assert len(S.icosphere(3)) == 642


def test_icosphere_unit_norm_and_unique():
    v = S.icosphere(2)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-6)
    # pairwise min angle > 0 (no duplicate vertices)
    dots = np.clip(v @ v.T, -1, 1)
    np.fill_diagonal(dots, -1)
    assert np.max(dots) < 1.0 - 1e-9


def test_elaz_sphere_count():
    pts = S.elaz_sphere(4, 6)
    # pole + (inc_steps-1) * azi_steps
    assert len(pts) == 1 + 3 * 6
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(pts[0], [0, 0, 1], atol=1e-7)


def test_lookat_is_rotation_and_looks_at_origin():
    eyes = S.icosphere(1)
    R = S.lookat_rotation(eyes)
    ident = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape),
                               atol=1e-5)
    # world->cam: the eye direction must map to +z (camera looks down -eye)
    mapped = np.einsum("nij,nj->ni", R, -eyes)
    np.testing.assert_allclose(mapped[:, 0], 0, atol=1e-5)
    np.testing.assert_allclose(mapped[:, 1], 0, atol=1e-5)
    np.testing.assert_allclose(mapped[:, 2], 1, atol=1e-5)


def test_lookat_pole_special_case():
    R = S.lookat_rotation(np.array([0.0, 0.0, 1.0]))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.isfinite(R).all()


def test_create_view_poses_counts_and_structure():
    poses, verts = S.create_view_poses(1, (0.4, 1.1, 1.0), (-45, 15, 45), True)
    sphere = S.icosphere(1)
    n_upper = int(np.sum(sphere[:, 2] >= 0))
    n_rots = 7  # -45,-30,...,45
    assert poses.shape == (n_upper * n_rots, 4, 4)
    assert verts.shape == (n_upper * n_rots, 3)
    # translation is (0, 0, scale)
    np.testing.assert_allclose(poses[:, :3, 3],
                               np.tile([0, 0, 0.4], (len(poses), 1)),
                               atol=1e-6)
    # rotations are orthonormal
    R = poses[:, :3, :3]
    ident = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape),
                               atol=1e-5)


def test_view_pose_composition():
    # pose.linear() = Rz(angle) @ lookat(vertex)  (reference sphere.cpp:27-34)
    poses, verts = S.create_view_poses(0, (0.5, 1.0, 0.5), (30, 15, 30), False)
    look = S.lookat_rotation(verts[0])
    rz = S.inplane_rotz(np.array(30.0))
    np.testing.assert_allclose(poses[0, :3, :3], rz @ look, atol=1e-5)
