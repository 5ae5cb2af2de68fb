"""Tests for the Paul (el/az) synthetic sampling path
(createSynthSamplesPaul, reference src/datasetmanager.cpp:425-496)."""

import numpy as np
import pytest

from pose3d_tpu.data.dataset import create_synth_samples_paul
from pose3d_tpu.render import make_test_mesh

K = np.array([[120.0, 0.0, 48.0], [0.0, 120.0, 48.0], [0.0, 0.0, 1.0]],
             np.float32)


def _write_positions(tmp_path, n=12):
    d = tmp_path / "paul"
    d.mkdir()
    rng = np.random.default_rng(0)
    el = rng.uniform(0, np.pi / 2, n)
    az = rng.uniform(0, 2 * np.pi, n)
    np.savetxt(d / "camPositionsElAz.txt", np.stack([el, az], axis=1))
    return el, az


def test_paul_samples_from_elaz_file(tmp_path):
    el, az = _write_positions(tmp_path)
    mesh = make_test_mesh("cube", 0.12)
    ss = create_synth_samples_paul(mesh, K, 3, str(tmp_path), "LineMOD")
    assert ss.patches.shape == (12, 64, 64, 7)
    assert (ss.labels[:, 0] == 3).all()
    # LineMOD z = 0.4: inverse translation magnitude == 0.4
    t = ss.labels[:, 5:8]
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 0.4, atol=1e-5)
    # object visible in every view (cube at 0.4 m fills part of the crop)
    fg = (ss.patches[..., 3] > 0).mean(axis=(1, 2))
    assert (fg > 0.05).all()
    # distinct elevations give distinct patches
    assert not np.allclose(ss.patches[0], ss.patches[1])


def test_paul_rotation_construction(tmp_path):
    # el=0, az=0 -> camRot0 = Rx(pi/2): camera on the equator looking at the
    # object; poses must be valid rotations with z=0.4 translation
    d = tmp_path / "paul"
    d.mkdir()
    np.savetxt(d / "camPositionsElAz.txt", [[0.0, 0.0], [0.5, 1.0]])
    mesh = make_test_mesh("tetra", 0.1)
    ss = create_synth_samples_paul(mesh, K, 0, str(tmp_path), "LineMOD")
    q = ss.labels[:, 1:5]
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    assert not np.allclose(q[0], q[1])
