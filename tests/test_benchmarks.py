"""Format-fixture tests for the BigBIRD and Washington benchmark loaders.

Round 1 shipped both loaders as transcriptions of the reference
(src/datasetmanager.cpp:59-151) but without fixtures; these tests build
synthetic directories in the exact on-disk formats and pin the loader
behavior: BigBIRD's averaged-then-halved intrinsics
(src/hdf5handler.cpp:300-371), the H_NP<c>_from_NP5 @ inv(
H_table_from_reference_camera) pose composition, the 0.1 mm depth scale and
1/5-scale inpainting of zero holes (src/datasetmanager.cpp:92-98), and
Washington's 17-column poses.txt + %06d file naming + mm depth
(src/datasetmanager.cpp:113-151).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from pose3d_tpu.data.benchmarks import (LINEMOD_K, load_bigbird,
                                        load_washington)


def _rot_z(deg):
    a = np.deg2rad(deg)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = np.cos(a)
    m[0, 1] = -np.sin(a)
    m[1, 0] = np.sin(a)
    return m


@pytest.fixture
def bigbird_dir(tmp_path):
    """A minimal BigBIRD object directory: calibration.h5, poses/, and the
    NP<cam>_<step> turntable images for steps 0 and 3."""
    d = tmp_path / "detergent"
    (d / "poses").mkdir(parents=True)

    # five per-camera K matrices around the LineMOD values, five extrinsics
    Ks = [LINEMOD_K + np.float32(c) for c in range(5)]
    trans = [_rot_z(10.0 * (c + 1)) for c in range(5)]
    with h5py.File(d / "calibration.h5", "w") as f:
        for c in range(1, 6):
            f.create_dataset(f"NP{c}_rgb_K", data=Ks[c - 1])
            f.create_dataset(f"H_NP{c}_from_NP5", data=trans[c - 1])

    rng = np.random.default_rng(0)
    steps = (0, 3)
    for i in steps:
        with h5py.File(d / "poses" / f"NP5_{i}_pose.h5", "w") as f:
            f.create_dataset("H_table_from_reference_camera",
                             data=_rot_z(float(i)))
            f.create_dataset("board_frame_offset",
                             data=np.zeros(3, np.float32))
    for c in range(1, 6):
        for i in steps:
            color = rng.integers(0, 255, (48, 64, 3), np.uint8)
            cv2.imwrite(str(d / f"NP{c}_{i}.jpg"), color)
            # u16 depth in 0.1 mm; a zero hole to exercise the inpainting
            depth = np.full((48, 64), 6000, np.uint16)    # 0.6 m
            depth[10:14, 20:24] = 0
            cv2.imwrite(str(d / f"NP{c}_{i}.png"), depth)
    return tmp_path, "detergent", Ks, trans, steps


def test_bigbird_loader(bigbird_dir):
    root, seq, Ks, trans, steps = bigbird_dir
    bench = load_bigbird(str(root), seq)

    # intrinsics: mean of the five NP<k>_rgb_K halved, [2,2] forced to 1
    want_cam = np.mean(Ks, axis=0) * 0.5
    want_cam[2, 2] = 1.0
    np.testing.assert_allclose(bench.cam, want_cam, rtol=1e-6)

    # 5 cameras x len(steps) present images, camera-major order
    assert len(bench.frames) == 5 * len(steps)
    nrs = [f.nr for f in bench.frames]
    assert nrs == [i * c for c in range(1, 6) for i in steps]

    # pose = H_NP<c>_from_NP5 @ inv(H_table_from_reference_camera)
    for k, (c, i) in enumerate((c, i) for c in range(1, 6) for i in steps):
        want = trans[c - 1] @ np.linalg.inv(_rot_z(float(i)))
        np.testing.assert_allclose(bench.frames[k].pose, want, atol=1e-5)

    f0 = bench.frames[0]
    assert f0.color.shape == (48, 64, 3) and f0.color.dtype == np.uint8
    # depth: u16 * 1e-4 -> meters
    assert f0.depth.dtype == np.float32
    np.testing.assert_allclose(f0.depth[0, 0], 0.6, atol=1e-6)
    # the zero hole must be inpainted (nonzero, near the surrounding 0.6 m;
    # the 8-bit round trip quantizes to ~1/255)
    hole = f0.depth[10:14, 20:24]
    assert (hole > 0).all()
    assert np.abs(hole - 0.6).max() < 0.05


def test_bigbird_skips_missing_cameras(bigbird_dir, tmp_path):
    root, seq, *_ = bigbird_dir
    # removing one camera's images simply drops those frames
    for i in (0, 3):
        os.remove(os.path.join(str(root), seq, f"NP2_{i}.jpg"))
    bench = load_bigbird(str(root), seq)
    assert len(bench.frames) == 4 * 2


@pytest.fixture
def washington_dir(tmp_path):
    d = tmp_path / "bowl_1"
    d.mkdir()
    rng = np.random.default_rng(1)
    poses = []
    rows = []
    for nr in (2, 5, 9):                      # non-contiguous frame numbers
        pose = _rot_z(float(nr) * 7.0)
        pose[:3, 3] = [0.01 * nr, -0.02 * nr, 0.9]
        poses.append((nr, pose))
        rows.append([float(nr)] + list(pose.reshape(-1)))
        color = rng.integers(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(str(d / f"color_{nr:06d}.png"), color)
        depth = np.full((48, 64), 900, np.uint16)          # 0.9 m in mm
        cv2.imwrite(str(d / f"depth_{nr:06d}.png"), depth)
    # the reference reads "num >> 16 floats" repeatedly from one stream —
    # any whitespace layout works; one 17-column row per frame
    np.savetxt(str(d / "poses.txt"), np.asarray(rows, np.float32))
    return tmp_path, "bowl_1", poses


def test_washington_loader(washington_dir):
    root, seq, poses = washington_dir
    bench = load_washington(str(root), seq)
    np.testing.assert_allclose(bench.cam, LINEMOD_K)
    assert [f.nr for f in bench.frames] == [nr for nr, _ in poses]
    for frame, (nr, pose) in zip(bench.frames, poses):
        np.testing.assert_allclose(frame.pose, pose, atol=1e-5)
        assert frame.color.shape == (48, 64, 3)
        np.testing.assert_allclose(frame.depth, 0.9, atol=1e-6)


def test_washington_count_truncates(washington_dir):
    root, seq, poses = washington_dir
    bench = load_washington(str(root), seq, count=1)
    assert len(bench.frames) == 2       # reference-style "> count" cutoff
