"""Tests for the long-tail parity components: Benjamin loader, Wadim
extractor, class batcher, TF-layout caches, mesh utilities, flood fill,
viz dumps, signal checkpointing."""

import os
import signal
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.data import hdf5cache
from pose3d_tpu.data.benchmarks import read_raw_depth
from pose3d_tpu.ops.geometry import grow_foreground
from pose3d_tpu.render import make_test_mesh
from pose3d_tpu.render.mesh import (edge_points, mesh_resolution,
                                    subsample_cloud)
from pose3d_tpu.utils import viz

from test_dataset import _cached_device_data


def test_raw_depth_reader(tmp_path):
    depth_mm = np.arange(12, dtype=np.uint16).reshape(3, 4)
    p = tmp_path / "f_depth.raw"
    with open(p, "wb") as f:
        f.write(np.array([3, 4], np.uint16).tobytes())
        f.write(depth_mm.tobytes())
    d = read_raw_depth(str(p))
    assert d.shape == (3, 4)
    np.testing.assert_allclose(d, depth_mm * 0.001, rtol=1e-6)


def test_benjamin_loader(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "obj"
    d.mkdir()
    img = np.random.default_rng(0).integers(0, 255, (32, 40, 3),
                                            dtype=np.uint8)
    cv2.imwrite(str(d / "0001_color.png"), img)
    with open(d / "0001_depth.raw", "wb") as f:
        f.write(np.array([32, 40], np.uint16).tobytes())
        f.write(np.full(32 * 40, 500, np.uint16).tobytes())
    np.savetxt(d / "0001_pose.txt", np.eye(4))
    from pose3d_tpu.data.benchmarks import load_benjamin
    bench = load_benjamin(str(tmp_path), "obj")
    assert len(bench.frames) == 1
    fr = bench.frames[0]
    assert fr.depth.shape == (32, 40)
    np.testing.assert_allclose(fr.depth, 0.5)
    # translation overridden to (0,0,1) per the reference
    np.testing.assert_allclose(fr.pose[:3, 3], [0, 0, 1])


def test_tf_layout_cache(tmp_path):
    rng = np.random.default_rng(1)
    patches = rng.random((4, 64, 64, 7)).astype(np.float32)
    labels = rng.random((4, 8)).astype(np.float32)
    p = str(tmp_path / "tf.h5")
    hdf5cache.write_samples_tf(p, patches, labels)
    import h5py
    with h5py.File(p, "r") as f:
        assert f["data"].shape == (4, 64, 64, 7)   # NHWC on disk
    rp, rl = hdf5cache.read_samples_tf(p)
    np.testing.assert_allclose(rp, patches)
    np.testing.assert_allclose(rl, labels)


def test_subsample_cloud():
    pts = np.array([[0.0, 0, 0], [0.001, 0, 0], [0.5, 0.5, 0.5],
                    [0.002, 0.001, 0]], np.float32)
    out = subsample_cloud(pts, leaf=0.1)
    assert len(out) == 2
    np.testing.assert_allclose(out[0], pts[0])


def test_mesh_resolution_and_edges():
    cube = make_test_mesh("cube", 0.1)
    res = mesh_resolution(cube)
    assert 0.05 < res < 0.2      # edges are 0.1 or 0.1*sqrt(2)
    # every cube vertex sits on 90-degree edges
    ep = edge_points(cube, angle_deg=30.0)
    assert len(ep) == 8


def test_grow_foreground():
    depth = np.full((24, 24), 0.6, np.float32)
    depth[:, 12:] = 1.0          # far wall: disconnected by depth jump
    depth[5, 5] = 0.0            # hole never joins
    mask = np.asarray(grow_foreground(jnp.asarray(depth), (12, 3)))
    assert mask[12, 3]
    assert mask[0, 0]            # same surface, connected
    assert not mask[12, 20]      # beyond the depth discontinuity
    assert not mask[5, 5]        # zero-depth hole excluded


def test_viz_dumps(tmp_path):
    rng = np.random.default_rng(0)
    patch = rng.random((64, 64, 7)).astype(np.float32)
    strip = viz.patch_to_image(patch)
    assert strip.shape == (64, 192, 3) and strip.dtype == np.uint8
    panel = viz.knn_panel(patch, [patch, patch],
                          out_path=str(tmp_path / "knn.png"))
    assert panel.shape == (3 * 64, 192, 3)
    assert os.path.exists(tmp_path / "knn.png")
    viz.manifold_to_ply(str(tmp_path / "m.ply"),
                        rng.normal(size=(10, 3)),
                        labels=np.arange(10) % 3)
    from pose3d_tpu.render import load_mesh
    cloud = load_mesh(str(tmp_path / "m.ply"))
    assert cloud.vertices.shape == (10, 3)


def test_build_batch_class(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    from pose3d_tpu.data.batcher import build_batch_class, class_batch_indices
    batch = build_batch_class(jax.random.key(0), jnp.int32(0), 6, data,
                              random_background=1)
    assert batch.shape == (30, 64, 64, 7)
    ix = class_batch_indices(jax.random.key(1), jnp.int32(0), 12, data)
    obj = np.asarray(ix["obj"])
    for k in range(3):
        assert (np.asarray(ix[f"pusher{k}_obj"]) != obj).all()


def test_extract_real_samples_wadim(tmp_path, monkeypatch):
    from fixtures import synthetic_benchmark
    from pose3d_tpu.data.dataset import extract_real_samples_wadim
    mesh = make_test_mesh("cube", 0.12)
    bench = synthetic_benchmark(mesh, n_frames=3)
    ss = extract_real_samples_wadim(bench, 1)
    assert ss.patches.shape == (3, 64, 64, 7)
    assert (ss.labels[:, 0] == 1).all()


def test_signal_checkpoint(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, output_path=str(tmp_path) + "/out/",
                               num_training_rounds=50, num_epochs=1,
                               log_epoch=1000, random_background=0)
    from pose3d_tpu.train.solver import Solver
    from pose3d_tpu.train import checkpoint
    solver = Solver(cfg2, data)
    solver.epoch_iter = 3

    def fire():
        time.sleep(3.0)
        signal.raise_signal(signal.SIGTERM)

    t = threading.Thread(target=fire)
    t.start()
    state = solver.train()
    t.join()
    found = checkpoint.latest(cfg2.output_path, cfg2.net_name)
    assert found is not None
    assert found[1] == int(state["iter"])
    assert found[1] < 50 * 3     # actually interrupted early
