import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.models import NETWORKS, apply
from pose3d_tpu.ops.knn import knn_hamming
from pose3d_tpu.train.solver import Solver

from test_dataset import _cached_device_data


def test_binarize_trains_head_and_freezes_trunk(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    cfg2 = dataclasses.replace(cfg, output_path=str(tmp_path) + "/",
                               net_name="manifold_rgbdnor_16",
                               binarization_epochs=1, random_background=0)
    solver = Solver(cfg2, data)
    solver.epoch_iter = 3
    trunk_state = solver.init_state()

    state = solver.binarize(trunk_state)
    bin_spec = NETWORKS[cfg2.binarization_net_name]

    # trunk params copied and frozen (unchanged by training)
    for name in ("conv1", "conv2", "fc1", "fc2"):
        np.testing.assert_array_equal(
            np.asarray(state["params"][name]["w"]),
            np.asarray(trunk_state["params"][name]["w"]))

    # head produces 128-bit logits; binary codes retrieve sanely
    flat = data.tmpl_patches.reshape((-1,) + data.tmpl_patches.shape[2:])
    logits = apply(state["params"], bin_spec, flat[:32], bin_head=True)
    assert logits.shape == (32, 128)
    codes = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    d, idx = knn_hamming(codes[:8], codes, k=1)
    # each code's nearest neighbor is itself (distance 0)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(8))
    np.testing.assert_allclose(np.asarray(d[:, 0]), 0.0)

    # snapshot written under the binarization net name
    import os
    assert any(f.startswith(cfg2.binarization_net_name)
               for f in os.listdir(tmp_path))


def test_binarize_rejects_channel_mismatch(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    cfg2 = dataclasses.replace(cfg, net_name="manifold_rgbd_16",
                               binarization_epochs=1)
    solver = Solver(cfg2, data)
    import pytest
    with pytest.raises(ValueError, match="input channels"):
        solver.binarize(solver.init_state())


def test_bin_head_params_change_during_binarize(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    cfg2 = dataclasses.replace(cfg, output_path="",
                               net_name="manifold_rgbdnor_16",
                               binarization_epochs=1, random_background=0)
    solver = Solver(cfg2, data)
    solver.epoch_iter = 3
    trunk_state = solver.init_state()
    state = solver.binarize(trunk_state)
    # the head must have moved away from its init
    from pose3d_tpu.models import init_params
    init_head = init_params(jax.random.key(cfg2.seed + 1),
                            NETWORKS[cfg2.binarization_net_name])
    assert not np.allclose(np.asarray(state["params"]["bin_fc1"]["w"]),
                           np.asarray(init_head["bin_fc1"]["w"]))

def test_with_extra_train_concat_and_resim(monkeypatch):
    """with_extra_train appends along the pose axis and recomputes the
    top-2 similar-template table over the union; appending copies of
    existing training poses must reproduce their original table rows."""
    from pose3d_tpu.data.dataset import with_extra_train
    data, cfg = _cached_device_data(monkeypatch)
    ntr = data.nr_training_poses
    aug = with_extra_train(data, data.train_patches[:, :3],
                           data.train_labels[:, :3])
    assert aug.train_patches.shape[1] == ntr + 3
    assert aug.train_patches.dtype == data.train_patches.dtype
    assert aug.max_sim_tmpl.shape == (data.nr_objects, ntr + 3, 2)
    # original rows unchanged; duplicated rows match their originals
    np.testing.assert_array_equal(np.asarray(aug.max_sim_tmpl[:, :ntr]),
                                  np.asarray(data.max_sim_tmpl))
    np.testing.assert_array_equal(np.asarray(aug.max_sim_tmpl[:, ntr:]),
                                  np.asarray(data.max_sim_tmpl[:, :3]))
    # everything else untouched
    assert aug.tmpl_patches is data.tmpl_patches
    assert aug.test_patches is data.test_patches
    assert aug.elev_ok is data.elev_ok
    assert aug.hard_negs is data.hard_negs


def test_binarize_data_override_scales_epoch(tmp_path, monkeypatch):
    """binarize(data=...) trains the head on the override set with the
    epoch length rescaled to cover every anchor of the larger grid."""
    from pose3d_tpu.data.dataset import with_extra_train
    data, cfg = _cached_device_data(monkeypatch)
    cfg2 = dataclasses.replace(cfg, output_path="",
                               net_name="manifold_rgbdnor_16",
                               binarization_epochs=1, random_background=0)
    solver = Solver(cfg2, data)
    aug = with_extra_train(data, data.train_patches,
                           data.train_labels)
    state = solver.binarize(solver.init_state(), data=aug)
    expect = max(1, (aug.nr_objects * aug.nr_training_poses)
                 // solver.groups)
    assert int(state["iter"]) == expect
    from pose3d_tpu.models import init_params
    init_head = init_params(jax.random.key(cfg2.seed + 1),
                            NETWORKS[cfg2.binarization_net_name])
    assert not np.allclose(np.asarray(state["params"]["bin_fc1"]["w"]),
                           np.asarray(init_head["bin_fc1"]["w"]))


def test_binarize_epoch_scan_iter_count_and_loss(tmp_path, monkeypatch):
    """binarize runs as ONE device program per epoch (lax.scan): the state
    iter counter must advance by epoch_iter per epoch and the mean epoch
    loss must be finite."""
    data, cfg = _cached_device_data(monkeypatch)
    cfg2 = dataclasses.replace(cfg, output_path="",
                               net_name="manifold_rgbdnor_16",
                               binarization_epochs=2, random_background=0)
    solver = Solver(cfg2, data)
    solver.epoch_iter = 3
    state = solver.binarize(solver.init_state())
    assert int(state["iter"]) == 3 * 2
    assert np.isfinite(solver.last_binarize_loss)
