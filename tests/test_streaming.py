import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.data import native_cache as nc
from pose3d_tpu.train.streaming import (StreamingSolver, StreamingSources,
                                        epoch_indices, light_tables)

from test_dataset import _cached_device_data


def _make_sources(tmp_path, data):
    O, Ntr = data.nr_objects, data.nr_training_poses
    T = data.nr_template_poses
    train_flat = np.asarray(data.train_patches).reshape(O * Ntr, 64, 64, 7)
    train_lab = np.asarray(data.train_labels).reshape(O * Ntr, 8)
    tmpl_flat = np.asarray(data.tmpl_patches).reshape(O * T, 64, 64, 7)
    tmpl_lab = np.asarray(data.tmpl_labels).reshape(O * T, 8)
    nc.write_cache(str(tmp_path / "train.p3dcache"), train_flat, train_lab)
    nc.write_cache(str(tmp_path / "tmpl.p3dcache"), tmpl_flat, tmpl_lab)
    return StreamingSources(
        train=nc.NativeCache(str(tmp_path / "train.p3dcache")),
        templates=nc.NativeCache(str(tmp_path / "tmpl.p3dcache")),
        nr_objects=O, nr_training_poses=Ntr, nr_template_poses=T)


def test_light_tables_match_resident(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv))
    np.testing.assert_array_equal(np.asarray(tables.max_sim_tmpl),
                                  np.asarray(data.max_sim_tmpl))
    np.testing.assert_array_equal(np.asarray(tables.elev_ok),
                                  np.asarray(data.elev_ok))


def test_streaming_batch_matches_resident_gather(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    src = _make_sources(tmp_path, data)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv))
    cfg2 = dataclasses.replace(cfg, random_background=0, batch_size=20)
    solver = StreamingSolver(cfg2, src, tables)

    ix_dev = epoch_indices(jax.random.key(0), 2, solver.groups, tables)
    ix = {k: np.asarray(v) for k, v in ix_dev.items()}
    batch = solver._host_batch(ix, 0)
    assert batch.shape == (20, 64, 64, 7)

    # group g row 0 == training[obj, pose]; row 1 == templates[obj, puller]
    g = batch.reshape(4, 5, 64, 64, 7)
    for k in range(4):
        obj, pose = ix["obj"][0][k], ix["pose"][0][k]
        np.testing.assert_allclose(
            g[k, 0], np.asarray(data.train_patches[obj, pose]), atol=1e-6)
        np.testing.assert_allclose(
            g[k, 1],
            np.asarray(data.tmpl_patches[obj, ix["puller"][0][k]]),
            atol=1e-6)

    src.train.close()
    src.templates.close()


def test_streaming_trains(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    src = _make_sources(tmp_path, data)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv))
    cfg2 = dataclasses.replace(cfg, random_background=1, batch_size=20,
                               num_training_rounds=1, num_epochs=1)
    solver = StreamingSolver(cfg2, src, tables)
    solver.epoch_iter = 4
    state = solver.train(num_epochs=2)
    assert int(state["iter"]) == 8
    assert np.isfinite(float(state["last_loss"]))
    src.train.close()
    src.templates.close()
