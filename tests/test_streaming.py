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
    src.train.close()
    src.templates.close()


def test_streaming_full_loop_parity(tmp_path, monkeypatch):
    """The reference loop shape on the streaming path: training +
    bootstrapping rounds, epoch-granular TSV logs, snapshot + resume with
    kNN recomputation — matching the resident Solver's protocol
    (reference src/networksolver.cpp:261-392)."""
    import os
    data, cfg = _cached_device_data(monkeypatch)
    src = _make_sources(tmp_path, data)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv))
    out = tmp_path / "out"
    cfg2 = dataclasses.replace(cfg, random_background=1, batch_size=20,
                               num_training_rounds=1,
                               num_bootstrapping_rounds=1, num_epochs=1,
                               output_path=str(out), log_epoch=1)
    solver = StreamingSolver(cfg2, src, tables)
    solver.epoch_iter = 3
    state = solver.train()
    # two rounds x 3 iters; second round ran bootstrapped (kNN mined)
    assert int(state["iter"]) == 6
    assert solver.knn_tables is not None
    assert solver.knn_tables[0].shape == (data.nr_objects,
                                          data.nr_training_poses, 4)

    # reference-format logs were written every epoch
    files = os.listdir(out)
    assert any(f.startswith("log") for f in files), files
    assert any(f.startswith("cm") for f in files), files
    log_file = [f for f in files if f.startswith("log")][0]
    lines = (out / log_file).read_text().strip().splitlines()
    assert len(lines) >= 3          # header + 2 epochs x (test+train rows)

    # snapshot written with Caffe naming; resume restores + re-mines kNN
    snaps = [f for f in files if f.endswith(".ckpt")]
    assert snaps, files
    solver2 = StreamingSolver(cfg2, src, tables)
    state2 = solver2.train(resume_iter=6)
    assert solver2.knn_tables is not None
    assert int(state2["iter"]) >= 6
    src.train.close()
    src.templates.close()


def test_streaming_dp_sharded(tmp_path, monkeypatch):
    """Streaming step with the batch sharded over the 8-device mesh:
    prefetcher transfers into the dp layout, params stay replicated."""
    import jax
    from pose3d_tpu.parallel.mesh import make_mesh
    data, cfg = _cached_device_data(monkeypatch)
    src = _make_sources(tmp_path, data)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv))
    cfg2 = dataclasses.replace(cfg, random_background=1, batch_size=40,
                               num_training_rounds=1, num_epochs=1)
    solver = StreamingSolver(cfg2, src, tables, mesh=make_mesh(8))
    solver.epoch_iter = 3
    state = solver.train(num_epochs=1)
    assert int(state["iter"]) == 3
    assert np.isfinite(
        float(np.abs(np.asarray(state["params"]["fc2"]["w"])).sum()))
    src.train.close()
    src.templates.close()


def test_streaming_hard_negative_override(tmp_path, monkeypatch):
    """Parity with the reference's negs_<model>.h5 override
    (src/networksolver.cpp:96-101): when a negatives source exists, every
    group's pusher0 must be a hard negative, not a template."""
    data, cfg = _cached_device_data(monkeypatch)
    src = _make_sources(tmp_path, data)
    O = data.nr_objects
    M = 3
    # distinctive per-object, per-slot negative patches
    negs = np.zeros((O * M, 64, 64, 7), np.float32)
    for o in range(O):
        for m in range(M):
            negs[o * M + m] = 100.0 * o + m + 7.0
    nc.write_cache(str(tmp_path / "negs.p3dcache"), negs,
                   np.zeros((O * M, 8), np.float32))
    src = dataclasses.replace(
        src, negatives=nc.NativeCache(str(tmp_path / "negs.p3dcache")),
        max_negatives=M)
    counts = np.full((O,), M, np.int64)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv), hard_neg_count=counts)
    np.testing.assert_array_equal(np.asarray(tables.hard_neg_count), counts)
    cfg2 = dataclasses.replace(cfg, random_background=0, batch_size=20)
    solver = StreamingSolver(cfg2, src, tables)

    ix_dev = epoch_indices(jax.random.key(0), 2, solver.groups, tables)
    ix = {k: np.asarray(v) for k, v in ix_dev.items()}
    assert ix["pusher0_is_neg"].all()
    batch = solver._host_batch(ix, 0).reshape(4, 5, 64, 64, 7)
    for k in range(4):
        obj = ix["obj"][0][k]
        want = 100.0 * obj + ix["neg_idx"][0][k] + 7.0
        np.testing.assert_allclose(batch[k, 2], want, atol=1e-6)
    src.train.close()
    src.templates.close()
    src.negatives.close()


def test_streamed_descriptor_rows_match_full(tmp_path, monkeypatch):
    """streamed_descriptors_rows on an arbitrary subset (with padding in
    the last chunk) must equal the corresponding rows of the full
    streamed pass — the wang flagship's query/pair-confusion evals gather
    this way."""
    data, cfg = _cached_device_data(monkeypatch)
    src = _make_sources(tmp_path, data)
    tables = light_tables(np.asarray(data.train_labels),
                          np.asarray(data.tmpl_labels),
                          np.asarray(data.rot_inv))
    solver = StreamingSolver(cfg, src, tables)
    params = solver.init_state()["params"]
    n = src.nr_objects * src.nr_training_poses
    full = np.asarray(
        solver.streamed_descriptors(params, src.train, n, chunk=8))
    rows = np.array([1, 0, n - 1, 5, 3])
    sub = np.asarray(solver.streamed_descriptors_rows(
        params, src.train, rows, chunk=4))
    np.testing.assert_allclose(sub, full[rows], atol=1e-5)
    src.train.close()
    src.templates.close()
