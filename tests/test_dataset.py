import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.data import hdf5cache
from pose3d_tpu.data.batcher import TRIPLET_SIZE, build_batch, epoch_iters

from fixtures import build_fixture_manager


def test_hdf5_cache_reference_layout(tmp_path):
    rng = np.random.default_rng(0)
    patches = rng.random((5, 64, 64, 7)).astype(np.float32)
    labels = rng.random((5, 8)).astype(np.float32)
    p = str(tmp_path / "samples.h5")
    hdf5cache.write_samples(p, patches, labels)

    # on-disk contract: CHW datasets named data/label
    import h5py
    with h5py.File(p, "r") as f:
        assert f["data"].shape == (5, 7, 64, 64)
        assert f["label"].shape == (5, 8)
        np.testing.assert_allclose(np.asarray(f["data"][0, 2]),
                                   patches[0, :, :, 2])

    rp, rl = hdf5cache.read_samples(p)
    np.testing.assert_allclose(rp, patches)
    np.testing.assert_allclose(rl, labels)


def test_dataset_manager_end_to_end(tmp_path, monkeypatch):
    from fixtures import fixture_db
    db, cfg = fixture_db(None, monkeypatch)
    tmp_path = __import__("pathlib").Path(cfg.hdf5_path).parent

    assert len(db.training_set) == 2
    assert len(db.template_set) == 2
    n_tr = len(db.training_set[0])
    assert all(len(s) == n_tr for s in db.training_set)   # cropped to min
    n_te = len(db.test_set[0])
    assert all(len(s) == n_te for s in db.test_set)
    assert n_tr > 0
    # the fixture pairs real frames per template bucket precisely so the
    # ceil-half split yields a non-empty test set — an empty split silently
    # zeroes every eval metric downstream, so fail loudly here
    assert n_te > 0

    # caches were written with reference names and are reused on reload
    import os
    assert os.path.exists(os.path.join(cfg.hdf5_path, "realSamples_cube.h5"))
    assert os.path.exists(os.path.join(cfg.hdf5_path, "templates_tetra.h5"))
    # a fresh manager on the same cache dir skips generation entirely (no
    # loaders/meshes needed) and reproduces the same sets
    from pose3d_tpu.data.dataset import DatasetManager
    db2 = DatasetManager(cfg)
    db2.generate_datasets()
    assert len(db2.training_set[0]) == n_tr

    # labels carry the right class indices
    assert set(np.unique(db.training_set[0].labels[:, 0])) == {0.0}
    assert set(np.unique(db.training_set[1].labels[:, 0])) == {1.0}


def _cached_device_data(monkeypatch):
    from fixtures import fixture_db, _DB_CACHE
    db, cfg = fixture_db(None, monkeypatch)
    if "data" not in _DB_CACHE:
        _DB_CACHE["data"] = db.to_device()
    return _DB_CACHE["data"], cfg


def test_device_data_and_batcher(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)

    O, Ntr = data.nr_objects, data.nr_training_poses
    T = data.nr_template_poses
    assert data.max_sim_tmpl.shape == (O, Ntr, 2)
    assert data.elev_ok.shape == (O, T, T)

    # puller is the nearest template by quaternion distance
    from pose3d_tpu.ops import quaternion as Q
    d = np.asarray(Q.pairwise_angular_distance(
        data.train_labels[0, :, 1:5], data.tmpl_labels[0, :, 1:5]))
    np.testing.assert_array_equal(np.asarray(data.max_sim_tmpl[0, :, 0]),
                                  d.argmin(axis=1))

    groups = cfg.batch_size // TRIPLET_SIZE
    batch = build_batch(jax.random.key(0), jnp.int32(0), groups, data,
                        random_background=cfg.random_background)
    assert batch.shape == (cfg.batch_size, 64, 64, 7)
    b = np.asarray(batch).reshape(groups, TRIPLET_SIZE, 64, 64, 7)

    # group g anchors object g % O, pose g // O (reference linearId scheme)
    for g in range(groups):
        obj, pose = g % O, (g // O) % Ntr
        puller_idx = int(data.max_sim_tmpl[obj, pose, 0])
        np.testing.assert_allclose(
            b[g, 1], np.asarray(data.tmpl_patches[obj, puller_idx]))

    assert epoch_iters(data, cfg.batch_size) == max(1, O * Ntr // groups)


def test_to_device_storage_dtype_from_config(tmp_path, monkeypatch):
    """The config's storage_dtype knob drives the resident sample dtype
    (CLI path: Solver gets bf16-resident tensors, batches promote to f32)."""
    import dataclasses
    from fixtures import fixture_db
    db, cfg = fixture_db(None, monkeypatch)
    db.cfg = dataclasses.replace(cfg, storage_dtype="bfloat16")
    try:
        data = db.to_device()
        assert data.train_patches.dtype == jnp.bfloat16
        assert data.tmpl_patches.dtype == jnp.bfloat16
        assert data.train_labels.dtype == jnp.float32   # labels stay f32
    finally:
        db.cfg = cfg


def test_batcher_pusher2_other_class(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    from pose3d_tpu.data.batcher import batch_indices
    ix = batch_indices(jax.random.key(1), jnp.int32(0), 10, data)
    obj = np.asarray(ix["obj"])
    p2 = np.asarray(ix["pusher2_obj"])
    assert (p2 != obj).all()
    p0 = np.asarray(ix["pusher0"])
    pull = np.asarray(ix["puller"])
    assert (p0 != pull).all()      # non-rotInv: pusher0 != puller


def test_batcher_bootstrapping_tables(tmp_path, monkeypatch):
    data, cfg = _cached_device_data(monkeypatch)
    from pose3d_tpu.data.batcher import batch_indices
    O, Ntr = data.nr_objects, data.nr_training_poses
    # fabricate kNN tables: everything 'misclassified' to template 1 of the
    # other object, second entry valid
    knn = np.zeros((O, Ntr, 4), np.int32)
    knn[..., 0] = 1 - np.arange(O)[:, None]    # wrong object
    knn[..., 1] = 1
    knn[..., 2] = 1 - np.arange(O)[:, None]
    knn[..., 3] = 2
    has2 = np.ones((O, Ntr), bool)
    ix = batch_indices(jax.random.key(2), jnp.int32(0), 8, data,
                       bootstrapping=True,
                       knn_tables=(jnp.asarray(knn), jnp.asarray(has2)))
    obj = np.asarray(ix["obj"])
    np.testing.assert_array_equal(np.asarray(ix["pusher1_obj"]), 1 - obj)
    np.testing.assert_array_equal(np.asarray(ix["pusher1_pose"]),
                                  np.ones_like(obj))
    np.testing.assert_array_equal(np.asarray(ix["pusher2_obj"]), 1 - obj)
    np.testing.assert_array_equal(np.asarray(ix["pusher2_pose"]),
                                  np.full_like(obj, 2))


def test_synth_samples_pair_matches_separate_calls():
    """create_synth_samples_pair (one render invocation, shared probe /
    program / overflow check) must produce exactly the two sets the
    separate calls produce."""
    import numpy as np
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import (create_synth_samples,
                                         create_synth_samples_pair)
    from pose3d_tpu.render import make_test_mesh

    mesh = make_test_mesh("cube", 0.1)
    a = create_synth_samples(mesh, LINEMOD_K, 3, 0, True)
    b = create_synth_samples(mesh, LINEMOD_K, 3, 1, True)
    pa, pb = create_synth_samples_pair(mesh, LINEMOD_K, 3, 0, 1, True)
    np.testing.assert_array_equal(pa.patches, a.patches)
    np.testing.assert_array_equal(pa.labels, a.labels)
    np.testing.assert_array_equal(pb.patches, b.patches)
    np.testing.assert_array_equal(pb.labels, b.labels)


def test_synth_samples_pair_deferred_overflow():
    """defer_overflow=True must produce the same sets with NO host sync in
    the render path, returning the overflow flag + a blocking retry whose
    output matches the probed path."""
    import jax
    import numpy as np
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import create_synth_samples_pair

    from pose3d_tpu.render import make_test_mesh

    mesh = make_test_mesh("cube", 0.1)
    pa, pb = create_synth_samples_pair(mesh, LINEMOD_K, 3, 0, 1, True,
                                       to_host=False)
    da, db, overflow, retry = create_synth_samples_pair(
        mesh, LINEMOD_K, 3, 0, 1, True, to_host=False, defer_overflow=True)
    assert not bool(jax.device_get(overflow))
    np.testing.assert_array_equal(np.asarray(da.patches),
                                  np.asarray(pa.patches))
    np.testing.assert_array_equal(np.asarray(db.patches),
                                  np.asarray(pb.patches))
    np.testing.assert_array_equal(da.labels, pa.labels)
    np.testing.assert_array_equal(db.labels, pb.labels)
    # the retry (probing) path reproduces the same sets
    ra, rb = retry()
    np.testing.assert_array_equal(np.asarray(ra.patches),
                                  np.asarray(pa.patches))
    np.testing.assert_array_equal(np.asarray(rb.patches),
                                  np.asarray(pb.patches))


def test_synth_samples_out_dtype_bf16():
    """out_dtype='bfloat16' must emit exactly the f32 patches rounded to
    bf16 (the cast happens on the final per-chunk patches, nothing else
    changes) — the resident-training pipeline renders straight to its bf16
    storage dtype instead of paying a conversion pass."""
    import jax.numpy as jnp
    import numpy as np
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import create_synth_samples
    from pose3d_tpu.render import make_test_mesh

    mesh = make_test_mesh("cube", 0.1)
    f32 = create_synth_samples(mesh, LINEMOD_K, 3, 0, True, to_host=False)
    b16 = create_synth_samples(mesh, LINEMOD_K, 3, 0, True, to_host=False,
                               out_dtype="bfloat16")
    assert b16.patches.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(f32.patches.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(b16.patches, dtype=np.float32))
    np.testing.assert_array_equal(f32.labels, b16.labels)


def test_speculative_capacity_scales_with_bucket():
    """TPU deferred renders size the tile capacity from the face bucket
    (dense meshes would otherwise always overflow the flat floor and pay
    probe + re-render + an extra program load); CPU keeps the flat floor
    (tight buckets would over-allocate ~8x; retries are cheap locally).
    The scale derives from the BUCKET so there stays exactly one program
    per bucket.  The GLOBAL section does NOT scale: denser meshes have
    smaller faces, so their >2x2-tile population shrinks — scaling it
    only multiplied the kernel's per-tile global walk."""
    from pose3d_tpu.data.dataset import _speculative_capacity

    # TPU floors: f_floor=2048, cap_floor=512
    assert _speculative_capacity("tpu", 2048, 2048, 512) == (512, 512)
    assert _speculative_capacity("tpu", 4096, 2048, 512) == (1024, 512)
    assert _speculative_capacity("tpu", 8192, 2048, 512) == (2048, 512)
    # CPU floors: f_floor=256, cap_floor=256 — flat regardless of bucket
    assert _speculative_capacity("cpu", 2048, 256, 256) == (256, 256)
    assert _speculative_capacity("cpu", 256, 256, 256) == (256, 256)


def test_render_patches_deferred_requires_device():
    import pytest
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import create_synth_samples_pair
    from pose3d_tpu.render import make_test_mesh

    mesh = make_test_mesh("tetra", 0.1)
    with pytest.raises(ValueError, match="to_host"):
        create_synth_samples_pair(mesh, LINEMOD_K, 0, 0, 0, True,
                                  to_host=True, defer_overflow=True)
