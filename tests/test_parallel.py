"""In-suite multi-device coverage: the production epoch program and the
sharded evaluation path run on the 8-virtual-device CPU mesh (conftest
forces ``--xla_force_host_platform_device_count=8``) and must agree with
the single-device run for the same seed.

The rebuild's scale-out is pure data parallelism (SURVEY.md §2.2): batch
groups sharded over the ``dp`` axis, params/opt-state replicated, gradient
psum inserted by XLA.  Because the batch content is keyed RNG (identical
across meshes), the ONLY difference between 1- and 8-device runs is the
reduction order of the gradient psum — results must match to float32
accumulation noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose3d_tpu.config import Config
from pose3d_tpu.data.dataset import DeviceData
from pose3d_tpu.eval import evaluator
from pose3d_tpu.models import NETWORKS, init_params
from pose3d_tpu.models.manifold import descriptor_fn
from pose3d_tpu.parallel.mesh import make_mesh
from pose3d_tpu.train.solver import Solver

N_OBJECTS, N_TRAIN, N_TMPL = 2, 8, 6


def _tiny_data(seed=0):
    rng = np.random.default_rng(seed)

    def patches(n):
        return jnp.asarray(
            rng.random((N_OBJECTS, n, 64, 64, 7)).astype(np.float32))

    def labels(n):
        lab = rng.random((N_OBJECTS, n, 8)).astype(np.float32)
        lab[..., 0] = np.arange(N_OBJECTS)[:, None]
        q = lab[..., 1:5]
        lab[..., 1:5] = q / np.linalg.norm(q, axis=-1, keepdims=True)
        return jnp.asarray(lab)

    return DeviceData(
        train_patches=patches(N_TRAIN), train_labels=labels(N_TRAIN),
        tmpl_patches=patches(N_TMPL), tmpl_labels=labels(N_TMPL),
        test_patches=patches(2), test_labels=labels(2),
        max_sim_tmpl=jnp.zeros((N_OBJECTS, N_TRAIN, 2), jnp.int32),
        rot_inv=jnp.zeros((N_OBJECTS,), jnp.int32),
        elev_ok=jnp.ones((N_OBJECTS, N_TMPL, N_TMPL), bool),
        hard_negs=jnp.zeros((N_OBJECTS, 1, 64, 64, 7), jnp.float32),
        hard_neg_count=jnp.zeros((N_OBJECTS,), jnp.int32))


def _cfg(n_groups=8):
    return Config(models=["a", "b"], used_models=["a", "b"],
                  rot_inv=[0, 0], net_name="manifold_rgbd_16",
                  random_background=1, batch_size=5 * n_groups,
                  num_training_rounds=1, num_epochs=1, seed=3)


@pytest.fixture(scope="module")
def tiny_data():
    return _tiny_data()


def _run_epoch(mesh_size, tiny_data, bootstrapping=False):
    solver = Solver(_cfg(), tiny_data, mesh=make_mesh(mesh_size))
    state = solver.init_state()
    knn = solver._dummy_knn()
    epoch_fn = solver._train_epoch(bootstrapping)
    state, mean_loss = epoch_fn(state, tiny_data, knn)
    return solver, state, float(mean_loss)


def test_epoch_scan_8dev_matches_1dev(tiny_data):
    """Solver._train_epoch (the production lax.scan program, donated +
    sharding-constrained) on the 8-device mesh == single device."""
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    _, s1, l1 = _run_epoch(1, tiny_data)
    _, s8, l8 = _run_epoch(8, tiny_data)
    assert np.isfinite(l1) and np.isfinite(l8)
    assert abs(l1 - l8) < 1e-4 * max(1.0, abs(l1))
    for name in s1["params"]:
        for k, v in s1["params"][name].items():
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(s8["params"][name][k]),
                rtol=2e-4, atol=2e-5,
                err_msg=f"params[{name}][{k}] diverged across meshes")
    assert int(s8["iter"]) == int(s1["iter"])


def test_epoch_scan_8dev_bootstrapping_path(tiny_data):
    """The bootstrapping variant of the scanned epoch also compiles and
    agrees across mesh sizes (kNN-table gathers + hard-negative override)."""
    solver1 = Solver(_cfg(), tiny_data, mesh=make_mesh(1))
    solver8 = Solver(_cfg(), tiny_data, mesh=make_mesh(8))
    state1, state8 = solver1.init_state(), solver8.init_state()
    solver1.compute_knn(state1["params"])
    solver8.compute_knn(state8["params"])
    tbl1, tbl8 = solver1.knn_tables, solver8.knn_tables
    np.testing.assert_array_equal(np.asarray(tbl1[0]), np.asarray(tbl8[0]))
    s1, l1 = solver1._train_epoch(True)(state1, tiny_data, tbl1)
    s8, l8 = solver8._train_epoch(True)(state8, tiny_data, tbl8)
    assert abs(float(l1) - float(l8)) < 1e-4 * max(1.0, abs(float(l1)))
    np.testing.assert_allclose(np.asarray(s1["params"]["fc2"]["w"]),
                               np.asarray(s8["params"]["fc2"]["w"]),
                               rtol=2e-4, atol=2e-5)


def test_sharded_descriptors_match_single_device(tiny_data):
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    fn = descriptor_fn(spec)
    flat = tiny_data.train_patches.reshape(
        (-1,) + tiny_data.train_patches.shape[2:])
    d_single = evaluator.compute_descriptors(fn, params, flat, batch_size=8)
    d_mesh = evaluator.compute_descriptors(fn, params, flat, batch_size=8,
                                           mesh=make_mesh(8))
    assert d_mesh.shape == d_single.shape
    np.testing.assert_allclose(np.asarray(d_single), np.asarray(d_mesh),
                               rtol=1e-5, atol=1e-6)


def test_sharded_generation_matches_single_device():
    """Dataset generation with the view chunks sharded over the 8-device
    mesh must be bitwise identical to the single-device render: the same
    per-view programs run, only their placement changes (the overflow flag
    is an ICI pmax)."""
    from pose3d_tpu.data.dataset import create_synth_samples_pair
    from pose3d_tpu.render import make_test_mesh

    # small synthetic intrinsics -> a ~68px render window: the sharding
    # semantics are window-size independent and the full LineMOD window
    # is already covered by test_dataset.py
    K = np.array([[120.0, 0.0, 34.0], [0.0, 120.0, 34.0], [0.0, 0.0, 1.0]])
    mesh = make_test_mesh("cube", 0.1, detail=2)
    kw = dict(inplane=False, to_host=False, defer_overflow=True,
              views_per_call=4)
    t1, s1, ovf1, _ = create_synth_samples_pair(mesh, K, 0, 0, 0, **kw)
    t8, s8, ovf8, _ = create_synth_samples_pair(mesh, K, 0, 0, 0,
                                                n_shards=8, **kw)
    assert bool(ovf1) == bool(ovf8)
    np.testing.assert_array_equal(np.asarray(t1.patches),
                                  np.asarray(t8.patches))
    np.testing.assert_array_equal(np.asarray(s1.patches),
                                  np.asarray(s8.patches))
    np.testing.assert_array_equal(t1.labels, t8.labels)


def _manifold_cfg(batch_size=None):
    return Config(models=["a", "b"], used_models=["a", "b"],
                  rot_inv=[0, 0], net_name="manifold",
                  random_background=1, batch_size=batch_size,
                  num_training_rounds=1, num_epochs=1, seed=3)


def test_manifold_epoch_8dev_matches_1dev(tiny_data):
    """The legacy `manifold` triplet+pair net runs DATA-PARALLEL on dp=8
    (round-3 verdict item 8): with a dp-divisible 320-row plan (64
    triplets + 64 pairs) the sharded epoch matches the single-device one."""
    s1 = Solver(_manifold_cfg(320), tiny_data, mesh=make_mesh(1))
    s8 = Solver(_manifold_cfg(320), tiny_data, mesh=make_mesh(8))
    assert s1.manifold_groups == s8.manifold_groups == (64, 64)
    st1, l1 = s1._train_epoch(False)(s1.init_state(), tiny_data,
                                     s1._dummy_knn())
    st8, l8 = s8._train_epoch(False)(s8.init_state(), tiny_data,
                                     s8._dummy_knn())
    assert abs(float(l1) - float(l8)) < 1e-4 * max(1.0, abs(float(l1)))
    np.testing.assert_allclose(np.asarray(st1["params"]["fc2"]["w"]),
                               np.asarray(st8["params"]["fc2"]["w"]),
                               rtol=2e-4, atol=2e-5)


def test_manifold_native_batch_pads_to_dp(tiny_data, caplog):
    """The shipped 330-row plan (66+66) pads minimally to a dp-divisible
    336 rows (+3 pair groups) instead of running replicated."""
    import logging
    with caplog.at_level(logging.WARNING, "pose3d_tpu.train.solver"):
        solver = Solver(_manifold_cfg(), tiny_data, mesh=make_mesh(8))
        nt, npair = solver.manifold_groups
        assert (3 * nt + 2 * npair) % 8 == 0
        assert 3 * nt + 2 * npair == 336        # minimal padding: +6 rows
        assert solver.spec.loss_slices == ((0, 3 * nt, 1, 0),
                                           (3 * nt, -1, 0, 1))
        _, loss = solver._train_epoch(False)(solver.init_state(), tiny_data,
                                             solver._dummy_knn())
        assert np.isfinite(float(loss))
    assert not any("running replicated" in r.message for r in caplog.records)


def test_solver_train_runs_on_8dev_mesh(tiny_data, tmp_path):
    """Full Solver.train() (rounds + epochs + logging + snapshot) executes
    on the 8-device mesh end to end."""
    cfg = _cfg()
    cfg.output_path = str(tmp_path)
    solver = Solver(cfg, tiny_data, mesh=make_mesh(8))
    state = solver.train()
    assert int(state["iter"]) == solver.epoch_iter
    import os
    snaps = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert snaps, "train() must snapshot at the end"
