import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.config import load_config
from pose3d_tpu.ops import knn as K
from pose3d_tpu.ops import noise as NZ


def test_knn_l2_matches_bruteforce(rng):
    q = rng.normal(size=(20, 16)).astype(np.float32)
    db = rng.normal(size=(50, 16)).astype(np.float32)
    dist, idx = K.knn_l2(jnp.asarray(q), jnp.asarray(db), k=3)
    dist, idx = np.asarray(dist), np.asarray(idx)
    full = np.linalg.norm(q[:, None, :] - db[None, :, :], axis=-1)
    want_idx = np.argsort(full, axis=1)[:, :3]
    want_d = np.take_along_axis(full, want_idx, axis=1)
    # the |a|^2+|b|^2-2ab decomposition loses ~1e-3 relative in f32
    np.testing.assert_allclose(dist, want_d, rtol=5e-3)
    # indices can differ on near-ties; the gathered distances must agree
    got_d = np.take_along_axis(full, idx, axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=5e-3)


def test_knn_hamming(rng):
    q = (rng.random((8, 128)) > 0.5).astype(np.float32)
    db = (rng.random((30, 128)) > 0.5).astype(np.float32)
    dist, idx = K.knn_hamming(jnp.asarray(q), jnp.asarray(db), k=2)
    full = (q[:, None, :] != db[None, :, :]).sum(-1)
    want_idx = np.argsort(full, axis=1)[:, :2]
    want = np.take_along_axis(full, want_idx, axis=1)
    got = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_allclose(np.asarray(dist), want, atol=1e-5)


def test_simplex_fractal_statistics():
    perm = NZ.make_permutation(jax.random.key(0))
    img = np.asarray(NZ.simplex_fractal(perm, (76, 76)))
    assert img.shape == (76, 76)
    assert np.isfinite(img).all()
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert img.std() > 0.05        # not constant
    # different keys -> different fields
    img2 = np.asarray(NZ.simplex_fractal(
        NZ.make_permutation(jax.random.key(1)), (76, 76)))
    assert not np.allclose(img, img2)
    # smoothness: neighbor correlation must be high at freq 0.01
    corr = np.corrcoef(img[:-1].ravel(), img[1:].ravel())[0, 1]
    assert corr > 0.9


def test_config_reference_ini_with_defaults(tmp_path):
    ini = textwrap.dedent("""\
        [paths]
        dataset_path = /data/
        hdf5_path = /h5/
        network_path = /net/
        background_path = /bg/

        [input]
        dataset_name = LineMOD
        models = ape,cat,duck
        rotInv = 0,0,1
        used_models = ape,cat
        inplane = true
        use_real = true
        random_background = 3

        [train]
        net_name = manifold_rgbd_16
        gpu = false
        num_epochs = 1
        num_training_rounds = 30
        learning_rate = 0.001
        momentum = 0.9
        weight_decay = 0.001
        learning_policy = step
        step_size = 15000
        gamma = 0.9
        binarization = false
        binarization_epochs = 10
        binarization_net_name = manifold_rgbdnor_16_bin
        """)
    p = tmp_path / "config.ini"
    p.write_text(ini)
    cfg = load_config(str(p))
    assert cfg.models == ["ape", "cat", "duck"]
    assert cfg.used_models == ["ape", "cat"]
    assert cfg.rot_inv == [0, 0, 1]
    assert cfg.random_background == 3     # inline comment stripped
    assert cfg.num_bootstrapping_rounds == 0   # default for missing key
    assert cfg.knn == 3                        # default for missing [output]
    assert cfg.nr_objects == 2
    assert cfg.model_index == {"ape": 0, "cat": 1, "duck": 2}


def test_config_shipped_reference_files():
    """The two INI files the reference actually ships load verbatim.

    Pins the real-file quirks a synthetic fixture can miss: a trailing
    space after ``random_background = 3 `` (reference config.ini:15), a
    space-free ``network_path=...`` assignment (configbb.ini:4), a rotInv
    list LONGER than the model list (10 flags for 9 BigBIRD models,
    configbb.ini:9-10), and ``used_models`` a strict subset of ``models``
    (configbb.ini:12 drops syrup)."""
    ref = "/root/reference"
    if not os.path.exists(os.path.join(ref, "config.ini")):
        import pytest
        pytest.skip("reference tree not present")

    cfg = load_config(os.path.join(ref, "config.ini"))
    assert len(cfg.models) == 15 and cfg.models[0] == "ape"
    assert cfg.used_models == cfg.models
    assert cfg.rot_inv == [0, 0, 1, 0, 0, 0, 2, 0, 0, 2, 2, 0, 0, 0, 0]
    assert cfg.dataset_name == "LineMOD"
    assert cfg.random_background == 3      # trailing space stripped
    assert cfg.nr_objects == 15

    bb = load_config(os.path.join(ref, "configbb.ini"))
    assert bb.dataset_name == "BigBIRD"
    assert len(bb.models) == 9             # network_path= parsed w/o space
    assert bb.used_models == [m for m in bb.models if m != "syrup"]
    assert len(bb.rot_inv) >= len(bb.models)   # over-length list tolerated
    assert bb.rot_inv[: len(bb.models)] == [0] * 9
    assert bb.random_background == 0
    assert bb.nr_objects == 8


def test_config_validation(tmp_path):
    p = tmp_path / "bad.ini"
    p.write_text("[input]\nmodels = a\nused_models = b\n")
    import pytest
    with pytest.raises(ValueError):
        load_config(str(p))


def test_config_dtype_knobs(tmp_path):
    p = tmp_path / "dt.ini"
    p.write_text("[input]\nmodels = a\n"
                 "[train]\nstorage_dtype = bfloat16\n")
    cfg = load_config(str(p))
    assert cfg.storage_dtype == "bfloat16"
    assert cfg.serving_dtype == "bfloat16"      # default
    assert cfg.compute_dtype == "float32"       # default

    import dataclasses
    import pytest
    from pose3d_tpu.config import Config
    for key in ("storage_dtype", "serving_dtype", "compute_dtype"):
        with pytest.raises(ValueError):
            dataclasses.replace(Config(models=["a"]),
                                **{key: "float16"}).validate()
    # the bit-parity mode is legal for compute/serving (precision='highest'
    # via precision_from_config) but meaningless as a storage layout
    for key in ("serving_dtype", "compute_dtype"):
        dataclasses.replace(Config(models=["a"]),
                            **{key: "float32_full"}).validate()
    with pytest.raises(ValueError):
        dataclasses.replace(Config(models=["a"]),
                            storage_dtype="float32_full").validate()
