import os
import subprocess
import sys

import numpy as np
import pytest

from pose3d_tpu.data import native_cache as nc


def _sample_data(n=32, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, 16, 16, 7)).astype(np.float32),
            rng.random((n, 8)).astype(np.float32))


def test_write_gather_roundtrip(tmp_path):
    patches, labels = _sample_data()
    p = str(tmp_path / "c.p3dcache")
    nc.write_cache(p, patches, labels)
    with nc.NativeCache(p) as c:
        assert (c.n, c.c, c.h, c.w, c.label_dim) == (32, 7, 16, 16, 8)
        idx = np.array([5, 0, 31, 17, 17])
        out, lab = c.gather(idx)
        np.testing.assert_allclose(out, patches[idx], rtol=1e-7)
        np.testing.assert_allclose(lab, labels[idx], rtol=1e-7)


def test_out_of_range_clamped(tmp_path):
    patches, labels = _sample_data(8)
    p = str(tmp_path / "c.p3dcache")
    nc.write_cache(p, patches, labels)
    with nc.NativeCache(p) as c:
        out, _ = c.gather(np.array([-3, 99]))
        np.testing.assert_allclose(out[0], patches[0])
        np.testing.assert_allclose(out[1], patches[7])


def test_large_threaded_gather(tmp_path):
    patches, labels = _sample_data(256, seed=3)
    p = str(tmp_path / "c.p3dcache")
    nc.write_cache(p, patches, labels)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 256, size=1024)
    with nc.NativeCache(p, threads=4) as c:
        out, lab = c.gather(idx)
        np.testing.assert_allclose(out, patches[idx], rtol=1e-7)
        np.testing.assert_allclose(lab, labels[idx], rtol=1e-7)


def test_numpy_fallback_matches_native(tmp_path, monkeypatch):
    patches, labels = _sample_data(16, seed=5)
    p = str(tmp_path / "c.p3dcache")
    nc.write_cache(p, patches, labels)
    idx = np.array([1, 15, 8])
    native_available = nc.load_library() is not None

    with nc.NativeCache(p) as c:
        out_native, lab_native = c.gather(idx)

    # force the numpy path
    monkeypatch.setattr(nc, "load_library", lambda build=True: None)
    with nc.NativeCache(p) as c2:
        assert c2._handle is None
        out_np, lab_np = c2.gather(idx)

    np.testing.assert_allclose(out_np, out_native, rtol=1e-7)
    np.testing.assert_allclose(lab_np, lab_native, rtol=1e-7)
    assert native_available  # the image ships g++; the .so must build


# --------------------------------------------------------------- CacheWriter

def test_cache_writer_matches_write_cache(tmp_path):
    """Incremental CacheWriter output is byte-identical to the one-shot
    write_cache file, and NativeCache reads it back exactly."""
    patches, labels = _sample_data(24, seed=7)
    one = str(tmp_path / "one.p3dcache")
    inc = str(tmp_path / "inc.p3dcache")
    nc.write_cache(one, patches, labels)
    with nc.CacheWriter(inc, 24, 7, 16, 16, 8) as w:
        w.append(patches[:10], labels[:10])
        w.append(patches[10:], labels[10:])
    with open(one, "rb") as f1, open(inc, "rb") as f2:
        assert f1.read() == f2.read()
    with nc.NativeCache(inc) as c:
        assert (c.n, c.c, c.h, c.w, c.label_dim) == (24, 7, 16, 16, 8)
        out, lab = c.gather(np.arange(24))
        np.testing.assert_allclose(out, patches, rtol=1e-7)
        np.testing.assert_allclose(lab, labels, rtol=1e-7)


def test_cache_writer_undercount_raises_and_keeps_tmp(tmp_path):
    """A build that dies short of its declared count must never leave a
    file a later run mistakes for a complete cache."""
    patches, labels = _sample_data(8)
    p = str(tmp_path / "short.p3dcache")
    w = nc.CacheWriter(p, 16, 7, 16, 16, 8)
    w.append(patches, labels)
    with pytest.raises(ValueError, match="wrote 8 of 16"):
        w.close()
    assert not os.path.exists(p)          # only the .tmp exists
    assert os.path.exists(p + ".tmp")


def test_cache_writer_shape_mismatch_raises(tmp_path):
    patches, labels = _sample_data(4)
    with nc.CacheWriter(str(tmp_path / "x.p3dcache"), 4, 7, 16, 16, 8) as w:
        with pytest.raises(ValueError, match="chunk shape"):
            w.append(patches[:, :8], labels)
        w.append(patches, labels)


# -------------------------------------------------------------- ConcatCaches

def _two_caches(tmp_path):
    pa, la = _sample_data(10, seed=1)
    pb, lb = _sample_data(6, seed=2)
    a, b = str(tmp_path / "a.p3dcache"), str(tmp_path / "b.p3dcache")
    nc.write_cache(a, pa, la)
    nc.write_cache(b, pb, lb)
    return (nc.ConcatCaches([nc.NativeCache(a), nc.NativeCache(b)]),
            np.concatenate([pa, pb]), np.concatenate([la, lb]))


def test_concat_caches_gather_across_seam(tmp_path):
    cc, patches, labels = _two_caches(tmp_path)
    with cc:
        assert cc.n == 16
        idx = np.array([0, 9, 10, 15, 3, 12])   # straddles the seam
        out, lab = cc.gather(idx)
        np.testing.assert_allclose(out, patches[idx], rtol=1e-7)
        np.testing.assert_allclose(lab, labels[idx], rtol=1e-7)


def test_concat_caches_empty_gather(tmp_path):
    """An empty selection must return empty arrays of the contract shape,
    not (None, labels) — round-4 advisor finding."""
    cc, _, _ = _two_caches(tmp_path)
    with cc:
        out, lab = cc.gather(np.array([], np.int64))
        assert out.shape == (0, 16, 16, 7) and out.dtype == np.float32
        assert lab.shape == (0, 8) and lab.dtype == np.float32


def test_concat_caches_shape_disagreement_raises(tmp_path):
    pa, la = _sample_data(4, seed=1)
    pb = np.zeros((4, 8, 8, 7), np.float32)
    a, b = str(tmp_path / "a.p3dcache"), str(tmp_path / "b.p3dcache")
    nc.write_cache(a, pa, la)
    nc.write_cache(b, pb, la)
    with pytest.raises(ValueError, match="disagree"):
        nc.ConcatCaches([nc.NativeCache(a), nc.NativeCache(b)])


# ------------------------------------------------------- pair negatives cache

def test_write_pair_negatives(tmp_path):
    """Each paired object's negatives are the partner's first n_negs
    template rows; unpaired objects get count 0 (reference negs_<m>.h5
    semantics, src/networksolver.cpp:96-101)."""
    O, T, n_negs = 4, 5, 2
    rng = np.random.default_rng(0)
    tmpl = rng.random((O * T, 16, 16, 7)).astype(np.float32)
    labels = rng.random((O * T, 8)).astype(np.float32)
    tp = str(tmp_path / "tmpl.p3dcache")
    nc.write_cache(tp, tmpl, labels)
    partners = np.array([1, 0, -1, -1])
    negs_p = str(tmp_path / "negs.p3dcache")
    with nc.NativeCache(tp) as tc:
        counts = nc.write_pair_negatives(negs_p, tc, T, O, partners, n_negs)
    np.testing.assert_array_equal(counts, [2, 2, 0, 0])
    with nc.NativeCache(negs_p) as c:
        assert c.n == O * n_negs
        got, _ = c.gather(np.arange(O * n_negs))
        # object 0's rows = object 1's first two templates, and vice versa
        np.testing.assert_allclose(got[0:2], tmpl[T:T + 2])
        np.testing.assert_allclose(got[2:4], tmpl[0:2])
        # unpaired objects are self-filled (never drawn)
        np.testing.assert_allclose(got[4:6], tmpl[2 * T:2 * T + 2])


# ----------------------------------- wang flagship plumbing: round handoff

def _make_wang_fixture(base, O=4, Ntr=12, T=6):
    """Fake pre-built caches in the wang script's expected layout: random
    patches, labels [class, unit-quat, trans]."""
    rng = np.random.default_rng(5)

    def labels_for(n_per):
        lab = np.zeros((O, n_per, 8), np.float32)
        for o in range(O):
            lab[o, :, 0] = o
            q = rng.normal(size=(n_per, 4))
            lab[o, :, 1:5] = q / np.linalg.norm(q, axis=1, keepdims=True)
            lab[o, :, 5:8] = rng.normal(size=(n_per, 3)) * 0.1
        return lab

    trl, tml = labels_for(Ntr), labels_for(T)
    for stem, lab in (("train", trl), ("templates", tml)):
        n = lab.shape[0] * lab.shape[1]
        patches = rng.random((n, 64, 64, 7)).astype(np.float32)
        nc.write_cache(os.path.join(base, f"{stem}.cache"), patches,
                       lab.reshape(n, 8))
    np.savez(os.path.join(base, "labels.npz"), train=trl, tmpl=tml)


def test_wang_round_subprocess_handoff(tmp_path):
    """Two tiny rounds of the wang flagship driver on CPU: round 0 trains
    and snapshots, round 1 restores the handoff, mines bootstrap kNN over
    the streamed sets, trains, and snapshots again — the exact
    subprocess-recycled lifecycle the TPU run bets hours on."""
    base = str(tmp_path / "wang")
    os.makedirs(base)
    _make_wang_fixture(base)
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "validate_wang_streaming.py")
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "P3D_WANG_OBJECTS": "4", "P3D_WANG_BASE": "4",
        "P3D_WANG_NEGS": "4", "P3D_WANG_ROUNDS": "1,1",
        "P3D_WANG_BATCH": "10",
    })
    outputs = []
    for rnd in (0, 1):
        r = subprocess.run(
            [sys.executable, os.path.abspath(script), "--round", str(rnd),
             base], env=env, capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, (r.stdout, r.stderr)
        outputs.append(r.stdout)
    import json
    stats = []
    for rnd in (0, 1):
        with open(os.path.join(base, f"round_{rnd}.json")) as f:
            stats.append(json.load(f))
    assert stats[0]["backend"] == "cpu" and not stats[0]["tpu"]
    assert not stats[0]["bootstrapping"] and stats[1]["bootstrapping"]
    assert np.isfinite(stats[0]["loss"]) and np.isfinite(stats[1]["loss"])
    assert "restored" in outputs[1]        # the handoff actually happened
    assert "bootstrap kNN mined" in outputs[1]
    # round 1 restored round 0's snapshot and advanced the iteration
    out = os.path.join(base, "out")
    iters = sorted(int(f.split("_iter_")[1].split(".")[0])
                   for f in os.listdir(out) if f.endswith(".ckpt"))
    assert len(iters) == 2 and iters[1] == 2 * iters[0] > 0


def test_wang_round_missing_handoff_fails_clearly(tmp_path):
    """Round >0 with no snapshot must exit 2 with an explicit message, not
    crash unpacking None — round-4 advisor finding."""
    base = str(tmp_path / "wang")
    os.makedirs(base)
    _make_wang_fixture(base)
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "validate_wang_streaming.py")
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "P3D_WANG_OBJECTS": "4", "P3D_WANG_BASE": "4",
        "P3D_WANG_NEGS": "4", "P3D_WANG_ROUNDS": "1,1",
        "P3D_WANG_BATCH": "10",
    })
    r = subprocess.run(
        [sys.executable, os.path.abspath(script), "--round", "1", base],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 2
    assert "no snapshot found" in r.stdout
