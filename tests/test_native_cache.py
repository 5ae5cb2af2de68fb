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
