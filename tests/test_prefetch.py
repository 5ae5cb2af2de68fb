import numpy as np
import pytest

from pose3d_tpu.data.prefetch import DevicePrefetcher


def test_prefetcher_yields_all_batches_in_order():
    def make(step):
        return {"x": np.full((4, 4), step, np.float32)}

    pf = DevicePrefetcher(make, steps=7, depth=2)
    seen = [int(np.asarray(b["x"])[0, 0]) for b in pf]
    assert seen == list(range(7))
    assert len(pf) == 7


def test_prefetcher_propagates_worker_errors():
    def make(step):
        if step == 2:
            raise ValueError("boom at 2")
        return np.zeros(3, np.float32)

    pf = DevicePrefetcher(make, steps=5)
    with pytest.raises(ValueError, match="boom at 2"):
        list(pf)


def test_prefetcher_with_native_cache(tmp_path):
    from pose3d_tpu.data import native_cache as nc
    rng = np.random.default_rng(0)
    patches = rng.random((40, 8, 8, 7)).astype(np.float32)
    labels = rng.random((40, 8)).astype(np.float32)
    p = str(tmp_path / "c.p3dcache")
    nc.write_cache(p, patches, labels)
    cache = nc.NativeCache(p)

    def make(step):
        idx = (np.arange(10) + step * 10) % 40
        out, lab = cache.gather(idx)
        return {"patches": out, "labels": lab}

    batches = list(DevicePrefetcher(make, steps=4))
    assert len(batches) == 4
    np.testing.assert_allclose(np.asarray(batches[1]["patches"][0]),
                               patches[10], rtol=1e-6)
    cache.close()
