import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.eval import evaluator
from pose3d_tpu.ops.knn import knn_hamming, knn_l2


def test_binary_codes_l2_equals_hamming(rng):
    q = (rng.random((40, 128)) > 0.5).astype(np.float32)
    db = (rng.random((100, 128)) > 0.5).astype(np.float32)
    d2, i2 = knn_l2(jnp.asarray(q), jnp.asarray(db), k=5)
    dh, ih = knn_hamming(jnp.asarray(q), jnp.asarray(db), k=5)
    # identical ordering; L2 = sqrt(Hamming)
    full = (q[:, None, :] != db[None, :, :]).sum(-1)
    got_l2 = np.take_along_axis(full, np.asarray(i2), axis=1)
    got_h = np.take_along_axis(full, np.asarray(ih), axis=1)
    np.testing.assert_array_equal(np.sort(got_l2), np.sort(got_h))
    np.testing.assert_allclose(np.asarray(d2) ** 2, got_l2, atol=1e-3)


def test_binary_descriptor_fn_thresholds():
    def fake_logits(params, patches):
        return jnp.asarray([[-3.0, 0.2, 5.0, -0.1]])

    fn = evaluator.binary_descriptor_fn(fake_logits)
    codes = np.asarray(fn(None, None))
    np.testing.assert_array_equal(codes, [[0, 1, 1, 0]])


def test_histogram_protocol_on_binary_codes(rng):
    # two classes of well-separated random codes: retrieval must be perfect
    O, T = 2, 16
    base = (rng.random((O, 128)) > 0.5).astype(np.float32)
    t_codes = np.zeros((O, T, 128), np.float32)
    labels = np.zeros((O, T, 8), np.float32)
    for o in range(O):
        labels[o, :, 0] = o
        q = rng.normal(size=(T, 4))
        labels[o, :, 1:5] = q / np.linalg.norm(q, axis=1, keepdims=True)
        for t in range(T):
            code = base[o].copy()
            flips = rng.choice(128, size=5, replace=False)  # 5-bit noise
            code[flips] = 1 - code[flips]
            t_codes[o, t] = code

    class Lookup:
        def __call__(self, params, sel):
            return sel @ t_codes.reshape(-1, 128)

    sel = np.eye(O * T, dtype=np.float32).reshape(O, T, O * T)
    hist = evaluator.compute_histogram(
        Lookup(), None, jnp.asarray(sel), jnp.asarray(labels),
        jnp.asarray(sel), jnp.asarray(labels), [0, 0], k=3)
    assert hist[0] == 0.0          # no wrong-class retrievals
    assert hist[1] > 0.9           # nearly all exact self-matches
