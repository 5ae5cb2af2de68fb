"""Golden-model test: compute_confusion_matrix vs a scalar transcription of
the reference loop (src/networkevaluator.cpp:178-246)."""

import numpy as np
import jax.numpy as jnp

from pose3d_tpu.eval import evaluator


def golden_confusion(dq, dt, q_cls, t_cls, models, local_index, k,
                     nr_test_poses):
    dist = np.linalg.norm(dq[:, None, :] - dt[None, :, :], axis=-1)
    order = np.argsort(dist, axis=1)[:, :k]
    n = len(local_index)
    conf = np.zeros((n, n))
    for qi in range(len(dq)):
        chosen = None
        for nn in range(k):
            j = order[qi, nn]
            if t_cls[j] == q_cls[qi]:
                chosen = t_cls[j]
                break
        if chosen is None:
            chosen = t_cls[order[qi, 0]]
        conf[local_index[models[int(q_cls[qi])]],
             local_index[models[int(chosen)]]] += 1
    return conf / nr_test_poses


def test_confusion_matches_reference_transcription(rng):
    O, T, Qn, D = 3, 12, 9, 6
    t_cls = np.repeat(np.arange(O), T)
    q_cls = np.repeat(np.arange(O), Qn)
    # descriptors: class clusters with heavy noise so some queries miss
    centers = rng.normal(size=(O, D)) * 2
    dt = (centers[t_cls] + rng.normal(size=(O * T, D))).astype(np.float32)
    dq = (centers[q_cls] + 2.0 * rng.normal(size=(O * Qn, D))
          ).astype(np.float32)

    models = ["a", "b", "c"]
    local_index = {"a": 0, "b": 1, "c": 2}
    want = golden_confusion(dq, dt, q_cls, t_cls, models, local_index, 3, Qn)

    t_labels = np.zeros((O, T, 8), np.float32)
    t_labels[..., 0] = np.arange(O)[:, None]
    q_labels = np.zeros((O, Qn, 8), np.float32)
    q_labels[..., 0] = np.arange(O)[:, None]

    full = np.concatenate([dt, dq]).astype(np.float32)
    sel_t = np.zeros((O, T, len(full)), np.float32)
    sel_q = np.zeros((O, Qn, len(full)), np.float32)
    for o in range(O):
        for t in range(T):
            sel_t[o, t, o * T + t] = 1
        for q in range(Qn):
            sel_q[o, q, O * T + o * Qn + q] = 1

    class Lookup:
        def __call__(self, params, rows):
            return rows @ jnp.asarray(full)

    got = evaluator.compute_confusion_matrix(
        Lookup(), None, jnp.asarray(sel_t), jnp.asarray(t_labels),
        jnp.asarray(sel_q), jnp.asarray(q_labels), models, local_index, k=3)
    np.testing.assert_allclose(got, want, atol=1e-9)
    # sanity: noise must have produced at least one off-diagonal entry
    assert want.sum() - np.trace(want) > 0


def test_tensorboard_scalars_optional(tmp_path):
    hist = np.array([0.1, 0.2, 0.3, 0.5, 0.8, 1.0, 12.5, 9.0])
    ok = evaluator.save_tensorboard_scalars(str(tmp_path), "run.txt", hist,
                                            hist, 10)
    if ok:   # torch.utils.tensorboard available in this image
        import os
        assert os.path.isdir(tmp_path / "tb")
