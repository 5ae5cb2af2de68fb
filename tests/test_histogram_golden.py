"""Golden-model test: compute_histogram vs a direct transcription of the
reference evaluation loop (src/networkevaluator.cpp:248-356)."""

import numpy as np
import jax.numpy as jnp

from pose3d_tpu.eval import evaluator

BINS = [-1.0, 0.0, 10.0, 20.0, 40.0, 180.0]


def golden_histogram(dq, dt, q_labels, t_labels, rot_inv, k=3):
    """Scalar transcription of the reference computeHistogram."""
    T_all = len(dt)
    # brute-force kNN by L2
    dist = np.linalg.norm(dq[:, None, :] - dt[None, :, :], axis=-1)
    order = np.argsort(dist, axis=1)[:, :k]

    histo = np.zeros(len(BINS))
    diffs = []
    mean_angle = 0.0
    for qi in range(len(dq)):
        q_quat = q_labels[qi, 1:5]
        best_dist = np.inf
        best_j = -1
        for nn in range(k):
            j = order[qi, nn]
            if t_labels[j, 0] != q_labels[qi, 0]:
                continue
            t_quat = t_labels[j, 1:5]
            if rot_inv[int(q_labels[qi, 0])] == 0:
                dot = abs(float(np.clip(np.dot(q_quat, t_quat), -1, 1)))
                d = 2 * np.arctan2(np.sqrt(max(0.0, 1 - dot * dot)), dot)
                d = np.degrees(d)
            else:
                e1 = np.arccos(np.clip(1 - 2 * (q_quat[0] ** 2 +
                                                q_quat[1] ** 2), -1, 1))
                e2 = np.arccos(np.clip(1 - 2 * (t_quat[0] ** 2 +
                                                t_quat[1] ** 2), -1, 1))
                d = np.degrees(abs(e1 - e2))
                if np.isnan(d):
                    d = np.inf
            if d < best_dist:
                best_dist = d
                best_j = j
        if best_j < 0:
            histo[0] += 1
            continue
        mean_angle += best_dist
        diffs.append(best_dist)

        # exact match: no same-object template strictly closer in angle
        bq = t_labels[best_j, 1:5]
        dot_b = abs(float(np.clip(np.dot(q_quat, bq), -1, 1)))
        ang_b = 2 * np.arctan2(np.sqrt(max(0.0, 1 - dot_b ** 2)), dot_b)
        exact = True
        for j in range(T_all):
            if t_labels[j, 0] != t_labels[best_j, 0]:
                continue
            dj = abs(float(np.clip(np.dot(q_quat, t_labels[j, 1:5]), -1, 1)))
            aj = 2 * np.arctan2(np.sqrt(max(0.0, 1 - dj ** 2)), dj)
            if aj < ang_b:
                exact = False
        if exact:
            histo[1] += 1
        for b in range(2, len(BINS)):
            if best_dist < BINS[b]:
                histo[b] += 1

    total = histo[0] + histo[-1]
    if total > 0:
        histo = histo / total
    mean_angle /= len(dq)
    median = sorted(diffs)[(len(diffs) - 1) // 2] if diffs else 0.0
    return np.concatenate([histo, [mean_angle, median]])


def _random_setup(seed=0, O=3, T=20, Qn=15, D=8):
    rng = np.random.default_rng(seed)

    def quats(n):
        q = rng.normal(size=(n, 4))
        return q / np.linalg.norm(q, axis=1, keepdims=True)

    t_labels = np.zeros((O, T, 8), np.float32)
    q_labels = np.zeros((O, Qn, 8), np.float32)
    for o in range(O):
        t_labels[o, :, 0] = o
        q_labels[o, :, 0] = o
        t_labels[o, :, 1:5] = quats(T)
        q_labels[o, :, 1:5] = quats(Qn)
    # descriptors: noisy projections of the quats so retrieval is imperfect
    W = rng.normal(size=(4, D)).astype(np.float32)
    dt = t_labels[..., 1:5].reshape(-1, 4) @ W
    dq = (q_labels[..., 1:5].reshape(-1, 4) @ W
          + 0.05 * rng.normal(size=(O * Qn, D)).astype(np.float32))
    return dq.astype(np.float32), dt.astype(np.float32), q_labels, t_labels


def test_histogram_matches_reference_transcription():
    dq, dt, q_labels, t_labels = _random_setup()
    rot_inv = [0, 1, 0]

    want = golden_histogram(dq, dt.astype(np.float32),
                            q_labels.reshape(-1, 8),
                            t_labels.reshape(-1, 8), rot_inv, k=3)

    # drive compute_histogram with a fake net that maps index->descriptor:
    # patches are one-hot row selectors so apply == matmul lookup
    O, T = t_labels.shape[:2]
    Qn = q_labels.shape[1]

    class Lookup:
        def __init__(self, table):
            self.table = jnp.asarray(table)

        def __call__(self, params, rows):
            return rows @ self.table

    # patch stand-ins: one-hot selectors into a combined descriptor table
    full = np.concatenate([dt, dq], axis=0)
    sel_t = np.zeros((O, T, len(full)), np.float32)
    sel_q = np.zeros((O, Qn, len(full)), np.float32)
    for o in range(O):
        for t in range(T):
            sel_t[o, t, o * T + t] = 1
        for q in range(Qn):
            sel_q[o, q, O * T + o * Qn + q] = 1

    fn = Lookup(full)
    got = evaluator.compute_histogram(
        fn, None, jnp.asarray(sel_t), jnp.asarray(t_labels),
        jnp.asarray(sel_q), jnp.asarray(q_labels), rot_inv, k=3)

    np.testing.assert_allclose(got, want, atol=2e-3)
