"""NumPy-golden parity for the reconstructed TripletLoss semantics.

The reference delegates the loss to the out-of-tree Caffe PR #2603 layer
(reference README.md:21); its parameters (margin 0.1, losstype 1 = ratio
hinge, num_negatives, use_pair — network/manifold_rgbd_16.prototxt:142-155)
encode the Wohlhart-Lepetit CVPR'15 formula.  These tests transcribe that
formula as scalar NumPy loops (the same golden style as
test_caffe_import.py / test_histogram_golden.py) and check the fused JAX
loss — values AND a short loss curve over real recorded training batches —
against it.  SURVEY.md §7 hard part 3.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.data.batcher import build_batch
from pose3d_tpu.models import NETWORKS, apply, init_params, losses
from pose3d_tpu.train.optim import caffe_sgd

from test_dataset import _cached_device_data


def _np_triplet_ratio_loss(desc, margin, num_negatives, use_pair):
    """Scalar-loop transcription of the PR #2603 TripletLoss forward
    (losstype 1): per group (anchor, puller, pusher_1..n),
    sum_i max(0, 1 - |a-n_i|^2 / (|a-p|^2 + m)), plus |a-p|^2 when
    use_pair, each term normalized by the group count."""
    desc = np.asarray(desc, np.float64)
    group = 2 + num_negatives
    G = len(desc) // group
    trip = 0.0
    pair = 0.0
    for g in range(G):
        a = desc[g * group + 0]
        p = desc[g * group + 1]
        d_pos = float(np.sum((a - p) ** 2))
        for i in range(num_negatives):
            n = desc[g * group + 2 + i]
            d_neg = float(np.sum((a - n) ** 2))
            trip += max(0.0, 1.0 - d_neg / (d_pos + margin))
        pair += d_pos
    loss = 0.0
    if num_negatives > 0:
        loss += trip / G
    if use_pair:
        loss += pair / G
    return loss


def test_triplet_ratio_loss_matches_numpy_golden():
    rng = np.random.default_rng(0)
    for n_neg, use_pair in [(3, True), (3, False), (1, False), (0, True)]:
        group = 2 + n_neg
        desc = rng.normal(size=(6 * group, 16)).astype(np.float32)
        got = float(losses.triplet_ratio_loss(
            jnp.asarray(desc), margin=0.1, num_negatives=n_neg,
            use_pair=use_pair))
        want = _np_triplet_ratio_loss(desc, 0.1, n_neg, use_pair)
        np.testing.assert_allclose(got, want, rtol=1e-5), (n_neg, use_pair)


def test_spec_loss_two_slice_matches_numpy_golden():
    """The legacy manifold plan: triplets then pairs, terms added."""
    spec = NETWORKS["manifold"]
    rng = np.random.default_rng(1)
    desc = rng.normal(size=(330, 3)).astype(np.float32)
    got = float(losses.spec_loss(jnp.asarray(desc), spec.loss_slices,
                                 spec.margin))
    want = (_np_triplet_ratio_loss(desc[:198], 0.1, 1, False)
            + _np_triplet_ratio_loss(desc[198:], 0.1, 0, True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_curve_parity_over_recorded_batches(monkeypatch):
    """Train a few real steps; at each step, record the batch, compute the
    JAX loss AND the NumPy-golden loss from the same descriptors — the
    curves must agree pointwise (loss-curve parity, SURVEY §7 hard
    part 3)."""
    data, cfg = _cached_device_data(monkeypatch)
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    tx = caffe_sgd(cfg.learning_rate, cfg.momentum, cfg.weight_decay,
                   cfg.learning_policy, cfg.step_size, cfg.gamma)
    opt = tx.init(params)
    key = jax.random.key(7)

    curve_jax, curve_np = [], []
    for it in range(4):
        key, kb = jax.random.split(key)
        batch = build_batch(kb, jnp.int32(it), 4, data,
                            random_background=0)
        desc = apply(params, spec, batch, precision="highest")
        loss, grads = jax.value_and_grad(
            lambda p: losses.spec_loss(
                apply(p, spec, batch, precision="highest"),
                spec.loss_slices, spec.margin))(params)
        curve_jax.append(float(loss))
        curve_np.append(_np_triplet_ratio_loss(np.asarray(desc), 0.1, 3,
                                               True))
        updates, opt = tx.update(grads, opt, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(curve_jax, curve_np, rtol=1e-4)
    # and the curve reflects actual optimization, not a constant
    assert curve_jax[-1] != curve_jax[0]
