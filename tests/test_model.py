import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.models import NETWORKS, apply, init_params
from pose3d_tpu.models import losses


def _patches(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n, 64, 64, 7), np.float32))


@pytest.mark.parametrize("name", sorted(NETWORKS))
def test_forward_shapes(name):
    spec = NETWORKS[name]
    params = init_params(jax.random.key(0), spec)
    out = apply(params, spec, _patches(10))
    dim = spec.bin_dim if spec.bin_head else spec.desc_dim
    assert out.shape == (10, dim)
    assert np.isfinite(np.asarray(out)).all()


def test_caffe_pooling_arithmetic():
    # 64 -> conv8(valid) 57 -> ceil-pool 29 -> conv5(valid) 25 -> ceil-pool 13
    # so fc1 fan-in must be 7*13*13 = 1183, matching Caffe's blob shapes.
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    assert params["fc1"]["w"].shape == (1183, 256)


def test_bin_head_toggle():
    spec = NETWORKS["manifold_rgbdnor_16_bin"]
    params = init_params(jax.random.key(1), spec)
    trunk = apply(params, spec, _patches(4), bin_head=False)
    head = apply(params, spec, _patches(4), bin_head=True)
    assert trunk.shape == (4, 16)
    assert head.shape == (4, 128)


def test_prelu_is_learned_and_used():
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    x = _patches(5, seed=3)
    base = np.asarray(apply(params, spec, x))
    params2 = jax.tree.map(lambda v: v, params)
    params2["prelu1"]["a"] = params["prelu1"]["a"] * 0.0
    changed = np.asarray(apply(params2, spec, x))
    assert not np.allclose(base, changed)


def test_forward_jits_and_grads():
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    x = _patches(spec.batch_size, seed=4)

    @jax.jit
    def loss_fn(p):
        d = apply(p, spec, x)
        return losses.spec_loss(d, spec.loss_slices, spec.margin)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda v: np.abs(np.asarray(v)).sum(),
                                        g))
    assert all(np.isfinite(v) for v in flat)
    assert sum(flat) > 0


def test_triplet_loss_hand_computed():
    # one group, D=1: a=0, p=1, n0=3, n1=0.5, n2=10
    desc = jnp.asarray([[0.0], [1.0], [3.0], [0.5], [10.0]])
    m = 0.1
    d_pos = 1.0
    d_negs = [9.0, 0.25, 100.0]
    want_triplet = sum(max(0.0, 1.0 - dn / (d_pos + m)) for dn in d_negs)
    want = want_triplet + d_pos
    got = float(losses.triplet_ratio_loss(desc, margin=m, num_negatives=3,
                                          use_pair=True))
    assert abs(got - want) < 1e-6


def test_triplet_loss_zero_when_far():
    # perfectly separated: pusher far, anchor == puller -> only pair term 0
    desc = jnp.asarray([[0.0, 0.0], [0.0, 0.0], [100.0, 0.0],
                        [0.0, 100.0], [70.0, 70.0]])
    got = float(losses.triplet_ratio_loss(desc, num_negatives=3,
                                          use_pair=True))
    assert got == 0.0


def test_spec_loss_slices():
    # the manifold viz net: triplets on [0,198), pairs on [198,330)
    spec = NETWORKS["manifold"]
    desc = jnp.asarray(np.random.default_rng(0).normal(size=(330, 3)),
                       dtype=jnp.float32)
    v = float(losses.spec_loss(desc, spec.loss_slices, spec.margin))
    assert np.isfinite(v) and v > 0


def test_binarization_loss_saturation_term():
    logits = jnp.zeros((10, 8))  # sigmoid = 0.5 everywhere: max saturation
    v = float(losses.binarization_loss(logits, beta=1.0))
    sat = 8 * 0.25
    trip = 3.0  # d_pos = 0, all ratios 0 -> 3*max(0,1-0) per group
    assert abs(v - (sat + trip)) < 1e-5


@pytest.mark.parametrize("name", ["manifold_rgbd_16", "manifold_rgbdnor_16"])
def test_fused_stem_matches_reference_path(name):
    # the parity-packed conv+pool stem computes the same multiply-add terms
    # as conv -> ceil-maxpool, only reassociated: fwd and grads must agree
    # to f32 reassociation tolerance (covers PReLU and ELU trunks, C=4/7)
    spec = NETWORKS[name]
    params = init_params(jax.random.key(1), spec)
    x = _patches(5, seed=3)

    a = apply(params, spec, x, precision="highest", fused_stem=False)
    b = apply(params, spec, x, precision="highest", fused_stem=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)

    def loss(p, fused):
        return jnp.sum(apply(p, spec, x, precision="highest",
                             fused_stem=fused) ** 2)
    ga = jax.grad(lambda p: loss(p, False))(params)
    gb = jax.grad(lambda p: loss(p, True))(params)
    for u, v in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        scale = float(jnp.max(jnp.abs(u))) + 1e-12
        np.testing.assert_allclose(np.asarray(u) / scale,
                                   np.asarray(v) / scale,
                                   rtol=5e-5, atol=5e-5)


def test_bf16_mode_keeps_f32_descriptors():
    # bf16 compute mode streams the trunk intermediates at 2 bytes but the
    # descriptor head still accumulates/emits f32 for mining stability
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    d = apply(params, spec, _patches(6), compute_dtype=jnp.bfloat16)
    assert d.dtype == jnp.float32
    ref = apply(params, spec, _patches(6))
    err = float(jnp.max(jnp.abs(d - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.05, err  # bf16 noise, not garbage
