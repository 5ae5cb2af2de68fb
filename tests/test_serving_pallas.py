"""Parity tests for the fused serving stem (models/serving_pallas.py).

Runs the Pallas kernels in interpreter mode on the CPU test backend and
checks them against the straight-line XLA reference semantics: valid conv
(bf16 multiplies, f32 accumulation — the TPU-default precision of the
production XLA path) -> Caffe ceil-mode maxpool2 (models/manifold.py) ->
bias -> activation, per trunk stage.  Covers all activations/channel
widths, non-dividing batch padding, and the full serving_apply forward
(including the binarization head) against manifold.apply.

Tolerances: stage 1 agrees to f32 accumulation-order noise (~5e-7
absolute, verified against an f64 transcription); the full stem admits
~1e-3 because the stage-boundary bf16 cast re-rounds values that differ
only in f32 rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pose3d_tpu.models import NETWORKS, init_params
from pose3d_tpu.models import manifold as M
from pose3d_tpu.models import serving_pallas as SP


def _ref_stem(params, spec, x):
    """conv(bf16 multiplies) -> ceil maxpool2 -> bias -> act, twice."""
    if x.shape[-1] != spec.in_channels:
        x = x[..., jnp.array(spec.channels)]

    def stage(x, w, b, name):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
            "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return M._act(spec, params, name, M._ceil_maxpool2(y) + b)

    y = stage(x, params["conv1"]["w"], params["conv1"]["b"], "prelu1")
    return stage(y, params["conv2"]["w"], params["conv2"]["b"], "prelu2")


@pytest.mark.parametrize("net", ["manifold_rgbd_16",    # PReLU, 4 ch
                                 "manifold_rgbdnor_16",  # ELU, 7 ch
                                 "manifold_rgb_16",      # ELU, 3 ch
                                 "manifold_wang"])       # ReLU, 4 ch
def test_stem_matches_xla(net):
    spec = NETWORKS[net]
    params = init_params(jax.random.key(1), spec)
    rng = np.random.default_rng(0)
    # block=2 with N=5 also exercises the non-dividing batch pad
    x = jnp.asarray(rng.random((5, 64, 64, 7)).astype(np.float32))
    ref = _ref_stem(params, spec, x)
    got = SP.stem_pallas(params, spec, x, block=2, interpret=True)
    assert got.shape == ref.shape == (5, 13, 13, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_stage1_exact_to_f32_rounding():
    """Stage 1 alone matches the XLA conv+pool+act to f32 accumulation
    noise (no bf16 re-rounding in between)."""
    import functools
    from pose3d_tpu.models.serving_pallas import (
        _pack_w1, _stage1_kernel, _call_stage, _tiled, _HC1, _GO1)
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(1), spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((5, 64, 64, 7)).astype(np.float32))

    x9 = x[..., :4].astype(jnp.bfloat16).reshape(5, 64, 8, 32)
    x9 = jnp.pad(x9, ((0, 0), (0, 0), (0, 1), (0, 0)))
    xg = jnp.concatenate([x9[:, :, :8, :], x9[:, :, 1:, :]], axis=-1)
    w1 = _pack_w1(params["conv1"]["w"], 4).astype(jnp.bfloat16)
    k1 = functools.partial(_stage1_kernel, act="prelu", cp=4,
                           out_dtype=jnp.float32)
    y1 = _call_stage(k1, xg, w1, _tiled(params["conv1"]["b"], 4),
                     _tiled(params["prelu1"]["a"], 4), 5, _HC1, _GO1,
                     _GO1 + 1, 64, 512, jnp.float32, True)
    got = np.asarray(y1).reshape(5, 29, 36, 16)[:, :, :29, :]

    ref = jax.lax.conv_general_dilated(
        x[..., :4].astype(jnp.bfloat16),
        params["conv1"]["w"].astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    ref = M._act(spec, params, "prelu1",
                 M._ceil_maxpool2(ref) + params["conv1"]["b"])
    np.testing.assert_allclose(got, np.asarray(ref), atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("net", ["manifold_rgbd_16", "manifold_wang"])
def test_serving_apply_matches_apply(net):
    """Full fused forward vs manifold.apply — identical terms modulo bf16
    multiply rounding (the CPU reference multiplies in f32, so the
    tolerance is the bf16 mantissa, ~1e-2 relative)."""
    spec = NETWORKS[net]
    params = init_params(jax.random.key(1), spec)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((6, 64, 64, 7)).astype(np.float32))
    ref = M.apply(params, spec, x)
    got = SP.serving_apply(params, spec, x, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05 * scale, rtol=0.1)


def test_serving_apply_bin_head():
    """The binarization head rides the fused trunk."""
    spec = NETWORKS["manifold_rgbdnor_16_bin"]
    params = init_params(jax.random.key(2), spec)
    x = jnp.asarray(np.random.default_rng(4).random((4, 64, 64, 7))
                    .astype(np.float32))
    ref = M.apply(params, spec, x)
    got = SP.serving_apply(params, spec, x, interpret=True)
    assert got.shape == ref.shape == (4, spec.bin_dim)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.05 * scale, rtol=0.1)


def test_descriptor_fn_auto_stays_xla_on_cpu():
    """use_pallas=None auto-detection keeps the XLA path on the CPU test
    backend (bit-identical to apply)."""
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    x = jnp.asarray(np.random.default_rng(0).random((3, 64, 64, 7))
                    .astype(np.float32))
    fn = M.descriptor_fn(spec)
    np.testing.assert_array_equal(np.asarray(fn(params, x)),
                                  np.asarray(M.apply(params, spec, x)))
