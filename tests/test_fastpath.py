"""Space-to-depth packed forward path == canonical forward path.

The fast path reassociates the conv sums (MXU packing, models/fastpath.py);
at precision='highest' both paths are plain f32 matmuls, so they must agree
to float round-off on every network variant and on raw conv+pool pairs of
assorted odd/even shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.models import NETWORKS, init_params, apply
from pose3d_tpu.models.fastpath import (apply_fast, pack_s2d_weights,
                                        s2d_conv_pool)
from pose3d_tpu.models.manifold import _ceil_maxpool2, _conv


@pytest.mark.parametrize("name", sorted(NETWORKS))
def test_apply_fast_matches_apply(name):
    spec = NETWORKS[name]
    params = init_params(jax.random.key(3), spec)
    x = jax.random.uniform(jax.random.key(4), (6, 64, 64, 7))
    a = np.asarray(apply(params, spec, x, precision="highest"))
    b = np.asarray(apply_fast(params, spec, x, precision="highest"))
    assert b.shape == a.shape
    np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * np.abs(a).max())


@pytest.mark.parametrize("h,w,kh,kw,cin,cout", [
    (64, 64, 8, 8, 4, 16),    # conv1 geometry
    (29, 29, 5, 5, 16, 7),    # conv2 geometry (odd input)
    (17, 23, 5, 5, 3, 9),     # odd/uneven everything
    (12, 12, 3, 3, 2, 5),     # even output before pool
])
def test_s2d_conv_pool_matches_conv_plus_ceilpool(h, w, kh, kw, cin, cout):
    kx, kw_, kb = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (3, h, w, cin))
    wgt = jax.random.normal(kw_, (kh, kw, cin, cout)) * 0.1
    bias = jax.random.normal(kb, (cout,))
    want = np.asarray(_ceil_maxpool2(
        _conv(x, wgt, bias, precision="highest")))
    got = np.asarray(s2d_conv_pool(x, wgt, bias, precision="highest"))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-5 * np.abs(want).max())


def test_pack_s2d_weights_tap_mapping():
    # W2[Dy, Dx, (iy,ix,c), (py,px,co)] == W[2Dy+iy-py, 2Dx+ix-px, c, co]
    kh, kw, cin, cout = 5, 5, 2, 3
    w = np.arange(kh * kw * cin * cout, dtype=np.float32).reshape(
        kh, kw, cin, cout)
    w2 = np.asarray(pack_s2d_weights(jnp.asarray(w), 2))
    kh2 = w2.shape[0]
    for Dy in range(kh2):
        for iy in range(2):
            for py in range(2):
                dy = 2 * Dy + iy - py
                for Dx in range(w2.shape[1]):
                    for ix in range(2):
                        for px in range(2):
                            dx = 2 * Dx + ix - px
                            got = w2[Dy, Dx,
                                     (iy * 2 + ix) * cin:(iy * 2 + ix + 1)
                                     * cin,
                                     (py * 2 + px) * cout:(py * 2 + px + 1)
                                     * cout]
                            if 0 <= dy < kh and 0 <= dx < kw:
                                np.testing.assert_array_equal(
                                    got, w[dy, dx])
                            else:
                                assert (got == 0).all()


def test_s2d_conv_pool_non_square_kernel():
    x = jax.random.normal(jax.random.key(5), (2, 20, 26, 3))
    wgt = jax.random.normal(jax.random.key(6), (7, 3, 3, 6)) * 0.1
    bias = jnp.zeros((6,))
    want = np.asarray(_ceil_maxpool2(
        _conv(x, wgt, bias, precision="highest")))
    got = np.asarray(s2d_conv_pool(x, wgt, bias, precision="highest"))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=2e-5 * np.abs(want).max())
