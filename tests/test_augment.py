import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.data import augment


def _patch_with_background(seed=0):
    """A synthetic patch whose depth channel has an exact-zero background
    region (the mask contract from ops/patch.py)."""
    rng = np.random.default_rng(seed)
    p = rng.random((64, 64, 7)).astype(np.float32)
    p[..., 3] = 0.6
    p[:20, :, 3] = 0.0          # background band
    p[40:, 50:, 3] = 0.0
    return jnp.asarray(p)


def _bg_mask(p):
    return np.asarray(p)[..., 3] == 0.0


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_fill_modes_replace_background_only(mode):
    p = _patch_with_background()
    batch = jnp.stack([p, p])
    out = np.asarray(augment.random_fill(jax.random.key(0), batch, mode))
    orig = np.asarray(batch)
    mask = _bg_mask(p)
    # background region changed
    assert not np.allclose(out[0][mask], orig[0][mask])
    # interior foreground (eroded past dilation + outline smoothing) intact
    interior = ~mask.copy()
    interior[:24] = False
    interior[36:] = False
    interior[:, :4] = False
    interior[:, -4:] = False
    np.testing.assert_allclose(out[0][interior], orig[0][interior], atol=1e-6)
    # per-sample keys: the two batch rows differ
    assert not np.allclose(out[0][mask], out[1][mask])


def test_mode_zero_is_identity():
    p = _patch_with_background()
    batch = jnp.stack([p])
    out = augment.random_fill(jax.random.key(0), batch, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))


def test_mode_minus_one_mixes_modes():
    p = _patch_with_background()
    batch = jnp.stack([p] * 12)
    out = np.asarray(augment.random_fill(jax.random.key(1), batch, -1))
    mask = _bg_mask(p)
    fills = np.stack([o[mask] for o in out])
    # at least two distinct fill styles in 12 samples
    assert len({np.round(f.std(), 3) for f in fills}) >= 2


def test_color_fill_statistics():
    p = _patch_with_background()
    out = np.asarray(augment.color_fill(jax.random.key(0), p))
    vals = out[_bg_mask(p)]
    assert 0.0 <= vals.min() and vals.max() <= 1.0
    assert abs(vals.mean() - 0.5) < 0.05      # uniform noise


def test_shape_fill_depth_center_convention():
    # fill an all-background patch: canvas depth is renormalized to ~0.6 at
    # the canvas center before crop, values clamped to <= 1 (+ tiny noise)
    p = jnp.zeros((64, 64, 7))
    out = np.asarray(augment.shape_fill(jax.random.key(2), p))
    d = out[..., 3]
    assert d.max() <= 1.05
    assert 0.2 < np.median(d) < 1.0


def test_fractal_fill_rgb_channels_equal():
    # the reference writes the same grayscale field into all 3 RGB channels
    p = jnp.zeros((64, 64, 7))
    out = np.asarray(augment.fractal_fill(jax.random.key(3), p))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 0], out[..., 2], atol=1e-6)
    assert out[..., 3].std() > 0.01


def test_real_fill_uses_bank_and_rescales_depth():
    from pose3d_tpu.data.backgrounds import synthetic_crop_bank
    bank = jnp.asarray(synthetic_crop_bank(8, seed=1))
    p = _patch_with_background()
    out = np.asarray(augment.random_fill(jax.random.key(4),
                                         jnp.stack([p]), 4, bank=bank))
    d = out[0][..., 3]
    mask = _bg_mask(p)
    assert d[mask].max() <= 1.0 + 1e-6
    assert d[mask].min() >= 0.0
    # foreground depth untouched
    assert np.allclose(d[~mask][100:200], 0.6)


def test_real_fill_without_bank_raises():
    p = jnp.stack([_patch_with_background()])
    with pytest.raises(ValueError):
        augment.random_fill(jax.random.key(0), p, 4)
