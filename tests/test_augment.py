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


def test_fuzz_median3_matches_numpy_median():
    """The 19-exchange Paeth median-of-9 network (_median3) must equal a
    direct np.median over the same replicate-padded 3x3 taps on random
    inputs — cv::medianBlur semantics (reference uses medianBlur on the
    outline band, src/bgfill.cpp:136-158)."""
    from pose3d_tpu.data.augment import _median3
    rng = np.random.default_rng(31)
    for _ in range(5):
        img = rng.random((16, 12, 3)).astype(np.float32)
        got = np.asarray(_median3(jnp.asarray(img)))
        pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
        taps = np.stack([pad[1 + dy:1 + dy + 16, 1 + dx:1 + dx + 12]
                         for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        np.testing.assert_array_equal(got, np.median(taps, axis=0))


def test_fuzz_mask_morphology_matches_numpy():
    """3x3 dilate/erode/outline of the zero-depth mask vs a direct NumPy
    transcription (zero-padded window max/min, cv::dilate/erode defaults)
    on random sparse masks (reference src/bgfill.cpp:106-113)."""
    from pose3d_tpu.data.augment import _mask_and_outline
    rng = np.random.default_rng(37)
    for _ in range(5):
        depth = np.where(rng.random((20, 15)) < 0.4, 0.0,
                         rng.random((20, 15))).astype(np.float32)
        m, dil, outline = (np.asarray(a) for a in
                           _mask_and_outline(jnp.asarray(depth)))
        ref_m = depth == 0.0
        # cv2 default morphology borders: dilate pads -max (outside counts
        # background), erode pads +max (outside counts foreground)
        pad = np.pad(ref_m, 1, mode="constant", constant_values=False)
        win = np.stack([pad[1 + dy:21 + dy, 1 + dx:16 + dx]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        ref_dil = win.any(axis=0)
        pad_t = np.pad(ref_m, 1, mode="constant", constant_values=True)
        win_t = np.stack([pad_t[1 + dy:21 + dy, 1 + dx:16 + dx]
                          for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        ref_ero = win_t.all(axis=0)
        np.testing.assert_array_equal(m, ref_m)
        np.testing.assert_array_equal(dil, ref_dil)
        np.testing.assert_array_equal(outline, ref_dil & ~ref_ero)
