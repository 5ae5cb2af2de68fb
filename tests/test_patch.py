import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from pose3d_tpu.ops import patch as P


def reference_sample_patch(color, depth, normals, center_x, center_y, z,
                           fx, fy, m=0.2, out=64):
    """Golden model: the reference algorithm (src/datasetmanager.cpp:299-346)
    transcribed with OpenCV, including its quirks (C int truncation, clamp
    order, bilinear RGB/normals, nearest depth)."""
    H, W = depth.shape
    screen_w = int(fx * m / z)
    screen_h = int(fy * m / z)
    cx, cy = int(center_x), int(center_y)
    x = cx - screen_w // 2
    y = cy - screen_h // 2
    x = max(x, 0)
    y = max(y, 0)
    if x > W - screen_w - 1:
        x = W - screen_w - 1
    if y > H - screen_h - 1:
        y = H - screen_h - 1

    col = color[y:y + screen_h, x:x + screen_w].astype(np.float32) / 255.0
    dep = depth[y:y + screen_h, x:x + screen_w].astype(np.float32).copy()
    nor = normals[y:y + screen_h, x:x + screen_w].astype(np.float32)

    dep -= z
    np.clip(dep, -m, m, out=dep)
    dep = (dep / m + 1.0) * 0.5

    col = cv2.resize(col, (out, out))
    nor = cv2.resize(nor, (out, out))
    dep = cv2.resize(dep, (out, out), interpolation=cv2.INTER_NEAREST)
    return np.concatenate([col, dep[..., None], nor], axis=-1)


def _scene(H=480, W=640, seed=0):
    rng = np.random.default_rng(seed)
    color = rng.integers(0, 256, size=(H, W, 3)).astype(np.float32)
    depth = (0.4 + 0.3 * rng.random((H, W))).astype(np.float32)
    depth[rng.random((H, W)) < 0.05] = 0.0  # holes
    normals = rng.normal(size=(H, W, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    return color, depth, normals


FX, FY = 572.4114, 573.5704


@pytest.mark.parametrize("cx,cy,z", [
    (320.0, 240.0, 0.6),
    (320.7, 239.2, 0.4),     # non-integer center (C truncation)
    (30.0, 25.0, 0.65),      # near top-left corner (clamp)
    (630.0, 470.0, 0.72),    # near bottom-right corner (clamp)
])
def test_patch_matches_opencv_reference(cx, cy, z):
    color, depth, normals = _scene()
    want = reference_sample_patch(color, depth, normals, cx, cy, z, FX, FY)
    got = np.asarray(P.sample_patch(
        jnp.asarray(color), jnp.asarray(depth), jnp.asarray(normals),
        jnp.float32(cx), jnp.float32(cy), jnp.float32(z), fx=FX, fy=FY))
    assert got.shape == (64, 64, 7)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_background_depth_is_exact_zero():
    # d = 0 -> demeaned to -z, clamped to -m -> mapped to exactly 0: this bit
    # is the background mask the filler keys on (reference src/bgfill.cpp:106)
    color, depth, normals = _scene(seed=1)
    depth[200:280, 280:360] = 0.0
    got = np.asarray(P.sample_patch(
        jnp.asarray(color), jnp.asarray(depth), jnp.asarray(normals),
        jnp.float32(320), jnp.float32(240), jnp.float32(0.6), fx=FX, fy=FY))
    assert (got[..., 3] == 0.0).any()


def test_batched_matches_single():
    color, depth, normals = _scene(seed=2)
    colors = np.stack([color, color])
    depths = np.stack([depth, depth])
    nors = np.stack([normals, normals])
    cxs = np.array([320.0, 100.0], np.float32)
    cys = np.array([240.0, 100.0], np.float32)
    zs = np.array([0.6, 0.5], np.float32)
    batch = np.asarray(P.sample_patches(
        jnp.asarray(colors), jnp.asarray(depths), jnp.asarray(nors),
        jnp.asarray(cxs), jnp.asarray(cys), jnp.asarray(zs), fx=FX, fy=FY))
    for i in range(2):
        single = np.asarray(P.sample_patch(
            jnp.asarray(colors[i]), jnp.asarray(depths[i]),
            jnp.asarray(nors[i]), jnp.float32(cxs[i]), jnp.float32(cys[i]),
            jnp.float32(zs[i]), fx=FX, fy=FY))
        np.testing.assert_allclose(batch[i], single, atol=1e-6)
