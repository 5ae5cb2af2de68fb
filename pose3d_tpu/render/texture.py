"""Per-pixel texture mapping through the affine-row rasterizer.

The reference textures OBJ models in fixed-function GL: per-vertex texture
coordinates are interpolated perspective-correctly across each triangle and
the bound texture is sampled per fragment (reference src/model.cpp:29-71,
texture load/preprocess :337-351).

TPU-native formulation: the rasterizer already interpolates three per-vertex
"color" channels as affine rows ``attr*zinv*edge`` with a perspective divide
in the epilogue (rasterizer._face_matrix).  Feeding ``(u, v, 0)`` as those
channels yields per-pixel perspective-correct texture coordinates from the
SAME validated kernels (brute/tiled/Pallas — bit-identical across paths);
a texel gather epilogue then produces the textured color image.  Covered
pixels are identified by depth > 0 (the background contract).

Sampling is GL_NEAREST at the preprocessed texture resolution (the
reference binds a /6-downscaled texture, so its effective sampling density
is comparable).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_texture_nearest(u: jnp.ndarray, v: jnp.ndarray,
                           texture: jnp.ndarray) -> jnp.ndarray:
    """Nearest-texel gather.  u, v [...,] in [0, 1] (GL convention, v up —
    the loader pre-flips the image rows); texture [th, tw, 3].
    Returns [..., 3]."""
    th, tw = texture.shape[0], texture.shape[1]
    x = jnp.clip((u * tw).astype(jnp.int32), 0, tw - 1)
    y = jnp.clip((v * th).astype(jnp.int32), 0, th - 1)
    return texture[y, x]


def render_view_textured(vertices: jnp.ndarray, faces: jnp.ndarray,
                         tcoords: jnp.ndarray, texture: jnp.ndarray,
                         pose: jnp.ndarray, K: jnp.ndarray,
                         width: int, height: int, x0=0, y0=0,
                         tile: int = 32, capacity: int = 1024,
                         face_chunk: int = 256,
                         use_pallas: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render one view with per-pixel texturing.

    Same contract as rasterizer_tiled.render_view_tiled but colors come
    from ``texture`` sampled at the interpolated ``tcoords`` instead of
    per-vertex colors.  Returns (color [h, w, 3] BGR in [0, 1], depth).
    """
    uv_attr = jnp.concatenate(
        [tcoords, jnp.zeros((tcoords.shape[0], 1), tcoords.dtype)], axis=1)
    if use_pallas:
        from pose3d_tpu.render.rasterizer_pallas import \
            render_view_tiled_pallas as _render
    else:
        from pose3d_tpu.render.rasterizer_tiled import \
            render_view_tiled as _render
    uv_img, depth = _render(vertices, faces, uv_attr, pose, K,
                            width=width, height=height, x0=x0, y0=y0,
                            tile=tile, capacity=capacity,
                            face_chunk=face_chunk)
    rgb = sample_texture_nearest(uv_img[..., 0], uv_img[..., 1], texture)
    color = jnp.where((depth > 0.0)[..., None], rgb, 0.0)
    return color, depth
