"""Simplex-fractal noise for background augmentation, as a jnp program.

Reproduces the only FastNoise path the reference exercises — 2-D
SimplexFractal FBM with frequency 0.01, gain 0.5, 3 octaves, lacunarity 2
(reference src/bgfill.cpp:249-252; defaults include/FastNoise.h:156-158) —
fully vectorized over the pixel grid.  FastNoise's (non-standard) constants
are kept: F2 = 1/2, G2 = 1/4, contribution radius 0.5, final scale 50, and
the 12-entry axis gradient set (src/FastNoise.cpp:34-44, 1205-1259).

The reference's bundled FastNoise was patched to seed its permutation table
from ``std::random_device`` (src/FastNoise.cpp:192), i.e. every fill draws a
fresh pattern regardless of ``SetSeed(0)`` — so the rebuild matches the
*distribution* with a keyed permutation (make_permutation), per the RNG
discipline in SURVEY.md §7.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_F2 = 0.5
_G2 = 0.25
# 12 gradients: 8 diagonal/axis pairs + 4 axis-only, FastNoise's table.
# (NumPy constants: module-level jnp arrays would initialize the backend at
# import time, which breaks late platform selection.)
import numpy as _np  # noqa: E402

_GRAD_X = _np.array([1, -1, 1, -1, 1, -1, 1, -1, 0, 0, 0, 0], _np.float32)
_GRAD_Y = _np.array([1, 1, -1, -1, 0, 0, 0, 0, 1, -1, 1, -1], _np.float32)

FRACTAL_BOUNDING = 1.0 / 1.75  # 1 / (1 + g + g^2) for gain 0.5, 3 octaves


def make_permutation(key: jax.Array) -> jnp.ndarray:
    """Random permutation table [512] int32 (doubled, like FastNoise)."""
    p = jax.random.permutation(key, 256).astype(jnp.int32)
    return jnp.concatenate([p, p])


def _hash12(perm: jnp.ndarray, offset: jnp.ndarray, i: jnp.ndarray,
            j: jnp.ndarray) -> jnp.ndarray:
    """Index2D_12: perm-of-perm lattice hash into the 12-gradient table."""
    return perm[(i & 255) + perm[(j & 255) + offset]] % 12


def _grad_dot(perm, offset, i, j, xd, yd):
    g = _hash12(perm, offset, i, j)
    return xd * jnp.asarray(_GRAD_X)[g] + yd * jnp.asarray(_GRAD_Y)[g]


def _single_simplex(perm: jnp.ndarray, offset: jnp.ndarray,
                    x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Gustavson 2-D simplex noise with FastNoise constants; x, y any shape."""
    s = (x + y) * _F2
    i = jnp.floor(x + s).astype(jnp.int32)
    j = jnp.floor(y + s).astype(jnp.int32)

    t = (i + j).astype(jnp.float32) * _G2
    x0 = x - (i.astype(jnp.float32) - t)
    y0 = y - (j.astype(jnp.float32) - t)

    upper = x0 > y0
    i1 = jnp.where(upper, 1, 0)
    j1 = 1 - i1

    x1 = x0 - i1.astype(jnp.float32) + _G2
    y1 = y0 - j1.astype(jnp.float32) + _G2
    x2 = x0 - 1.0 + 2.0 * _G2
    y2 = y0 - 1.0 + 2.0 * _G2

    def corner(xd, yd, ii, jj):
        t = 0.5 - xd * xd - yd * yd
        t = jnp.maximum(t, 0.0)
        t2 = t * t
        return t2 * t2 * _grad_dot(perm, offset, ii, jj, xd, yd)

    n0 = corner(x0, y0, i, j)
    n1 = corner(x1, y1, i + i1, j + j1)
    n2 = corner(x2, y2, i + 1, j + 1)
    return 50.0 * (n0 + n1 + n2)


@partial(jax.jit, static_argnames=("shape", "frequency", "octaves",
                                   "lacunarity", "gain"))
def simplex_fractal(perm: jnp.ndarray, shape: tuple,
                    frequency: float = 0.01, octaves: int = 3,
                    lacunarity: float = 2.0, gain: float = 0.5) -> jnp.ndarray:
    """FBM simplex fractal sampled on an integer grid of ``shape`` (H, W).

    Value range ~[-1, 1].  Per-octave lattice offsets come from the
    permutation table itself, as in FastNoise's SingleSimplexFractalFBM.
    """
    H, W = shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) * frequency
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) * frequency

    bounding = 1.0 / sum(gain ** o for o in range(octaves))
    total = jnp.zeros((H, W), jnp.float32)
    amp = 1.0
    for o in range(octaves):
        total = total + amp * _single_simplex(perm, perm[o], xs, ys)
        xs = xs * lacunarity
        ys = ys * lacunarity
        amp *= gain
    return total * bounding
