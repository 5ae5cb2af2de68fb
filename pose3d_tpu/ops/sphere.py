"""Viewpoint-sphere sampling and look-at pose construction.

Replaces the reference ``SphereRenderer`` pose math (reference src/sphere.cpp)
with vectorized NumPy (one-shot, init-time: vertex counts are tiny) and jnp
pose assembly.  Vertex *ordering* is preserved: template indices double as
pose identities in the similarity tables, so the recursive-subdivision
emission order matters for cache interop.

Key invariants (validated in tests/test_sphere.py):
  * icosphere(depth=2) -> 162 vertices, depth=3 -> 642;
  * per-view pose = Rz(inplane_deg) @ lookat(vertex), translation (0,0,scale)
    (reference src/sphere.cpp:27-34);
  * view order = scale-major, then vertex, then in-plane rotation, skipping
    the lower hemisphere (z < 0) (reference src/sphere.cpp:69-131).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

# Golden-ratio icosahedron: 12 vertices, 20 faces (standard construction,
# reference src/sphere.cpp:185-226 uses the same canonical table).
_X = 0.525731112119133606
_Z = 0.850650808352039932

_ICO_VERTS = np.array([
    [-_X, 0.0, +_Z], [+_X, 0.0, +_Z], [-_X, 0.0, -_Z], [+_X, 0.0, -_Z],
    [0.0, +_Z, +_X], [0.0, +_Z, -_X], [0.0, -_Z, +_X], [0.0, -_Z, -_X],
    [+_Z, +_X, 0.0], [-_Z, +_X, 0.0], [+_Z, -_X, 0.0], [-_Z, -_X, 0.0],
], dtype=np.float64)

_ICO_FACES = [
    (0, 4, 1), (0, 9, 4), (9, 5, 4), (4, 5, 8), (4, 8, 1),
    (8, 10, 1), (8, 3, 10), (5, 3, 8), (5, 2, 3), (2, 7, 3),
    (7, 10, 3), (7, 6, 10), (7, 11, 6), (11, 0, 6), (0, 1, 6),
    (6, 1, 10), (9, 0, 11), (9, 11, 2), (9, 2, 5), (7, 2, 11),
]


def icosphere(depth: int) -> np.ndarray:
    """Unit sphere vertices by recursive triangle subdivision, dedup in
    emission order.  depth=2 -> 162 verts, depth=3 -> 642.  float32 [N, 3]."""
    verts: List[np.ndarray] = []

    def emit(v: np.ndarray) -> None:
        for u in verts:
            if np.array_equal(u, v):
                return
        verts.append(v)

    def norm(v: np.ndarray) -> np.ndarray:
        return (v / np.linalg.norm(v)).astype(np.float32)

    def subdivide(v1, v2, v3, d):
        if d == 0:
            emit(v1)
            emit(v2)
            emit(v3)
            return
        v12, v23, v31 = norm(v1 + v2), norm(v2 + v3), norm(v3 + v1)
        subdivide(v1, v12, v31, d - 1)
        subdivide(v2, v23, v12, d - 1)
        subdivide(v3, v31, v23, d - 1)
        subdivide(v12, v23, v31, d - 1)

    base = [norm(v) for v in _ICO_VERTS]
    for a, b, c in _ICO_FACES:
        subdivide(base[a], base[b], base[c], depth)

    out = np.stack(verts).astype(np.float64)
    out /= np.linalg.norm(out, axis=1, keepdims=True)
    return out.astype(np.float32)


def elaz_sphere(inc_steps: int, azi_steps: int) -> np.ndarray:
    """Inclination/azimuth sphere sampling (reference src/sphere.cpp:230-244):
    the pole first, then rows of constant inclination."""
    pts = [np.array([0.0, 0.0, 1.0])]
    for i in range(1, inc_steps):
        inc = np.pi * i / inc_steps
        for j in range(azi_steps):
            azi = 2.0 * np.pi * j / azi_steps
            pts.append(np.array([np.sin(inc) * np.cos(azi),
                                 np.sin(inc) * np.sin(azi),
                                 np.cos(inc)]))
    return np.stack(pts).astype(np.float32)


def lookat_rotation(eye: np.ndarray) -> np.ndarray:
    """Camera rotation looking from ``eye`` (on the unit sphere) at the origin.

    Matches ``computeRotation`` (reference src/sphere.cpp:134-143): up is +z
    except exactly at the poles where it flips to (-1,0,0); columns built as
    (right, up', forward) and the matrix returned transposed (world->cam).
    Accepts [3] or [N, 3]; returns [3, 3] or [N, 3, 3], float32.
    """
    single = eye.ndim == 1
    e = np.atleast_2d(np.asarray(eye, dtype=np.float64))
    n = e / np.linalg.norm(e, axis=1, keepdims=True)

    at_pole = (e[:, 0] == 0) & (e[:, 1] == 0) & (e[:, 2] != 0)
    up = np.where(at_pole[:, None],
                  np.array([-1.0, 0.0, 0.0]),
                  np.array([0.0, 0.0, 1.0]))

    fwd = -n                                            # col 2
    right = np.cross(fwd, up)                           # col 0
    right /= np.linalg.norm(right, axis=1, keepdims=True)
    upn = np.cross(right, -fwd)                         # col 1
    R = np.stack([right, upn, fwd], axis=2)             # columns
    R = np.transpose(R, (0, 2, 1))                      # reference transposes
    R = R.astype(np.float32)
    return R[0] if single else R


def inplane_rotz(angle_deg: np.ndarray) -> np.ndarray:
    """Rotation about +z by ``angle_deg`` degrees; [..., 3, 3] float32."""
    a = np.deg2rad(np.asarray(angle_deg, dtype=np.float64))
    c, s = np.cos(a), np.sin(a)
    zero, one = np.zeros_like(c), np.ones_like(c)
    R = np.stack([c, -s, zero, s, c, zero, zero, zero, one], axis=-1)
    return R.reshape(R.shape[:-1] + (3, 3)).astype(np.float32)


def _arange_inclusive(start: float, step: float, stop: float) -> np.ndarray:
    """C-style ``for (i = start; i <= stop; i += step)`` enumeration."""
    vals = []
    v = start
    while v <= stop + 1e-9:
        vals.append(v)
        v += step
    return np.asarray(vals, dtype=np.float64)


@lru_cache(maxsize=16)
def _create_view_poses_cached(subdiv: int, scales, inplane_rots,
                              skip_lower_hemisphere: bool
                              ) -> Tuple[np.ndarray, np.ndarray]:
    rots = _arange_inclusive(*inplane_rots)
    scas = _arange_inclusive(*scales)
    sphere = icosphere(subdiv)

    keep = sphere[:, 2] >= 0 if skip_lower_hemisphere else np.ones(
        len(sphere), dtype=bool)
    # NOTE: reference skips (z < 0), i.e. keeps z == 0 ring.
    kept = sphere[keep]

    look = lookat_rotation(kept)                       # [K, 3, 3]
    rotz = inplane_rotz(rots)                          # [R, 3, 3]

    # reference enumeration order scale -> vertex -> inplane as one
    # broadcast batch (a Python triple loop here costs seconds per call at
    # subdiv 3 — it used to be 40% of warm per-mesh generation time)
    S, Kn, R = len(scas), len(kept), len(rots)
    rk = np.einsum("rab,kbc->krac", rotz.astype(np.float64),
                   look.astype(np.float64)).astype(np.float32)  # [K, R, 3, 3]
    T = np.zeros((S, Kn, R, 4, 4), np.float32)
    T[..., :3, :3] = rk[None]
    T[..., 2, 3] = np.asarray(scas, np.float32)[:, None, None]
    T[..., 3, 3] = 1.0
    verts = np.broadcast_to(kept[None, :, None, :],
                            (S, Kn, R, 3)).reshape(-1, 3).copy()
    return T.reshape(-1, 4, 4), verts


def create_view_poses(subdiv: int,
                      scales: Tuple[float, float, float] = (0.4, 1.1, 1.0),
                      inplane_rots: Tuple[float, float, float] = (-45, 15, 45),
                      skip_lower_hemisphere: bool = True,
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Enumerate all rendered view poses in the reference's order.

    ``scales`` and ``inplane_rots`` are (start, step, stop) triples as in
    ``createViews`` (reference src/sphere.cpp:69-131; defaults from
    src/datasetmanager.cpp:503-507).  Returns:
      poses  float32 [V, 4, 4] — world->cam isometries
             (R = Rz(rot) @ lookat(vertex), t = (0, 0, scale));
      verts  float32 [V, 3]   — the sphere vertex of each view.

    Memoized on the (hashable) arguments — every mesh of a dataset
    enumerates the same sphere, so the ~3k-pose batch is built once per
    process.  Callers get defensive copies.
    """
    poses, verts = _create_view_poses_cached(
        int(subdiv), tuple(float(s) for s in scales),
        tuple(float(r) for r in inplane_rots), bool(skip_lower_hemisphere))
    return poses.copy(), verts.copy()
