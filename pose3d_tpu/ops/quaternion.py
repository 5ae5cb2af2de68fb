"""Quaternion utilities matching Eigen's conventions.

The reference stores pose labels as Eigen coefficient order ``(x, y, z, w)``
(reference src/datasetmanager.cpp:487-489 via ``Quaternionf::coeffs()``) and
measures pose similarity with ``Quaternionf::angularDistance`` (reference
src/datasetmanager.cpp:639,708).  These functions reproduce that math as
vectorized jnp ops; the pairwise variants are MXU matmuls.

All quaternions here are float arrays ``[..., 4]`` in ``(x, y, z, w)`` order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (x, y, z, w).

    Branch-free Shepperd method: computes all four candidate solutions and
    selects by the largest pivot, matching Eigen's ``Quaternion(Matrix3)``
    up to overall sign (quaternion double cover; angularDistance is invariant).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*component^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                   axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                   axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                   axis=-1)
    # candidates[..., i, :] is the (w,x,y,z) vector built around pivot i
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)

    pivots = jnp.stack(
        [1.0 + tr,
         1.0 + m00 - m11 - m22,
         1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)

    chosen = jnp.take_along_axis(
        cand, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    wxyz = chosen / jnp.linalg.norm(chosen, axis=-1, keepdims=True)
    # (w,x,y,z) -> (x,y,z,w)
    return jnp.concatenate([wxyz[..., 1:], wxyz[..., :1]], axis=-1)


def matrix_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (x,y,z,w) -> rotation matrix [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def angular_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Eigen ``angularDistance``: rotation angle between two unit quaternions.

    Eigen computes ``2*atan2(|vec(d)|, |w(d)|)`` for ``d = q1 * conj(q2)``;
    for unit quaternions this equals ``2*atan2(sqrt(1-dot^2), |dot|)`` with
    ``dot = <q1, q2>``, which is what we use (a single fused dot product).
    Result in radians, range [0, pi].
    """
    dot = jnp.sum(q1 * q2, axis=-1)
    dot = jnp.clip(dot, -1.0, 1.0)
    return 2.0 * jnp.arctan2(jnp.sqrt(jnp.maximum(0.0, 1.0 - dot * dot)),
                             jnp.abs(dot))


def pairwise_angular_distance(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """All-pairs angular distance: [N,4] x [M,4] -> [N,M] radians.

    The dot-product matrix rides the MXU; the arctan2 epilogue fuses on the
    VPU.  This one matmul replaces the reference's O(N*M) scalar CPU loops
    (reference src/datasetmanager.cpp:631-644, 687-734).

    precision=HIGHEST: the distance derivative w.r.t. the dot is 2/sqrt(1-d^2),
    so backend fast-math matmuls (3e-3 abs error observed on XLA CPU) would
    corrupt nearest-template selection.
    """
    dot = jnp.clip(jnp.matmul(qa, qb.T, precision="highest"), -1.0, 1.0)
    return 2.0 * jnp.arctan2(jnp.sqrt(jnp.maximum(0.0, 1.0 - dot * dot)),
                             jnp.abs(dot))


def elevation(q: jnp.ndarray) -> jnp.ndarray:
    """``acos(R(2,2))`` of the rotation, used for rotation-invariant objects.

    The reference compares elevation levels of templates for rotInv/symmetric
    models via ``acos(quat.toRotationMatrix()(2,2))`` (reference
    src/networksolver.cpp:84, src/networkevaluator.cpp:299).  For a unit
    quaternion ``R(2,2) = 1 - 2*(x^2 + y^2)``.
    """
    x, y = q[..., 0], q[..., 1]
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.arccos(jnp.clip(r22, -1.0, 1.0))


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product in (x,y,z,w) order."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def top2_similar_templates(train_q: jnp.ndarray,
                           tmpl_q: jnp.ndarray) -> jnp.ndarray:
    """Indices of the two most pose-similar templates for each training quat.

    Replaces ``computeMaxSimTmplInplane`` (reference src/datasetmanager.cpp:
    687-734): per training pose, the argmin and the second argmin (strictly
    worse than the best — equal-distance duplicates are skipped, matching the
    reference's ``temp_dist == best_dist`` exclusion) of quaternion angular
    distance over templates.  Returns int32 [N, 2].
    """
    d = pairwise_angular_distance(train_q, tmpl_q)  # [N, M]
    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    masked = jnp.where(d == best_d[:, None], jnp.inf, d)
    second = jnp.argmin(masked, axis=1)
    return jnp.stack([best, second], axis=1).astype(jnp.int32)


def top2_similar_templates_trans(train_t: jnp.ndarray,
                                 tmpl_t: jnp.ndarray) -> jnp.ndarray:
    """Translation-dot-product variant (``computeMaxSimTmpl``, reference
    src/datasetmanager.cpp:736-784): argmax and strictly-second argmax of
    ``<t_train, t_tmpl>``.  Returns int32 [N, 2]."""
    d = jnp.matmul(train_t, tmpl_t.T, precision="highest")
    best = jnp.argmax(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    masked = jnp.where(d == best_d[:, None], -jnp.inf, d)
    second = jnp.argmax(masked, axis=1)
    return jnp.stack([best, second], axis=1).astype(jnp.int32)


# Batched-over-objects variants, jitted ONCE at module level: callers
# assembling an O-object dataset get one dispatch instead of O (and per-call
# jax.jit(...) wrappers would rebuild the trace cache every call).
top2_similar_templates_all = jax.jit(jax.vmap(top2_similar_templates))
top2_similar_templates_trans_all = jax.jit(
    jax.vmap(top2_similar_templates_trans))


def nearest_template(train_q: jnp.ndarray, tmpl_q: jnp.ndarray) -> jnp.ndarray:
    """Argmin over templates of angular distance, for the real->template
    train/test split assignment (reference src/datasetmanager.cpp:631-644)."""
    return jnp.argmin(pairwise_angular_distance(train_q, tmpl_q),
                      axis=1).astype(jnp.int32)
