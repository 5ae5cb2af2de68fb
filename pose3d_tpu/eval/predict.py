"""Serving-path pose retrieval: frame -> patch -> descriptor -> top-k pose.

The reference exposes retrieval only inside its batch evaluation
(computeConfusionMatrix / computeHistogram kNN over the template DB,
reference src/networkevaluator.cpp:178-246); deployment code would have to
re-assemble it.  This module packages that exact pipeline as a small
inference API:

  * :func:`build_template_index` — forward the template set once into an
    immutable device-resident (descriptors, labels) index;
  * :func:`predict_from_descriptors` / :func:`predict_from_patches` — top-k
    retrieval returning (class, quaternion, inverse-translation, distance)
    per query, decoded from the reference's 8-float label contract
    (label = [class, quat x y z w, inv-translation], reference
    src/datasetmanager.cpp:484-491);
  * :func:`predict_from_frame` — full serving path from a raw RGB-D frame:
    normals (src/helper.cpp:53-103 math), the samplePatchWithScale patch
    contract (src/datasetmanager.cpp:299-346), then retrieval.

Everything after the one-time index build is a single jitted program per
query batch shape: patch gather + conv forward + one [Q, T] distance
matmul + top-k, all on device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pose3d_tpu.eval.evaluator import _flat, compute_descriptors
from pose3d_tpu.ops import knn as knn_ops
from pose3d_tpu.ops.geometry import depth2normals
from pose3d_tpu.ops.patch import sample_patches


class TemplateIndex(NamedTuple):
    """Device-resident retrieval index over the template views."""
    descriptors: jnp.ndarray   # [T, D] float32
    classes: jnp.ndarray       # [T] int32
    quats: jnp.ndarray         # [T, 4] (x, y, z, w)
    trans: jnp.ndarray         # [T, 3] inverse translation


def build_template_index(apply_fn: Callable, params,
                         tmpl_patches: jnp.ndarray,
                         tmpl_labels: jnp.ndarray,
                         batch_size: int = 512, mesh=None) -> TemplateIndex:
    """Forward the template set into a TemplateIndex.

    Accepts stacked [O, T, 64, 64, 7] / [O, T, 8] (the DeviceData layout)
    or already-flat [N, ...] arrays; ``mesh`` dp-shards the forward pass.
    """
    if tmpl_patches.ndim == 5:
        tmpl_patches = _flat(tmpl_patches)
        tmpl_labels = _flat(tmpl_labels)
    desc = compute_descriptors(apply_fn, params, tmpl_patches,
                               batch_size=batch_size, mesh=mesh)
    return TemplateIndex(descriptors=desc,
                         classes=tmpl_labels[:, 0].astype(jnp.int32),
                         quats=tmpl_labels[:, 1:5],
                         trans=tmpl_labels[:, 5:8])


def predict_from_descriptors(index: TemplateIndex, desc: jnp.ndarray,
                             k: int = 3
                             ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray, jnp.ndarray]:
    """Top-k retrieval for query descriptors [Q, D].

    Returns (classes [Q, k] int32, quats [Q, k, 4], trans [Q, k, 3],
    dists [Q, k] ascending true-L2) — the kNN the reference's evaluation
    protocols are built from (src/networkevaluator.cpp:196-205)."""
    dists, idx = knn_ops.knn_l2(desc, index.descriptors, k=k)
    return (index.classes[idx], index.quats[idx], index.trans[idx], dists)


def predict_from_patches(apply_fn: Callable, params, index: TemplateIndex,
                         patches: jnp.ndarray, k: int = 3):
    """Retrieval for normalized patches [Q, 64, 64, 7] (see ops.patch for
    the normalization contract)."""
    desc = compute_descriptors(apply_fn, params, patches)
    return predict_from_descriptors(index, desc, k=k)


def predict_from_frame(apply_fn: Callable, params, index: TemplateIndex,
                       color: jnp.ndarray, depth: jnp.ndarray,
                       K, centers: jnp.ndarray, k: int = 3):
    """Full serving path for ONE RGB-D frame.

    color [H, W, 3] BGR in 0..255, depth [H, W] metric; centers [Q, 3]
    rows of (pixel_x, pixel_y, z) — the detector's object-center
    hypotheses.  Computes normals once for the frame, extracts one
    normalized patch per center (the samplePatchWithScale contract:
    metric 0.2 m crop, bilinear color/normals, nearest depth, demeaned
    depth), and retrieves top-k template poses per hypothesis.
    """
    fx, fy = float(K[0, 0]), float(K[1, 1])
    nor = depth2normals(depth, fx, fy)
    Q = centers.shape[0]
    rep = lambda a: jnp.broadcast_to(a, (Q,) + a.shape)
    patches = sample_patches(rep(color.astype(jnp.float32)),
                             rep(depth), rep(nor),
                             centers[:, 0], centers[:, 1], centers[:, 2],
                             fx=fx, fy=fy)
    return predict_from_patches(apply_fn, params, index, patches, k=k)
