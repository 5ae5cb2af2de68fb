"""Triplet-manifold and binarization losses.

The reference delegates these to the out-of-tree Caffe TripletLoss /
BinarizationLoss layers of Caffe PR #2603 (reference README.md:21); only the
prototxt parameters survive in-repo (margin 0.1, losstype 1, num_negatives,
use_pair — e.g. network/manifold_rgbd_16.prototxt:142-155).  This module
reconstructs the Wohlhart-Lepetit CVPR'15 semantics those parameters encode:

  batch = G groups of (anchor, puller, pusher_1..pusher_n);
  L_triplet = sum_g sum_i max(0, 1 - |a_g - n_gi|^2 / (|a_g - p_g|^2 + m))
              (losstype 1 = the "ratio" hinge form, margin m = 0.1)
  L_pair    = sum_g |a_g - p_g|^2                  (when use_pair = 1)

normalized by the number of groups.  The validation target is loss-curve /
retrieval-metric parity (SURVEY.md §7 hard part 3), not bit equality with a
layer whose source isn't available.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _sq(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * x, axis=-1)


@partial(jax.jit, static_argnames=("num_negatives", "use_pair"))
def triplet_ratio_loss(desc: jnp.ndarray, margin: float = 0.1,
                       num_negatives: int = 3,
                       use_pair: bool = True) -> jnp.ndarray:
    """Wohlhart-Lepetit triplet-ratio + pair loss.

    desc: [G * (2 + num_negatives), D] laid out group-major as the batch
    builder emits it: (anchor, puller, pusher_0, ..).  Scalar loss.
    """
    group = 2 + num_negatives
    g = desc.reshape(-1, group, desc.shape[-1])
    anchor = g[:, 0]
    puller = g[:, 1]

    loss = jnp.zeros((), desc.dtype)
    if num_negatives > 0:
        pushers = g[:, 2:]                                  # [G, n, D]
        d_pos = _sq(anchor - puller)                        # [G]
        d_neg = _sq(anchor[:, None, :] - pushers)           # [G, n]
        ratio = d_neg / (d_pos[:, None] + margin)
        loss = loss + jnp.sum(jnp.maximum(0.0, 1.0 - ratio), axis=1).mean()
    if use_pair:
        loss = loss + _sq(anchor - puller).mean()
    return loss


def spec_loss(desc: jnp.ndarray, loss_slices: Tuple[Tuple[int, int, int, int],
                                                    ...],
              margin: float = 0.1) -> jnp.ndarray:
    """Apply a NetSpec's loss plan: each (begin, end, num_negatives, use_pair)
    row-slice of the descriptor batch gets its own TripletLoss instance, and
    the terms add — mirroring the multi-loss prototxts
    (network/manifold.prototxt:111-171)."""
    total = jnp.zeros((), desc.dtype)
    for begin, end, n_neg, use_pair in loss_slices:
        stop = desc.shape[0] if end == -1 else end
        total = total + triplet_ratio_loss(
            desc[begin:stop], margin=margin, num_negatives=n_neg,
            use_pair=bool(use_pair))
    return total


@jax.jit
def binarization_loss(logits: jnp.ndarray, beta: float = 0.3,
                      gamma: float = 4.0) -> jnp.ndarray:
    """BinarizationLoss reconstruction (PR #2603 source is not in the repo).

    b = sigmoid(logits) per 5-group (anchor, puller, pushers): preserve the
    manifold neighborhood on the binary codes (triplet-ratio + pair on b),
    saturate each bit toward {0, 1} via the standard ``b * (1 - b)``
    push-to-corner penalty, and keep bits INFORMATIVE via a balance term
    ((batch-mean(b) - 1/2)^2 per bit).  Without the balance term the
    corner penalty has a trivial optimum — every input mapped to the same
    corner — which a round-4 TPU run reached in practice (all-identical
    codes, chance-level retrieval); balance makes collapse the most
    expensive configuration instead.  Documented best-effort semantics;
    validated by Hamming-retrieval quality, not bit parity.
    """
    b = jax.nn.sigmoid(logits)
    neighborhood = triplet_ratio_loss(b, margin=0.1, num_negatives=3,
                                      use_pair=True)
    saturation = jnp.mean(jnp.sum(b * (1.0 - b), axis=-1))
    balance = jnp.sum((jnp.mean(b, axis=0) - 0.5) ** 2)
    return neighborhood + beta * saturation + gamma * balance
