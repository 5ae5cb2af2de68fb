"""Mesh + sharding helpers for the data-parallel training path.

The reference has no distributed backend at all (SURVEY.md §2.2): its only
parallelism is a host thread pool feeding a single Caffe solver.  The
TPU-native scale-out is jnp + ``jax.sharding``: one ``dp`` mesh axis over
the ICI slice; the batch axis of every train-step input is sharded over
``dp``; params, optimizer state, and the (tiny) template/training tensors
are replicated.  XLA inserts the gradient ``psum`` automatically from the
sharding annotations — no hand-written collectives are needed at this model
scale (~100k params, 16-D descriptors).

TP/PP/SP/EP are intentionally out of scope: there is no dimension to shard
(documented in SURVEY.md §2.2); the scaling axes are batch and the kNN
template DB, both served by data-sharded matmuls.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data-parallel mesh over ``n_devices`` (0 = all visible)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, array):
    """Place a host array with its batch axis split across the mesh."""
    return jax.device_put(array, batch_sharding(mesh))
