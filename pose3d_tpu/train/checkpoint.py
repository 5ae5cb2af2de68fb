"""Checkpoint/resume with Caffe-snapshot-style naming.

The reference snapshots ``<net_name>_iter_N.solverstate`` at the end of
training and resumes via ``solver.Restore`` + recomputing the bootstrap kNN
tables (reference src/networksolver.cpp:272, 304-310, 385).  We keep the
same lifecycle with msgpack pytree files ``<net_name>_iter_N.ckpt`` holding
params + optimizer state + RNG key + iteration.

orbax is available in the image but its async machinery is overkill for a
=~100k-param model; flax.serialization round-trips the pytree exactly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
from flax import serialization


def snapshot_path(directory: str, net_name: str, iteration: int) -> str:
    return os.path.join(directory, f"{net_name}_iter_{iteration}.ckpt")


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key)


def _unwrap_keys(tree: Any) -> Any:
    """Typed PRNG key arrays don't serialize; store their raw uint32 data."""
    return jax.tree.map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree)


def _rewrap_keys(tree: Any, template: Any) -> Any:
    return jax.tree.map(
        lambda x, t: jax.random.wrap_key_data(x) if _is_key(t) else x,
        tree, template)


def save(directory: str, net_name: str, iteration: int, state: Any) -> str:
    os.makedirs(directory or ".", exist_ok=True)
    path = snapshot_path(directory, net_name, iteration)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_unwrap_keys(state)))
    return path


def restore(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        raw = serialization.from_bytes(_unwrap_keys(template), f.read())
    return _rewrap_keys(raw, template)


def latest(directory: str, net_name: str) -> Optional[Tuple[str, int]]:
    """Find the newest snapshot for a net: (path, iteration)."""
    if not os.path.isdir(directory):
        return None
    best = None
    pat = re.compile(re.escape(net_name) + r"_iter_(\d+)\.ckpt$")
    for f in os.listdir(directory):
        m = pat.match(f)
        if m:
            it = int(m.group(1))
            if best is None or it > best[1]:
                best = (os.path.join(directory, f), it)
    return best
