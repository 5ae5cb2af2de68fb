"""SGD with Caffe update semantics + the reference's lr schedule.

Caffe's SGDSolver applies, per parameter (and per the solver config the
reference builds in src/networksolver.cpp:264-280):

    local_rate = base_lr * gamma^floor(iter / step_size) * lr_mult
    v  <-  momentum * v + local_rate * (grad + weight_decay * w)
    w  <-  w - v

i.e. the learning rate sits *inside* the momentum accumulator (heavy-ball),
and L2 weight decay is added to the raw gradient before momentum.  Biases
get lr_mult = 2 (every prototxt: ``param { lr_mult: 2 }``, e.g.
network/manifold_rgbd_16.prototxt:40); decay_mult defaults to 1 for all
params.  The lr policy is "step": x gamma every step_size iters
(reference config.ini:24-27: step 15000, gamma 0.9), or "fixed".
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax


class CaffeSGDState(NamedTuple):
    velocity: optax.Params
    count: jnp.ndarray


def _lr_mult_tree(params: Dict) -> Dict:
    """lr multiplier per leaf: biases ('b') get 2x, everything else 1x."""
    def mult(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return 2.0 if names and names[-1] == "b" else 1.0
    return jax.tree_util.tree_map_with_path(mult, params)


def make_lr_schedule(base_lr: float, policy: str = "step",
                     step_size: int = 15000, gamma: float = 0.9):
    if policy == "fixed":
        return lambda count: jnp.asarray(base_lr, jnp.float32)

    def step_fn(count):
        return base_lr * jnp.power(gamma, jnp.floor(count / step_size))
    return step_fn


def caffe_sgd(base_lr: float, momentum: float = 0.9,
              weight_decay: float = 0.0, policy: str = "step",
              step_size: int = 15000,
              gamma: float = 0.9) -> optax.GradientTransformation:
    schedule = make_lr_schedule(base_lr, policy, step_size, gamma)

    def init(params):
        return CaffeSGDState(
            velocity=jax.tree.map(jnp.zeros_like, params),
            count=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("caffe_sgd needs params (weight decay)")
        lr = schedule(state.count)
        mults = _lr_mult_tree(params)

        def upd(g, v, w, m):
            local = lr * m
            v_new = momentum * v + local * (g + weight_decay * w)
            return v_new

        vel = jax.tree.map(upd, grads, state.velocity, params, mults)
        updates = jax.tree.map(lambda v: -v, vel)
        return updates, CaffeSGDState(velocity=vel, count=state.count + 1)

    return optax.GradientTransformation(init, update)


def freeze_trunk(tx: optax.GradientTransformation,
                 trunk_names: tuple) -> optax.GradientTransformation:
    """Zero updates for trunk subtrees — the binarization phase trains only
    the head over a frozen trunk (network/manifold_rgbdnor_16_bin.prototxt
    sets all trunk lr_mult to 0)."""
    def label(params):
        return {k: ("frozen" if k in trunk_names else "train")
                for k in params}
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label)
