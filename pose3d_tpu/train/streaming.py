"""Out-of-core streaming training: datasets larger than HBM.

The resident path (train/solver.py) keeps every sample in device memory and
fuses batch assembly into the train step.  When the sample sets exceed HBM
(full BigBIRD, many-object runs at f32), this module streams instead:

  1. triplet *indices* for a whole epoch are computed on device in one
     program (the mining tables — labels, similarity, elevation — are tiny
     and stay resident) and fetched once (~1 MB);
  2. the native mmap cache (data/native_cache.py, C++ threaded gather)
     assembles each host batch;
  3. a DevicePrefetcher (data/prefetch.py) double-buffers host->device
     transfers while the jitted step (augmentation + fwd/bwd + Caffe-SGD
     update, batch donated) trains on the previous batch.

This is the moral equivalent of the reference's producer-thread pool +
condvar queue (reference src/networksolver.cpp:12-50, 315-323) — but the
producers are native threads doing mmap gathers and the consumer is an XLA
program, with the augmentation still on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pose3d_tpu.config import Config
from pose3d_tpu.data import batcher
from pose3d_tpu.data.augment import random_fill
from pose3d_tpu.data.batcher import TRIPLET_SIZE
from pose3d_tpu.data.dataset import DeviceData
from pose3d_tpu.data.native_cache import NativeCache
from pose3d_tpu.data.prefetch import DevicePrefetcher
from pose3d_tpu.models import NETWORKS, apply, init_params, losses
from pose3d_tpu.train.optim import caffe_sgd


def light_tables(train_labels: np.ndarray, tmpl_labels: np.ndarray,
                 rot_inv: np.ndarray, inplane: bool = True) -> DeviceData:
    """A DeviceData carrying ONLY the small mining tables (1-pixel dummy
    sample tensors): index selection reuses the standard batcher against it.
    """
    from pose3d_tpu.ops import quaternion as Q
    train_labels = jnp.asarray(train_labels)
    tmpl_labels = jnp.asarray(tmpl_labels)
    O, Ntr = train_labels.shape[:2]
    T = tmpl_labels.shape[1]
    if inplane:
        sims = jnp.stack([Q.top2_similar_templates(train_labels[o, :, 1:5],
                                                   tmpl_labels[o, :, 1:5])
                          for o in range(O)])
    else:
        sims = jnp.stack([
            Q.top2_similar_templates_trans(train_labels[o, :, 5:8],
                                           tmpl_labels[o, :, 5:8])
            for o in range(O)])
    elev = Q.elevation(tmpl_labels[..., 1:5])
    dummy = jnp.zeros((O, 1, 1, 1, 1))
    return DeviceData(
        train_patches=jnp.zeros((O, Ntr, 1, 1, 1)), train_labels=train_labels,
        tmpl_patches=jnp.zeros((O, T, 1, 1, 1)), tmpl_labels=tmpl_labels,
        test_patches=dummy, test_labels=tmpl_labels[:, :1],
        max_sim_tmpl=sims, rot_inv=jnp.asarray(rot_inv, jnp.int32),
        elev_ok=jnp.abs(elev[:, :, None] - elev[:, None, :]) >= 0.2,
        hard_negs=dummy, hard_neg_count=jnp.zeros((O,), jnp.int32))


@partial(jax.jit, static_argnames=("epoch_iter", "groups", "bootstrapping"))
def epoch_indices(key: jax.Array, epoch_iter: int, groups: int,
                  tables: DeviceData, bootstrapping: bool = False,
                  knn_tables=None) -> Dict[str, jnp.ndarray]:
    """All triplet indices for one epoch in one program: dict of
    [epoch_iter, groups] int32 arrays."""
    keys = jax.random.split(key, epoch_iter)

    def one(args):
        k, it = args
        return batcher.batch_indices(k, it, groups, tables, bootstrapping,
                                     knn_tables)
    return jax.lax.map(one, (keys, jnp.arange(epoch_iter)))


@dataclass
class StreamingSources:
    train: NativeCache          # flattened [O*Ntr] samples, obj-major
    templates: NativeCache      # flattened [O*T]
    nr_objects: int
    nr_training_poses: int
    nr_template_poses: int


class StreamingSolver:
    """Caffe-schedule trainer over native mmap caches."""

    def __init__(self, cfg: Config, sources: StreamingSources,
                 tables: DeviceData,
                 bg_bank: Optional[jnp.ndarray] = None,
                 noise_bank: Optional[jnp.ndarray] = None,
                 prefetch_depth: int = 2):
        self.cfg = cfg
        self.src = sources
        self.tables = tables
        self.bg_bank = bg_bank
        self.noise_bank = noise_bank
        self.depth = prefetch_depth
        self.spec = NETWORKS[cfg.net_name]
        self.batch_size = cfg.batch_size or self.spec.batch_size
        self.groups = self.batch_size // TRIPLET_SIZE
        self.epoch_iter = max(
            1, sources.nr_objects * sources.nr_training_poses // self.groups)
        self.tx = caffe_sgd(cfg.learning_rate, cfg.momentum,
                            cfg.weight_decay, cfg.learning_policy,
                            cfg.step_size, cfg.gamma)
        self._step = None

    def init_state(self) -> Dict:
        key = jax.random.key(self.cfg.seed)
        kp, kr = jax.random.split(key)
        params = init_params(kp, self.spec)
        return {"params": params, "opt": self.tx.init(params), "key": kr,
                "iter": jnp.zeros((), jnp.int32)}

    def _host_batch(self, ix: Dict[str, np.ndarray], it: int) -> np.ndarray:
        """Assemble one [B, 64, 64, 7] batch on host via native gathers."""
        T = self.src.nr_template_poses
        Ntr = self.src.nr_training_poses
        obj = ix["obj"][it]
        anchors, _ = self.src.train.gather(obj * Ntr + ix["pose"][it])
        tmpl_rows = np.stack([
            obj * T + ix["puller"][it],
            obj * T + ix["pusher0"][it],
            ix["pusher1_obj"][it] * T + ix["pusher1_pose"][it],
            ix["pusher2_obj"][it] * T + ix["pusher2_pose"][it]], axis=1)
        tmpls, _ = self.src.templates.gather(tmpl_rows.reshape(-1))
        tmpls = tmpls.reshape(len(obj), 4, *tmpls.shape[1:])
        batch = np.concatenate([anchors[:, None], tmpls], axis=1)
        return batch.reshape(-1, *batch.shape[2:])

    def _train_step(self):
        if self._step is not None:
            return self._step
        cfg = self.cfg
        spec = self.spec

        def step(state, batch):
            key, kf = jax.random.split(state["key"])
            if cfg.random_background != 0:
                B = batch.shape[0]
                g = batch.reshape(-1, TRIPLET_SIZE, *batch.shape[1:])
                anchors = random_fill(kf, g[:, 0], cfg.random_background,
                                      self.bg_bank, self.noise_bank)
                batch = jnp.concatenate([anchors[:, None], g[:, 1:]],
                                        axis=1).reshape(B, *batch.shape[1:])

            def loss_fn(p):
                return losses.spec_loss(apply(p, spec, batch),
                                        spec.loss_slices, spec.margin)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt = self.tx.update(grads, state["opt"],
                                          state["params"])
            params = jax.tree.map(lambda p, u: p + u, state["params"],
                                  updates)
            return {"params": params, "opt": opt, "key": key,
                    "iter": state["iter"] + 1}, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))
        return self._step

    def train_epoch(self, state: Dict, epoch_key: jax.Array) -> Dict:
        ix_dev = epoch_indices(epoch_key, self.epoch_iter, self.groups,
                               self.tables)
        ix = {k: np.asarray(v) for k, v in ix_dev.items()}
        step = self._train_step()

        pf = DevicePrefetcher(lambda it: self._host_batch(ix, it),
                              steps=self.epoch_iter, depth=self.depth)
        last_loss = None
        for batch in pf:
            state, last_loss = step(state, batch)
        state["last_loss"] = last_loss
        return state

    def train(self, num_epochs: Optional[int] = None) -> Dict:
        state = self.init_state()
        key = jax.random.key(self.cfg.seed + 99)
        epochs = (num_epochs if num_epochs is not None
                  else self.cfg.num_training_rounds * self.cfg.num_epochs)
        for e in range(epochs):
            key, ek = jax.random.split(key)
            state = self.train_epoch(state, ek)
        return state
