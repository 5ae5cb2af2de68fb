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

Protocol parity with the resident Solver (reference trainNet,
src/networksolver.cpp:261-392): the same round structure with bootstrapping
rounds (kNN tables re-mined from streamed descriptors, :456-505), the same
epoch-granular TSV logging (:375-380), and Caffe-style snapshot/resume with
kNN recomputation on resume (:304-310).  Scale-out: an optional dp mesh
shards each incoming batch over devices (params replicated, gradient psum
inserted by XLA) — the prefetcher transfers straight into the sharded
layout.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

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
from pose3d_tpu.eval import evaluator
from pose3d_tpu.models import NETWORKS, apply, init_params, losses
from pose3d_tpu.models.manifold import descriptor_fn
from pose3d_tpu.models.prototxt import load_spec
from pose3d_tpu.train import checkpoint
from pose3d_tpu.train.optim import caffe_sgd

log = logging.getLogger(__name__)


def light_tables(train_labels: np.ndarray, tmpl_labels: np.ndarray,
                 rot_inv: np.ndarray, inplane: bool = True,
                 test_labels: Optional[np.ndarray] = None,
                 hard_neg_count: Optional[np.ndarray] = None) -> DeviceData:
    """A DeviceData carrying ONLY the small mining tables (1-pixel dummy
    sample tensors): index selection reuses the standard batcher against it.
    ``test_labels`` [O, Nte, 8] enables test-set histogram logging when the
    solver is given a streamed test source.  ``hard_neg_count`` [O] int
    marks objects with a streamed hard-negative source (negs_<m>.h5 in the
    reference, src/networksolver.cpp:96-101): the batcher then emits
    pusher0_is_neg/neg_idx and the host gather substitutes negatives.
    """
    from pose3d_tpu.ops import quaternion as Q
    train_labels = jnp.asarray(train_labels)
    tmpl_labels = jnp.asarray(tmpl_labels)
    O, Ntr = train_labels.shape[:2]
    T = tmpl_labels.shape[1]
    if inplane:
        sims = Q.top2_similar_templates_all(
            train_labels[:, :, 1:5], tmpl_labels[:, :, 1:5])
    else:
        sims = Q.top2_similar_templates_trans_all(
            train_labels[:, :, 5:8], tmpl_labels[:, :, 5:8])
    elev = Q.elevation(tmpl_labels[..., 1:5])
    dummy = jnp.zeros((O, 1, 1, 1, 1))
    return DeviceData(
        train_patches=jnp.zeros((O, Ntr, 1, 1, 1)), train_labels=train_labels,
        tmpl_patches=jnp.zeros((O, T, 1, 1, 1)), tmpl_labels=tmpl_labels,
        test_patches=dummy,
        test_labels=(jnp.asarray(test_labels) if test_labels is not None
                     else tmpl_labels[:, :1]),
        max_sim_tmpl=sims, rot_inv=jnp.asarray(rot_inv, jnp.int32),
        elev_ok=jnp.abs(elev[:, :, None] - elev[:, None, :]) >= 0.2,
        hard_negs=dummy,
        hard_neg_count=(jnp.asarray(hard_neg_count, jnp.int32)
                        if hard_neg_count is not None
                        else jnp.zeros((O,), jnp.int32)))


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
    test: Optional[NativeCache] = None     # flattened [O*Nte] (optional)
    nr_test_poses: int = 0
    # hard negatives (negs_<m>.h5, reference src/networksolver.cpp:96-101):
    # flattened [O * max_negatives] rows obj-major (rows past an object's
    # count are never drawn); pass the per-object counts to light_tables
    # as hard_neg_count so the batcher emits the override indices
    negatives: Optional[NativeCache] = None
    max_negatives: int = 0


class StreamingSolver:
    """Caffe-schedule trainer over native mmap caches."""

    def __init__(self, cfg: Config, sources: StreamingSources,
                 tables: DeviceData,
                 bg_bank: Optional[jnp.ndarray] = None,
                 noise_bank: Optional[jnp.ndarray] = None,
                 prefetch_depth: int = 2, mesh=None,
                 transfer_dtype=None):
        """``transfer_dtype``: numpy dtype for host->device batch uploads
        (default float32).  ``ml_dtypes.bfloat16`` HALVES every transfer —
        through a bandwidth-limited link the uploads are the streaming
        bottleneck; the jitted step promotes back to f32 on device before
        augmentation, so only the transfer is lower-precision (patch
        values are [0, 1] with ~7 significant bits of content)."""
        self.cfg = cfg
        self.src = sources
        self.tables = tables
        self.bg_bank = bg_bank
        self.noise_bank = noise_bank
        self.depth = prefetch_depth
        self.mesh = mesh
        self.transfer_dtype = transfer_dtype
        self.last_prefetch_stats = None
        self.spec = load_spec(cfg.network_path, cfg.net_name)
        self.batch_size = cfg.batch_size or self.spec.batch_size
        self.groups = self.batch_size // TRIPLET_SIZE
        if mesh is not None and mesh.size > 1 and self.groups % mesh.size:
            self.groups += mesh.size - self.groups % mesh.size
        self.epoch_iter = max(
            1, sources.nr_objects * sources.nr_training_poses // self.groups)
        self.tx = caffe_sgd(cfg.learning_rate, cfg.momentum,
                            cfg.weight_decay, cfg.learning_policy,
                            cfg.step_size, cfg.gamma)
        self._step = None
        self.knn_tables: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    # ------------------------------------------------------------ plumbing
    def init_state(self) -> Dict:
        key = jax.random.key(self.cfg.seed)
        kp, kr = jax.random.split(key)
        params = init_params(kp, self.spec)
        state = {"params": params, "opt": self.tx.init(params), "key": kr,
                 "iter": jnp.zeros((), jnp.int32)}
        if self.mesh is not None:
            from pose3d_tpu.parallel.mesh import replicate
            state = jax.device_put(state, replicate(self.mesh))
        return state

    def _batch_sharding(self):
        if self.mesh is None or self.mesh.size <= 1:
            return None
        from pose3d_tpu.parallel.mesh import batch_sharding
        return batch_sharding(self.mesh)

    def _host_batch(self, ix: Dict[str, np.ndarray], it: int) -> np.ndarray:
        """Assemble one [B, 64, 64, 7] batch on host via native gathers.

        When a negatives source exists, pusher0 is replaced by the drawn
        hard negative wherever the batcher flagged ``pusher0_is_neg`` —
        the reference's negs_<model>.h5 override (src/networksolver.cpp:
        96-101)."""
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
        if self.src.negatives is not None:
            is_neg = np.asarray(ix["pusher0_is_neg"][it], bool)
            if is_neg.any():
                rows = (obj[is_neg] * self.src.max_negatives
                        + ix["neg_idx"][it][is_neg])
                negs, _ = self.src.negatives.gather(rows)
                tmpls[is_neg, 1] = negs
        batch = np.concatenate([anchors[:, None], tmpls], axis=1)
        batch = batch.reshape(-1, *batch.shape[2:])
        if self.transfer_dtype is not None:
            batch = batch.astype(self.transfer_dtype)
        return batch

    def _train_step(self):
        if self._step is not None:
            return self._step
        cfg = self.cfg
        spec = self.spec
        sharding = self._batch_sharding()

        def step(state, batch):
            key, kf = jax.random.split(state["key"])
            batch = batch.astype(jnp.float32)   # device-side promote
            if cfg.random_background != 0:
                B = batch.shape[0]
                g = batch.reshape(-1, TRIPLET_SIZE, *batch.shape[1:])
                anchors = random_fill(kf, g[:, 0], cfg.random_background,
                                      self.bg_bank, self.noise_bank)
                batch = jnp.concatenate([anchors[:, None], g[:, 1:]],
                                        axis=1).reshape(B, *batch.shape[1:])
            if sharding is not None:
                batch = jax.lax.with_sharding_constraint(batch, sharding)

            def loss_fn(p):
                return losses.spec_loss(
                    apply(p, spec, batch,
                          fused_stem=cfg.train_fused_stem),
                    spec.loss_slices, spec.margin)

            loss, grads = jax.value_and_grad(loss_fn)(state["params"])
            updates, opt = self.tx.update(grads, state["opt"],
                                          state["params"])
            params = jax.tree.map(lambda p, u: p + u, state["params"],
                                  updates)
            return {"params": params, "opt": opt, "key": key,
                    "iter": state["iter"] + 1}, loss

        # donate the state only: the batch buffer is consumed by the
        # augmentation concat before any in-place reuse is possible
        self._step = jax.jit(step, donate_argnums=(0,))
        return self._step

    # ------------------------------------------- streamed descriptor passes
    def streamed_descriptors(self, params, cache: NativeCache, n: int,
                             chunk: int = 512) -> jnp.ndarray:
        """Descriptors over a native cache without residency: gather fixed
        chunks on host, forward on device."""
        return self.streamed_descriptors_rows(params, cache, np.arange(n),
                                              chunk)

    def streamed_descriptors_rows(self, params, cache: NativeCache,
                                  rows: np.ndarray,
                                  chunk: int = 512) -> jnp.ndarray:
        """Descriptors for an arbitrary row subset of a native cache
        (held-out/query subsampling without streaming the whole set)."""
        # one jit wrapper for the solver's lifetime — a fresh closure per
        # call would miss the jit cache (keyed by function identity) and
        # retrace on every logging/bootstrap pass
        fn = getattr(self, "_desc_jit", None)
        if fn is None:
            fn = self._desc_jit = jax.jit(descriptor_fn(self.spec))
        rows = np.asarray(rows, np.int64)
        outs = []
        for s in range(0, len(rows), chunk):
            sel = rows[s:s + chunk]
            host, _ = cache.gather(sel)
            pad = chunk - len(sel)
            if pad:
                host = np.concatenate(
                    [host, np.zeros((pad,) + host.shape[1:], host.dtype)])
            if self.transfer_dtype is not None:
                host = host.astype(self.transfer_dtype)
            outs.append(fn(params,
                           jnp.asarray(host).astype(jnp.float32))
                        [:chunk - pad])
        return jnp.concatenate(outs)

    def compute_knn(self, params) -> None:
        """computeKNN over the streamed sets (reference
        src/networksolver.cpp:456-505): training + template descriptors via
        chunked gathers, kNN tables on device."""
        O = self.src.nr_objects
        Ntr = self.src.nr_training_poses
        T = self.src.nr_template_poses
        dq = self.streamed_descriptors(params, self.src.train, O * Ntr)
        dt = self.streamed_descriptors(params, self.src.templates, O * T)
        self.knn_tables = evaluator.knn_tables_from_descriptors(
            dq, dt, O, Ntr, T)

    # ------------------------------------------------------------- logging
    def _log_metrics(self, params, iteration: int, elapsed: float) -> None:
        cfg = self.cfg
        O = self.src.nr_objects
        T = self.src.nr_template_poses
        Ntr = self.src.nr_training_poses
        dt = self.streamed_descriptors(params, self.src.templates, O * T)
        tl = np.asarray(self.tables.tmpl_labels).reshape(-1, 8)
        rot_inv = np.asarray(self.tables.rot_inv)

        dtr = self.streamed_descriptors(params, self.src.train, O * Ntr)
        trl = np.asarray(self.tables.train_labels).reshape(-1, 8)
        train_hist = evaluator.histogram_from_descriptors(
            dtr, dt, trl, tl, rot_inv, k=cfg.knn)

        if self.src.test is not None and self.src.nr_test_poses > 0:
            dte = self.streamed_descriptors(
                params, self.src.test, O * self.src.nr_test_poses)
            # streamed test labels ride in tables.test_labels when provided
            tel = np.asarray(self.tables.test_labels).reshape(-1, 8)
            test_hist = evaluator.histogram_from_descriptors(
                dte, dt, tel, tl, rot_inv, k=cfg.knn)
        else:
            test_hist = np.zeros(len(evaluator.HISTOGRAM_BINS) + 2)

        evaluator.save_log(cfg.output_path, cfg.log_name, test_hist,
                           train_hist, iteration, elapsed, O, Ntr)
        local_index = {m: i for i, m in enumerate(cfg.used_models)}
        # reference quirk kept: confusion over the TRAINING set (:390)
        conf = evaluator.confusion_from_descriptors(
            dtr, dt, trl, tl, cfg.models, local_index, Ntr, k=cfg.knn)
        evaluator.save_confusion_matrix(cfg.output_path, cfg.log_name, conf,
                                        iteration)

    # --------------------------------------------------------------- train
    def train_epoch(self, state: Dict, epoch_key: jax.Array,
                    bootstrapping: bool = False) -> Tuple[Dict, float]:
        ix_dev = epoch_indices(epoch_key, self.epoch_iter, self.groups,
                               self.tables, bootstrapping=bootstrapping,
                               knn_tables=self.knn_tables
                               if bootstrapping else None)
        ix = {k: np.asarray(v) for k, v in ix_dev.items()}
        step = self._train_step()

        pf = DevicePrefetcher(lambda it: self._host_batch(ix, it),
                              steps=self.epoch_iter, depth=self.depth,
                              device=self._batch_sharding())
        last_loss = None
        for batch in pf:
            state, last_loss = step(state, batch)
        self.last_prefetch_stats = dict(pf.stats)
        return state, (float(last_loss) if last_loss is not None else 0.0)

    def train(self, num_epochs: Optional[int] = None,
              resume_iter: int = 0) -> Dict:
        """Full reference loop shape (src/networksolver.cpp:326-390):
        training rounds then bootstrapping rounds, epoch-granular logging,
        snapshot at the end; resume restores + recomputes kNN (:304-310)."""
        cfg = self.cfg
        state = self.init_state()
        bootstrapping = False
        start = time.time()
        it_global = 0

        if resume_iter > 0:
            path = checkpoint.snapshot_path(cfg.output_path, cfg.net_name,
                                            resume_iter)
            state = checkpoint.restore(path, state)
            it_global = int(state["iter"])
            self.compute_knn(state["params"])
            bootstrapping = True
            log.info("resumed from %s; bootstrapping on", path)

        key = jax.random.key(cfg.seed + 99)
        if num_epochs is not None:
            # simple-N-epochs mode (no rounds); kept for library use
            for _ in range(num_epochs):
                key, ek = jax.random.split(key)
                state, _ = self.train_epoch(state, ek)
            if cfg.output_path:
                checkpoint.save(cfg.output_path, cfg.net_name,
                                int(state["iter"]), state)
            return state

        total_rounds = cfg.num_training_rounds + cfg.num_bootstrapping_rounds
        for rnd in range(total_rounds):
            if rnd >= cfg.num_training_rounds and not bootstrapping:
                self.compute_knn(state["params"])
                bootstrapping = True
            if bootstrapping and self.knn_tables is None:
                self.compute_knn(state["params"])
            for epoch in range(cfg.num_epochs):
                key, ek = jax.random.split(key)
                state, last_loss = self.train_epoch(state, ek,
                                                    bootstrapping)
                it_global += self.epoch_iter
                global_epoch = (epoch + 1) + rnd * cfg.num_epochs
                if global_epoch % max(cfg.log_epoch, 1) == 0:
                    log.info("round %d epoch %d iter %d loss %.4f",
                             rnd, epoch, it_global, last_loss)
                    if cfg.output_path:
                        self._log_metrics(state["params"], it_global,
                                          time.time() - start)
        if cfg.output_path:
            checkpoint.save(cfg.output_path, cfg.net_name, it_global, state)
        return state
