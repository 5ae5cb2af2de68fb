"""On-device triplet batch assembly — the producer-thread pool, deleted.

The reference builds each batch on the CPU: a pool of threads assembles 60
five-sample groups per iteration, copying 2.4 MB float vectors through a
mutex-guarded queue into the Caffe input blob (reference
src/networksolver.cpp:12-50, 52-186, 315-323, 341-350).  Here the whole
thing is index arithmetic inside the jitted train step: the training and
template sets are device-resident, triplet selection is vectorized PRNG +
gathers, and the anchors' background fill fuses right in.  No host round
trip per step, no queue, no copies.

Selection semantics (buildBatch, reference src/networksolver.cpp:52-186):
  anchor   = training[obj, pose] with linearId = iter*G + g,
             obj = linearId % nr_objects, pose = linearId / nr_objects;
  puller   = most similar template (maxSimTmpl[...][0]);
  pusher0  = random template: elevation-gated for rotInv objects (re-draw
             until |elev - elev(puller)| >= 0.2, here an exact masked-Gumbel
             draw), plain != puller otherwise; OVERRIDDEN by a random hard
             negative when ``negs_<model>.h5`` exists (:96-101);
  pusher1  = random same-class template.  (The reference's re-roll condition
             ``pusher1 == puller && pusher1 == pusher0`` is a logical-AND
             that almost never fires, i.e. effectively unconstrained — we
             reproduce the *effective* uniform behavior, per SURVEY §7's
             known-quirks note.)  Under bootstrapping: the misclassified
             kNN template when there is one (:103-129);
  pusher2  = random template of another class; under bootstrapping the
             second misclassified kNN entry when recorded (:131-143).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pose3d_tpu.data.augment import random_fill
from pose3d_tpu.data.dataset import DeviceData

TRIPLET_SIZE = 5


def _uniform_except(key: jax.Array, n: int, excl: jnp.ndarray) -> jnp.ndarray:
    """Uniform int in [0, n) \\ {excl}, exactly (draw in [0, n-1), shift).
    Degenerates to 0 when n == 1 (single-object runs: there is no "other
    class"; the reference would spin forever here)."""
    if n <= 1:
        return jnp.zeros_like(excl)
    r = jax.random.randint(key, excl.shape, 0, n - 1)
    return r + (r >= excl)


def _masked_uniform(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Exact uniform draw over the True entries of ``mask`` [..., T] via
    Gumbel-max; falls back to plain uniform when the mask is empty."""
    g = jax.random.gumbel(key, mask.shape)
    score = jnp.where(mask, g, -jnp.inf)
    idx = jnp.argmax(score, axis=-1)
    any_ok = jnp.any(mask, axis=-1)
    fallback = jax.random.randint(key, idx.shape, 0, mask.shape[-1])
    return jnp.where(any_ok, idx, fallback)


def batch_indices(key: jax.Array, it: jnp.ndarray, groups: int,
                  data: DeviceData,
                  bootstrapping: bool = False,
                  knn_tables: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                  ) -> dict:
    """Compute all triplet indices for iteration ``it``.

    Returns a dict of int32 arrays [G]: obj, pose, puller, pusher0 (+
    pusher0_is_neg, neg_idx), pusher1_obj/pose, pusher2_obj/pose.
    ``knn_tables`` = (maxSimKNN [O, Ntr, 4], has_second [O, Ntr] bool) from
    the bootstrap kNN pass (train/solver.py).
    """
    O = data.nr_objects
    Ntr = data.nr_training_poses
    T = data.nr_template_poses

    linear = it * groups + jnp.arange(groups)
    obj = (linear % O).astype(jnp.int32)
    pose = ((linear // O) % Ntr).astype(jnp.int32)

    puller = data.max_sim_tmpl[obj, pose, 0]
    rot = data.rot_inv[obj] != 0

    ks = jax.random.split(key, 8)

    # pusher0: elevation-gated or != puller
    elev_mask = data.elev_ok[obj, puller]                   # [G, T]
    p0_rot = _masked_uniform(ks[0], elev_mask)
    p0_plain = _uniform_except(ks[0], T, puller)
    pusher0 = jnp.where(rot, p0_rot, p0_plain)

    # hard-negative override
    has_neg = data.hard_neg_count[obj] > 0
    neg_idx = jax.random.randint(
        ks[1], obj.shape, 0, jnp.maximum(data.hard_neg_count[obj], 1))

    # pusher1: same class
    p1_rot = _masked_uniform(ks[2], data.elev_ok[obj, puller])
    p1_plain = jax.random.randint(ks[2], obj.shape, 0, T)
    pusher1_pose = jnp.where(rot, p1_rot, p1_plain)
    pusher1_obj = obj

    # pusher2: other class
    p2_obj = _uniform_except(ks[3], O, obj)
    p2_pose = jax.random.randint(ks[4], obj.shape, 0, T)

    # ``bootstrapping`` may be a Python bool (compile-time folded) OR a
    # traced bool scalar — the latter lets ONE compiled epoch program
    # serve both phases (each extra program costs ~25-30 s of per-process
    # executable load through a tunneled device)
    if knn_tables is not None:
        knn, has_second = knn_tables
        knn_obj = knn[obj, pose, 0]
        knn_pose = knn[obj, pose, 1]
        missed = ((knn_obj != obj) | (knn_pose != puller)) & bootstrapping
        pusher1_obj = jnp.where(missed, knn_obj, pusher1_obj)
        pusher1_pose = jnp.where(missed, knn_pose, pusher1_pose)
        use2 = missed & has_second[obj, pose]
        p2_obj = jnp.where(use2, knn[obj, pose, 2], p2_obj)
        p2_pose = jnp.where(use2, knn[obj, pose, 3], p2_pose)
    elif isinstance(bootstrapping, bool):
        if bootstrapping:
            raise ValueError("bootstrapping requires knn_tables")
    # else: a TRACED flag with no tables.  This program contains no kNN
    # data, so the flag cannot act; treat it as off.  (Raising here would
    # spuriously reject an explicit ``bootstrapping=False`` that jit has
    # turned into a tracer — a traced True is a caller bug we cannot
    # detect at trace time; the solver always passes tables.)

    return dict(obj=obj, pose=pose, puller=puller, pusher0=pusher0,
                pusher0_is_neg=has_neg, neg_idx=neg_idx,
                pusher1_obj=pusher1_obj, pusher1_pose=pusher1_pose,
                pusher2_obj=p2_obj, pusher2_pose=p2_pose)


@partial(jax.jit, static_argnames=("groups", "random_background"))
def build_batch(key: jax.Array, it: jnp.ndarray, groups: int,
                data: DeviceData, random_background: int = 0,
                bg_bank: Optional[jnp.ndarray] = None,
                bootstrapping=False,
                knn_tables=None,
                noise_bank: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Assemble one training batch [groups * 5, 64, 64, 7] on device.
    ``bootstrapping`` may be a traced bool (see batch_indices).

    Group layout (anchor, puller, pusher0, pusher1, pusher2) — the exact
    emission order of the reference batch builder (:173-178), which the
    loss reshapes by.
    """
    kidx, kfill = jax.random.split(key)
    ix = batch_indices(kidx, it, groups, data, bootstrapping, knn_tables)

    # gathers stay in the storage dtype (bf16 halves resident HBM); the
    # batch is promoted to f32 right after for augmentation + the model
    anchor = data.train_patches[ix["obj"], ix["pose"]].astype(jnp.float32)
    puller = data.tmpl_patches[ix["obj"], ix["puller"]].astype(jnp.float32)
    pusher0 = data.tmpl_patches[ix["obj"],
                                ix["pusher0"]].astype(jnp.float32)
    negs = data.hard_negs[ix["obj"], ix["neg_idx"]].astype(jnp.float32)
    pusher0 = jnp.where(ix["pusher0_is_neg"][:, None, None, None],
                        negs, pusher0)
    pusher1 = data.tmpl_patches[ix["pusher1_obj"],
                                ix["pusher1_pose"]].astype(jnp.float32)
    pusher2 = data.tmpl_patches[ix["pusher2_obj"],
                                ix["pusher2_pose"]].astype(jnp.float32)

    if random_background != 0:
        anchor = random_fill(kfill, anchor, random_background, bg_bank,
                             noise_bank)

    batch = jnp.stack([anchor, puller, pusher0, pusher1, pusher2], axis=1)
    return batch.reshape(groups * TRIPLET_SIZE, *anchor.shape[1:])


def manifold_layout(loss_slices, batch_size: int):
    """(n_triplets, n_pairs) for the legacy two-slice triplet+pair loss
    plan of network/manifold.prototxt:111-171 — the 330-row batch splits at
    row 198 into 66 (anchor, puller, pusher) triplets and 66 (anchor,
    puller) pairs.  Raises for any other slice plan: feeding a 5-group
    batch into this loss silently misaligns every row after the first
    group (a latent mismatch the reference's own buildBatch has)."""
    if len(loss_slices) != 2:
        raise ValueError(
            f"manifold_layout expects a triplet+pair two-slice plan, got "
            f"{loss_slices!r}")
    (b0, e0, n0, p0), (b1, e1, n1, p1) = loss_slices
    e1 = batch_size if e1 == -1 else e1
    if not (n0 == 1 and p0 == 0 and n1 == 0 and p1 == 1 and b1 == e0):
        raise ValueError(
            f"unsupported two-slice plan {loss_slices!r}: need contiguous "
            "(triplets, num_negatives=1) then (pairs, use_pair=1)")
    if (e0 - b0) % 3 or (e1 - b1) % 2:
        raise ValueError(
            f"slice rows not divisible by group size: {loss_slices!r}")
    return (e0 - b0) // 3, (e1 - b1) // 2


def manifold_batch_indices(key: jax.Array, it: jnp.ndarray,
                           n_triplets: int, n_pairs: int, data: DeviceData,
                           bootstrapping=False,
                           knn_tables=None) -> dict:
    """Index selection for the triplet+pair layout (the Wohlhart original
    formulation, network/manifold.prototxt): anchors walk the linear id
    scheme (obj = id % O, pose = id / O — same as buildBatch :67-68);
    puller = most similar template; the triplet's single pusher uses the
    pusher0 semantics (elevation-gated for rotInv objects, != puller
    otherwise, reference :79-92), replaced under bootstrapping by the
    misclassified kNN template when one exists (:103-129)."""
    O = data.nr_objects
    Ntr = data.nr_training_poses
    T = data.nr_template_poses
    n = n_triplets + n_pairs

    linear = it * n + jnp.arange(n)
    obj = (linear % O).astype(jnp.int32)
    pose = ((linear // O) % Ntr).astype(jnp.int32)
    puller = data.max_sim_tmpl[obj, pose, 0]

    tob = obj[:n_triplets]
    tpo = pose[:n_triplets]
    tpu = puller[:n_triplets]
    rot = data.rot_inv[tob] != 0
    ks = jax.random.split(key, 2)
    p_rot = _masked_uniform(ks[0], data.elev_ok[tob, tpu])
    p_plain = _uniform_except(ks[1], T, tpu)
    pusher_obj = tob
    pusher_pose = jnp.where(rot, p_rot, p_plain)
    if knn_tables is not None:
        knn, _ = knn_tables
        knn_obj = knn[tob, tpo, 0]
        knn_pose = knn[tob, tpo, 1]
        missed = ((knn_obj != tob) | (knn_pose != tpu)) & bootstrapping
        pusher_obj = jnp.where(missed, knn_obj, pusher_obj)
        pusher_pose = jnp.where(missed, knn_pose, pusher_pose)
    elif isinstance(bootstrapping, bool):
        if bootstrapping:
            raise ValueError("bootstrapping requires knn_tables")
    # else: traced flag, no tables — cannot act; off (see batch_indices)

    return dict(obj=obj, pose=pose, puller=puller,
                pusher_obj=pusher_obj, pusher_pose=pusher_pose)


@partial(jax.jit, static_argnames=("n_triplets", "n_pairs",
                                   "random_background"))
def build_batch_manifold(key: jax.Array, it: jnp.ndarray, n_triplets: int,
                         n_pairs: int, data: DeviceData,
                         random_background: int = 0,
                         bg_bank: Optional[jnp.ndarray] = None,
                         bootstrapping=False,
                         knn_tables=None,
                         noise_bank: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Assemble one triplet+pair batch
    [(3 * n_triplets + 2 * n_pairs), 64, 64, 7] matching the legacy
    ``manifold`` net's loss_slices ((0, 198, 1, 0), (198, -1, 0, 1)):
    rows [0, 3t) are (anchor, puller, pusher) groups, rows [3t, ..) are
    (anchor, puller) pairs.  Anchors get the background fill, as in
    buildBatch (reference src/networksolver.cpp:168-171)."""
    kidx, kfill = jax.random.split(key)
    ix = manifold_batch_indices(kidx, it, n_triplets, n_pairs, data,
                                bootstrapping, knn_tables)

    anchor = data.train_patches[ix["obj"], ix["pose"]].astype(jnp.float32)
    puller = data.tmpl_patches[ix["obj"], ix["puller"]].astype(jnp.float32)
    pusher = data.tmpl_patches[ix["pusher_obj"],
                               ix["pusher_pose"]].astype(jnp.float32)

    if random_background != 0:
        anchor = random_fill(kfill, anchor, random_background, bg_bank,
                             noise_bank)

    t = n_triplets
    trip = jnp.stack([anchor[:t], puller[:t], pusher], axis=1)
    pair = jnp.stack([anchor[t:], puller[t:]], axis=1)
    shp = anchor.shape[1:]
    return jnp.concatenate([trip.reshape(3 * t, *shp),
                            pair.reshape(2 * n_pairs, *shp)])


def class_batch_indices(key: jax.Array, it: jnp.ndarray, groups: int,
                        data: DeviceData, bootstrapping: bool = False,
                        knn_tables=None) -> dict:
    """buildBatchClass (reference src/networksolver.cpp:188-259): the
    class-level variant — puller is a *random* same-class template and all
    three pushers come from other classes (mutually distinct); under
    bootstrapping, misclassified kNN *objects* (with random poses) replace
    pushers 1 and 2.  Library function, like the reference (never called
    from the main path)."""
    O = data.nr_objects
    Ntr = data.nr_training_poses
    T = data.nr_template_poses

    linear = it * groups + jnp.arange(groups)
    obj = (linear % O).astype(jnp.int32)
    pose = ((linear // O) % Ntr).astype(jnp.int32)

    ks = jax.random.split(key, 8)
    puller = jax.random.randint(ks[0], obj.shape, 0, T)

    # three distinct other-class objects (sequential exclusion draws)
    p0_obj = _uniform_except(ks[1], O, obj)
    p1_obj = _uniform_except(ks[2], O, obj)
    p1_obj = jnp.where(p1_obj == p0_obj, (p1_obj + 1) % O, p1_obj)
    p1_obj = jnp.where(p1_obj == obj, (p1_obj + 1) % O, p1_obj)
    p2_obj = (obj + 1) % O
    for _ in range(2):  # walk to a free slot among <= 4 taken values
        clash = (p2_obj == obj) | (p2_obj == p0_obj) | (p2_obj == p1_obj)
        p2_obj = jnp.where(clash, (p2_obj + 1) % O, p2_obj)

    poses_r = jax.random.randint(ks[3], (3,) + obj.shape, 0, T)

    if bootstrapping and knn_tables is not None:
        knn, _ = knn_tables
        knn_obj = knn[obj, pose, 0]
        p1_obj = jnp.where(knn_obj != obj, knn_obj, p1_obj)
        p2_obj = jnp.where(knn_obj != obj, knn[obj, pose, 2], p2_obj)

    return dict(obj=obj, pose=pose, puller=puller,
                pusher0_obj=p0_obj, pusher0_pose=poses_r[0],
                pusher1_obj=p1_obj, pusher1_pose=poses_r[1],
                pusher2_obj=p2_obj, pusher2_pose=poses_r[2])


@partial(jax.jit, static_argnames=("groups", "bootstrapping",
                                   "random_background"))
def build_batch_class(key: jax.Array, it: jnp.ndarray, groups: int,
                      data: DeviceData, random_background: int = 0,
                      bg_bank: Optional[jnp.ndarray] = None,
                      bootstrapping: bool = False,
                      knn_tables=None,
                      noise_bank: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Class-level batch assembly [groups * 5, 64, 64, 7]."""
    kidx, kfill = jax.random.split(key)
    ix = class_batch_indices(kidx, it, groups, data, bootstrapping,
                             knn_tables)
    anchor = data.train_patches[ix["obj"], ix["pose"]]
    puller = data.tmpl_patches[ix["obj"], ix["puller"]]
    pushers = [data.tmpl_patches[ix[f"pusher{i}_obj"], ix[f"pusher{i}_pose"]]
               for i in range(3)]
    if random_background != 0:
        anchor = random_fill(kfill, anchor, random_background, bg_bank,
                             noise_bank)
    batch = jnp.stack([anchor, puller] + pushers, axis=1)
    return batch.reshape(groups * TRIPLET_SIZE, *anchor.shape[1:])


def epoch_iters(data: DeviceData, batch_size: int) -> int:
    """epoch_iter = nr_objects * nr_training_poses / groups (reference
    src/networksolver.cpp:297-298)."""
    groups = batch_size // TRIPLET_SIZE
    return max(1, (data.nr_objects * data.nr_training_poses) // groups)
