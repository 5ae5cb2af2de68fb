"""Property fuzz of the triplet index selection (buildBatch parity,
reference src/networksolver.cpp:52-186): across random shapes, rot_inv
flags, elevation masks, kNN tables and hard-negative availability, every
drawn index must stay in range and honor the selection contract — the
reference enforces these by rejection loops; here they are exact masked
draws, so a regression would silently train on wrong triplets."""

import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.data.batcher import batch_indices, build_batch
from pose3d_tpu.data.dataset import DeviceData


def _random_data(rng, O, Ntr, T, M):
    def patches(n0, n1):
        return jnp.asarray(
            rng.random((n0, n1, 4, 4, 7), np.float32))
    max_sim = rng.integers(0, T, size=(O, Ntr, 2)).astype(np.int32)
    elev = rng.random((O, T, T)) < 0.5
    # some (obj, puller) rows all-False to exercise the Gumbel fallback
    elev[0, :, :] = False
    # elevation gates never offer the puller itself (the reference redraws
    # until the gate passes, which excludes equality by construction)
    for o in range(O):
        np.fill_diagonal(elev[o], False)
    counts = rng.integers(0, M + 1, size=O).astype(np.int32)
    counts[rng.integers(0, O)] = 0                  # at least one without
    return DeviceData(
        train_patches=patches(O, Ntr),
        train_labels=jnp.zeros((O, Ntr, 8), jnp.float32),
        tmpl_patches=patches(O, T),
        tmpl_labels=jnp.zeros((O, T, 8), jnp.float32),
        test_patches=patches(O, 1),
        test_labels=jnp.zeros((O, 1, 8), jnp.float32),
        max_sim_tmpl=jnp.asarray(max_sim),
        rot_inv=jnp.asarray(rng.integers(0, 3, size=O), jnp.int32),
        elev_ok=jnp.asarray(elev),
        hard_negs=patches(O, max(M, 1)),
        hard_neg_count=jnp.asarray(counts),
    )


def test_fuzz_batch_index_invariants():
    rng = np.random.default_rng(11)
    for trial in range(8):
        O = int(rng.integers(1, 5))
        Ntr = int(rng.integers(2, 7))
        T = int(rng.integers(2, 9))
        M = int(rng.integers(1, 4))
        G = int(rng.integers(1, 7))
        data = _random_data(rng, O, Ntr, T, M)
        boot = bool(rng.integers(0, 2))
        knn = (jnp.asarray(np.stack([
                   rng.integers(0, O, size=(O, Ntr)),
                   rng.integers(0, T, size=(O, Ntr)),
                   rng.integers(0, O, size=(O, Ntr)),
                   rng.integers(0, T, size=(O, Ntr))], axis=-1)
               .astype(np.int32)),
               jnp.asarray(rng.random((O, Ntr)) < 0.5))
        for k in range(4):
            ix = {n: np.asarray(v) for n, v in batch_indices(
                jax.random.key(trial * 100 + k), jnp.int32(k), G, data,
                bootstrapping=boot, knn_tables=knn).items()}
            obj, pose = ix["obj"], ix["pose"]
            assert ((0 <= obj) & (obj < O)).all()
            assert ((0 <= pose) & (pose < Ntr)).all()
            np.testing.assert_array_equal(
                ix["puller"], np.asarray(data.max_sim_tmpl)[obj, pose, 0])

            p0 = ix["pusher0"]
            assert ((0 <= p0) & (p0 < T)).all()
            rot = np.asarray(data.rot_inv)[obj] != 0
            puller = ix["puller"]
            elev = np.asarray(data.elev_ok)
            for g in range(G):
                gate = elev[obj[g], puller[g]]
                if rot[g] and gate.any():
                    # elevation-gated draw stayed inside the gate
                    assert gate[p0[g]], (trial, k, g)
                elif not rot[g] and T > 1:
                    assert p0[g] != puller[g]

            # hard-negative override flags mirror availability exactly
            counts = np.asarray(data.hard_neg_count)
            np.testing.assert_array_equal(ix["pusher0_is_neg"],
                                          counts[obj] > 0)
            assert ((0 <= ix["neg_idx"])
                    & (ix["neg_idx"] < np.maximum(counts[obj], 1))).all()

            # pusher1: same class unless a bootstrap miss redirects it
            knn_np = np.asarray(knn[0])
            missed = boot & ((knn_np[obj, pose, 0] != obj)
                             | (knn_np[obj, pose, 1] != puller))
            exp_obj = np.where(missed, knn_np[obj, pose, 0], obj)
            np.testing.assert_array_equal(ix["pusher1_obj"], exp_obj)
            assert ((0 <= ix["pusher1_pose"])
                    & (ix["pusher1_pose"] < T)).all()

            # pusher2: other class on the random path
            use2 = missed & np.asarray(knn[1])[obj, pose]
            p2o = ix["pusher2_obj"]
            assert ((0 <= p2o) & (p2o < O)).all()
            if O > 1:
                assert (use2 | (p2o != obj)).all()
            assert ((0 <= ix["pusher2_pose"])
                    & (ix["pusher2_pose"] < T)).all()


def test_fuzz_batch_gather_layout():
    """build_batch emits (anchor, puller, pusher0, pusher1, pusher2) groups
    whose rows are exactly the gathers the indices dictate (bg fill off)."""
    rng = np.random.default_rng(23)
    data = _random_data(rng, 3, 4, 5, 2)
    G = 4
    key = jax.random.key(9)
    batch = np.asarray(build_batch(key, jnp.int32(1), G, data))
    kidx, _ = jax.random.split(key)
    ix = {n: np.asarray(v) for n, v in batch_indices(
        kidx, jnp.int32(1), G, data).items()}
    tr = np.asarray(data.train_patches)
    tp = np.asarray(data.tmpl_patches)
    hn = np.asarray(data.hard_negs)
    for g in range(G):
        np.testing.assert_array_equal(batch[5 * g],
                                      tr[ix["obj"][g], ix["pose"][g]])
        np.testing.assert_array_equal(batch[5 * g + 1],
                                      tp[ix["obj"][g], ix["puller"][g]])
        exp0 = (hn[ix["obj"][g], ix["neg_idx"][g]]
                if ix["pusher0_is_neg"][g]
                else tp[ix["obj"][g], ix["pusher0"][g]])
        np.testing.assert_array_equal(batch[5 * g + 2], exp0)
        np.testing.assert_array_equal(
            batch[5 * g + 3],
            tp[ix["pusher1_obj"][g], ix["pusher1_pose"][g]])
        np.testing.assert_array_equal(
            batch[5 * g + 4],
            tp[ix["pusher2_obj"][g], ix["pusher2_pose"][g]])
