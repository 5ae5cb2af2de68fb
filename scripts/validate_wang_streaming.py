"""Large-class-count streaming flagship (round-3 verdict item 2).

The `manifold_wang` configuration (reference configbb.ini:8-18 +
network/manifold_wang.prototxt:4,104: 64-D descriptors, 4 input channels,
dozens of objects) at a scale where the RESIDENT training path cannot
exist: 48 procedural objects x (623 subdiv-2 templates + 2359 subdiv-3
training views) of f32 7-channel patches = ~16.6 GB of sample tensors —
over the single v5e chip's 16 GB HBM.  The out-of-core third of the
codebase carries it end to end:

  dataset build: device-rendered (one dispatch per mesh, pipelined
    fetches) -> flat native mmap caches (data/native_cache.py format,
    written incrementally);
  training: StreamingSolver — epoch-long index mining on device,
    native threaded gathers, double-buffered bf16 host->device
    transfers (DevicePrefetcher), hard negatives ON (three
    near-identical mesh pairs with the partner's templates streamed as
    negs_<m>, reference src/networksolver.cpp:96-101), plus a
    bootstrapping round (computeKNN over streamed descriptors);
  evaluation: streamed template descriptors + a held-out-pose query
    subsample through the protocol histogram, with retrieval gates.

Run: PYTHONPATH=.:/root/.axon_site python scripts/validate_wang_streaming.py
Writes LEARNING_WANG_r4.json.  Wall time is dominated by the tunnel link
(~58 MB/s host->device, ~20 MB/s device->host on this image); every
transfer byte is recorded in the artifact.
"""

import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_OBJECTS = 48
TMPL_SUBDIV, TRAIN_SUBDIV = 2, 3
N_NEGS = 64
PAIR_BASES = [0, 2, 4]      # objects 0/1, 2/3, 4/5 are near-identical pairs
HBM_BYTES = 16 * 1024**3

SHAPE_KINDS = ["cube", "tetra", "sphere", "cylinder", "cone", "torus"]


def _shapes():
    rng = np.random.default_rng(11)
    out = []
    for i in range(N_OBJECTS):
        if i in (1, 3, 5):   # near-identical partner of i-1 (~5% bigger)
            k, s, d = out[i - 1]
            out.append((k, s * 1.05, d))
            continue
        k = SHAPE_KINDS[i % len(SHAPE_KINDS)]
        s = float(rng.uniform(0.08, 0.14))
        d = int(rng.integers(2, 4))
        out.append((k, s, d))
    return out


class _CacheWriter:
    """Incremental writer for the native cache format (v1 header; see
    data/native_cache.py): header + N x CHW f32 data + N x L labels."""

    def __init__(self, path, n, c, h, w, label_dim):
        self.f = open(path, "wb")
        hdr = np.zeros(10, np.uint32)
        hdr[:2].view(np.uint64)[0] = 0x503344434143481
        hdr[2] = 1
        hdr[3:8] = [n, c, h, w, label_dim]
        self.f.write(hdr.tobytes())
        self.labels = []
        self.n_written = 0
        self.n = n

    def append(self, patches_nhwc: np.ndarray, labels: np.ndarray):
        chw = np.ascontiguousarray(
            np.transpose(patches_nhwc, (0, 3, 1, 2)), np.float32)
        self.f.write(chw.tobytes())
        self.labels.append(np.asarray(labels, np.float32))
        self.n_written += len(chw)

    def close(self):
        assert self.n_written == self.n, (self.n_written, self.n)
        self.f.write(np.concatenate(self.labels).tobytes())
        self.f.close()


def build_caches(base, shapes, log):
    """Device-render all objects into train/templates caches (pipelined:
    up to 3 meshes in flight while the oldest fetches/writes)."""
    import jax
    import jax.numpy as jnp
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.data.dataset import create_synth_samples_pair
    from pose3d_tpu.render import make_test_mesh

    train_p = os.path.join(base, "train.cache")
    tmpl_p = os.path.join(base, "templates.cache")
    lab_p = os.path.join(base, "labels.npz")
    if all(os.path.exists(p) for p in (train_p, tmpl_p, lab_p)):
        z = np.load(lab_p)
        return z["train"], z["tmpl"], 0.0, 0.0

    t0 = time.time()
    # one probe mesh sizes the shared program's counts
    probe_t, probe_s, probe_ovf, probe_retry = create_synth_samples_pair(
        make_test_mesh(*shapes[0]), LINEMOD_K, 0, TMPL_SUBDIV,
        TRAIN_SUBDIV, True, to_host=False, defer_overflow=True,
        out_dtype="bfloat16")
    n_t, n_s = len(probe_t.patches), len(probe_s.patches)
    wt = _CacheWriter(train_p + ".tmp", N_OBJECTS * n_s, 7, 64, 64, 8)
    wm = _CacheWriter(tmpl_p + ".tmp", N_OBJECTS * n_t, 7, 64, 64, 8)
    train_l, tmpl_l = [], []
    fetch_s = 0.0
    inflight = deque()

    def drain():
        nonlocal fetch_s
        i, tmpl, synth, ovf, retry = inflight.popleft()
        if bool(jax.device_get(ovf)):
            tmpl, synth = retry()
        tf = time.time()
        tp = np.asarray(tmpl.patches.astype(jnp.float32))
        sp = np.asarray(synth.patches.astype(jnp.float32))
        fetch_s += time.time() - tf
        wm.append(tp, tmpl.labels)
        wt.append(sp, synth.labels)
        tmpl_l.append(tmpl.labels)
        train_l.append(synth.labels)
        log(f"  obj {i}: fetched+cached {len(tp)}+{len(sp)} views "
            f"(+{time.time()-t0:.0f}s)")

    for i, (k, s, d) in enumerate(shapes):
        if i == 0:
            inflight.append((0, probe_t, probe_s, probe_ovf, probe_retry))
        else:
            tmpl, synth, ovf, retry = create_synth_samples_pair(
                make_test_mesh(k, s, detail=d), LINEMOD_K, i,
                TMPL_SUBDIV, TRAIN_SUBDIV, True, to_host=False,
                defer_overflow=True, out_dtype="bfloat16")
            inflight.append((i, tmpl, synth, ovf, retry))
        if len(inflight) >= 3:
            drain()
    while inflight:
        drain()
    wt.close()
    wm.close()
    os.replace(train_p + ".tmp", train_p)
    os.replace(tmpl_p + ".tmp", tmpl_p)
    trl = np.stack(train_l)
    tml = np.stack(tmpl_l)
    np.savez(lab_p, train=trl, tmpl=tml)
    return trl, tml, time.time() - t0, fetch_s


def build_negatives(base, tmpl_cache, n_t):
    """negs_<m> analogue: for each paired object, the partner's first
    N_NEGS template patches (the confusable impostors)."""
    from pose3d_tpu.data.native_cache import NativeCache
    negs_p = os.path.join(base, "negs.cache")
    counts = np.zeros(N_OBJECTS, np.int32)
    for b in PAIR_BASES:
        counts[b] = counts[b + 1] = N_NEGS
    if os.path.exists(negs_p):
        return negs_p, counts
    w = _CacheWriter(negs_p + ".tmp", N_OBJECTS * N_NEGS, 7, 64, 64, 8)
    src = NativeCache(tmpl_cache)
    for o in range(N_OBJECTS):
        partner = o + 1 if o % 2 == 0 else o - 1
        use = partner if counts[o] else o     # unpaired rows never drawn
        rows = np.arange(use * n_t, use * n_t + N_NEGS)
        p, l = src.gather(rows)
        w.append(p, l)
    src.close()
    w.close()
    os.replace(negs_p + ".tmp", negs_p)
    return negs_p, counts


def main(base: str = "/tmp/p3d_wang", artifact: str | None = None) -> int:
    import jax
    from pose3d_tpu.utils.tpuguard import require_tpu
    on_tpu = require_tpu()
    jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import ml_dtypes

    from pose3d_tpu.config import Config
    from pose3d_tpu.data.native_cache import NativeCache
    from pose3d_tpu.eval import evaluator
    from pose3d_tpu.train.streaming import (StreamingSolver,
                                            StreamingSources, light_tables)

    os.makedirs(base, exist_ok=True)
    shapes = _shapes()

    def log(msg):
        print(msg, flush=True)

    t_all = time.time()
    jnp.zeros((8, 128)).sum().block_until_ready()
    trl, tml, build_s, fetch_s = build_caches(base, shapes, log)
    O, Ntr = trl.shape[:2]
    T = tml.shape[1]
    log(f"caches ready: {O} objects, {Ntr} train + {T} template poses "
        f"each (build {build_s:.0f}s, fetch {fetch_s:.0f}s)")

    negs_p, neg_counts = build_negatives(
        base, os.path.join(base, "templates.cache"), T)

    resident_bytes = O * (Ntr + T) * 64 * 64 * 7 * 4
    log(f"resident-f32 requirement: {resident_bytes/1e9:.1f} GB vs "
        f"{HBM_BYTES/1e9:.1f} GB HBM -> streaming is the only path")

    names = [f"{k}{i}" for i, (k, _, _) in enumerate(shapes)]
    cfg = Config(models=names, used_models=names, rot_inv=[0] * O,
                 inplane=True, use_real=False, random_background=1,
                 net_name="manifold_wang", num_epochs=1,
                 num_training_rounds=3, num_bootstrapping_rounds=1,
                 log_epoch=10**9, batch_size=300, output_path="")
    cfg.validate()

    tables = light_tables(trl, tml, np.zeros(O, np.int32), inplane=True,
                          hard_neg_count=neg_counts)
    src = StreamingSources(
        train=NativeCache(os.path.join(base, "train.cache")),
        templates=NativeCache(os.path.join(base, "templates.cache")),
        nr_objects=O, nr_training_poses=Ntr, nr_template_poses=T,
        negatives=NativeCache(negs_p), max_negatives=N_NEGS)
    solver = StreamingSolver(cfg, src, tables,
                             transfer_dtype=ml_dtypes.bfloat16)
    log(f"epoch_iter {solver.epoch_iter} (batch {solver.batch_size})")

    t_train = time.time()
    epoch_stats = []
    state = solver.init_state()
    key = jax.random.key(cfg.seed + 99)
    total_rounds = cfg.num_training_rounds + cfg.num_bootstrapping_rounds
    bootstrapping = False
    for rnd in range(total_rounds):
        if rnd >= cfg.num_training_rounds and not bootstrapping:
            tk = time.time()
            solver.compute_knn(state["params"])
            bootstrapping = True
            log(f"bootstrap kNN mined over {O*(Ntr+T)} streamed "
                f"descriptors ({time.time()-tk:.0f}s)")
        key, ek = jax.random.split(key)
        te = time.time()
        state, loss = solver.train_epoch(state, ek, bootstrapping)
        dt = time.time() - te
        st = solver.last_prefetch_stats
        sps = st["batches"] * solver.batch_size / dt
        epoch_stats.append({
            "round": rnd, "bootstrapping": bootstrapping,
            "seconds": round(dt, 1), "loss": round(loss, 4),
            "samples_per_s": round(sps, 1),
            "consumer_stall_s": round(st["consumer_stall_s"], 1),
            "producer_gather_s": round(st["producer_gather_s"], 1),
        })
        log(f"round {rnd} (boot={bootstrapping}): {dt:.0f}s, "
            f"{sps:,.0f} streamed samples/s, stall "
            f"{st['consumer_stall_s']:.0f}s, loss {loss:.4f}")
    train_s = time.time() - t_train

    # ---- evaluation: streamed templates + held-out-grid query subsample
    t_eval = time.time()
    dt_desc = solver.streamed_descriptors(state["params"], src.templates,
                                          O * T)
    rng = np.random.default_rng(3)
    n_q = 12000
    qrows = np.sort(rng.choice(O * Ntr, n_q, replace=False))
    dq_parts, ql_parts = [], []
    for s in range(0, n_q, 1000):
        rows = qrows[s:s + 1000]
        host, lab = src.train.gather(rows)
        fn = solver._desc_jit
        dq_parts.append(fn(state["params"],
                           jnp.asarray(host.astype(ml_dtypes.bfloat16))
                           .astype(jnp.float32)))
        ql_parts.append(lab)
    dq = jnp.concatenate(dq_parts)
    ql = np.concatenate(ql_parts)
    tl = tml.reshape(-1, 8)
    hist = evaluator.histogram_from_descriptors(
        dq, dt_desc, ql, tl, np.zeros(O, np.int32), k=cfg.knn)
    eval_s = time.time() - t_eval
    names_h = ["wrong-class", "exact", "<10", "<20", "<40", "<180",
               "mean", "median"]
    log("query histogram: " + str({n: round(float(v), 3)
                                   for n, v in zip(names_h, hist)}))

    checks = {
        "wrong_class": (float(hist[0]), hist[0] < 0.05),
        "lt20": (float(hist[3]), hist[3] > 0.85),
        "descriptor_dim_64": (int(dt_desc.shape[1]),
                              dt_desc.shape[1] == 64),
        "exceeds_residency": (round(resident_bytes / 1e9, 1),
                              resident_bytes > HBM_BYTES),
    }
    ok = all(v[1] for v in checks.values())
    log("WANG STREAMING VALIDATION: " + ("PASS" if ok else "WEAK"))

    summary = {
        "platform": jax.default_backend(), "tpu": on_tpu,
        "protocol": f"{O} procedural objects (3 near-identical pairs "
                    f"with streamed hard negatives), manifold_wang "
                    f"(64-D, 4-ch), subdiv {TMPL_SUBDIV}/{TRAIN_SUBDIV},"
                    f" {cfg.num_training_rounds}+"
                    f"{cfg.num_bootstrapping_rounds} rounds, bf16 "
                    "host->device transfers, f32 native mmap caches",
        "objects": O, "train_poses": Ntr, "template_poses": T,
        "resident_f32_gb_required": round(resident_bytes / 1e9, 2),
        "hbm_gb": round(HBM_BYTES / 1e9, 1),
        "cache_build_seconds": round(build_s, 1),
        "cache_fetch_seconds": round(fetch_s, 1),
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "epochs": epoch_stats,
        "query_subsample": n_q,
        "histogram": {n: round(float(v), 4)
                      for n, v in zip(names_h, hist)},
        "checks": {k: {"value": v, "pass": bool(p)}
                   for k, (v, p) in checks.items()},
        "pass": bool(ok),
        "wall_seconds": round(time.time() - t_all, 1),
    }
    if artifact is None:
        artifact = os.path.join(os.path.dirname(__file__), "..",
                                "LEARNING_WANG_r4.json")
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=1)
    log("wrote " + os.path.abspath(artifact))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/p3d_wang",
                  sys.argv[2] if len(sys.argv) > 2 else None))
