"""Learning validation: train on a hermetic procedural dataset and report
the protocol metrics.  Passes when the descriptor actually learns pose
retrieval (exact-match and <20-degree mass far above chance).

Run: PYTHONPATH=. python scripts/validate_learning.py [workdir] [artifact]
Writes logs/checkpoints under <workdir>/out, prints the final histogram,
and records a gated JSON artifact (default LEARNING.json at the repo root)
with hard thresholds: wrong-class < 2%, <20 deg > 95%, median within 2x of
the pose-oracle floor of the sampling sphere.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

THRESHOLDS = {"wrong_class_max": 0.02, "lt20_min": 0.95,
              "median_vs_floor_max": 2.0}


def main(base: str = "/tmp/p3d_validate",
         artifact: str | None = None, bf16_train: bool = False,
         bg_mode: int = 1) -> int:
    """``bg_mode`` selects the background augmentation under gate:
    1 = color noise (the round-2/3 gated mode), 3 = SimplexFractal (the
    reference's actual LineMOD default — config.ini:14 maps to fractal in
    src/datasetmanager.cpp:786-800), -1 = per-sample mix, 4 = real-bank
    paste (gated against the hermetic synthetic_crop_bank).  Each mode
    must clear the SAME thresholds (round-3 verdict item 6)."""
    from make_disk_fixture import make_linemod_fixture, write_fixture_config
    from pose3d_tpu.config import load_config
    from pose3d_tpu.data.dataset import DatasetManager
    from pose3d_tpu.eval import evaluator
    from pose3d_tpu.models import NETWORKS
    from pose3d_tpu.models.manifold import descriptor_fn
    from pose3d_tpu.train.solver import Solver

    os.makedirs(base, exist_ok=True)
    data_dir = os.path.join(base, "data")
    if not os.path.exists(os.path.join(data_dir, "cube.ply")):
        print("generating disk fixture...", flush=True)
        # enough real frames that the ceil-half template-bucket split
        # (dataset.py:596) leaves a test set with real mass — 10 frames
        # degenerates to ~1 test patch/object, meaningless histogram
        make_linemod_fixture(data_dir, n_frames=48)
    cfgp = os.path.join(base, "config.ini")
    # h5 caches are keyed by model name like the reference's (a config
    # subdiv change with stale caches silently reuses them) — keep this
    # protocol's caches in a subdiv-tagged dir
    write_fixture_config(cfgp, data_dir, os.path.join(base, "h5_s22"),
                         os.path.join(base, "out"))
    cfg = load_config(cfgp)
    # richer spheres + a real schedule
    import dataclasses
    # subdiv-2 templates (623 views): with subdiv-1's 162-view sphere the
    # pose-oracle floor median alone is ~32 deg, so the <20-deg gate can
    # fail on geometry while retrieval is perfect (median == floor)
    cfg = dataclasses.replace(
        cfg, template_subdiv=2, training_subdiv=2, num_training_rounds=8,
        num_bootstrapping_rounds=2, num_epochs=1, log_epoch=2,
        batch_size=300, random_background=bg_mode)
    if bf16_train:
        # gate the OPT-IN bf16 training mode (config compute_dtype):
        # bf16 trunk intermediates through the fused train step — the
        # step is ~85% fwd+bwd, so this is the main step-throughput
        # lever left; it must still learn to the same thresholds
        cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")

    t0 = time.time()
    db = DatasetManager(cfg)
    db.generate_datasets()
    data = db.to_device()
    print(f"dataset: train {data.train_patches.shape} "
          f"templates {data.tmpl_patches.shape} "
          f"test {data.test_patches.shape} ({time.time()-t0:.0f}s)",
          flush=True)

    bg_bank = None
    if bg_mode in (4, -1):
        # hermetic bank for the real-paste mode (mode 4; the mix mode -1
        # draws it too) — backgrounds.synthetic_crop_bank reproduces the
        # bank statistics without a dataset download
        import jax.numpy as _j
        from pose3d_tpu.data.backgrounds import synthetic_crop_bank
        bg_bank = _j.asarray(synthetic_crop_bank(256, seed=5))

    solver = Solver(cfg, data, bg_bank=bg_bank)
    state = solver.train()
    print(f"trained {int(state['iter'])} iters in {time.time()-t0:.0f}s",
          flush=True)

    fn = descriptor_fn(NETWORKS[cfg.net_name])
    hist = evaluator.compute_histogram(
        fn, state["params"], data.tmpl_patches, data.tmpl_labels,
        data.test_patches, data.test_labels, cfg.rot_inv, k=cfg.knn)
    names = ["wrong-class", "exact", "<10", "<20", "<40", "<180", "mean",
             "median"]
    print("TEST histogram:")
    for n, v in zip(names, hist):
        print(f"  {n:>12}: {v:.3f}")

    # the bf16 serving mode (trunk intermediates in bf16, ~2x descriptor
    # throughput on TPU — scripts/profile_forward.py) must retrieve the
    # same poses: record its histogram side by side as evidence
    import jax.numpy as _jnp
    fn16 = descriptor_fn(NETWORKS[cfg.net_name],
                         compute_dtype=_jnp.bfloat16)
    hist16 = evaluator.compute_histogram(
        fn16, state["params"], data.tmpl_patches, data.tmpl_labels,
        data.test_patches, data.test_labels, cfg.rot_inv, k=cfg.knn)
    print("TEST histogram (bf16 serving mode):")
    for n, v in zip(names, hist16):
        print(f"  {n:>12}: {v:.3f}")

    local_index = {m: i for i, m in enumerate(cfg.used_models)}
    conf = evaluator.compute_confusion_matrix(
        fn, state["params"], data.tmpl_patches, data.tmpl_labels,
        data.test_patches, data.test_labels, cfg.models, local_index,
        k=cfg.knn)
    print("confusion:\n", np.round(conf, 3))

    # geometric floor: even a pose-oracle retriever can't beat the angular
    # distance to the nearest template on the sampling sphere
    import jax.numpy as jnp
    from pose3d_tpu.ops import quaternion as Q
    floors = []
    for o in range(data.nr_objects):
        d = Q.pairwise_angular_distance(data.test_labels[o, :, 1:5],
                                        data.tmpl_labels[o, :, 1:5])
        floors.append(np.degrees(np.asarray(jnp.min(d, axis=1))))
    all_floors = np.concatenate(floors)
    floor_med = float(np.median(all_floors))
    oracle_lt20 = float(np.mean(all_floors < 20.0))
    print(f"pose-oracle floor median: {floor_med:.1f} deg, oracle <20deg "
          f"mass {oracle_lt20:.3f} (achieved median {hist[-1]:.1f})")

    # hard gate (VERDICT r2 item 8): classification solved, <20 deg mass
    # dominant, median within 2x of the oracle floor
    checks = {
        "wrong_class": (float(hist[0]),
                        hist[0] < THRESHOLDS["wrong_class_max"]),
        "lt20": (float(hist[3]), hist[3] > THRESHOLDS["lt20_min"]),
        "median_vs_floor": (
            float(hist[-1]),
            hist[-1] <= max(THRESHOLDS["median_vs_floor_max"] * floor_med,
                            10.0)),
    }
    ok = all(v[1] for v in checks.values())
    print("LEARNING VALIDATION:", "PASS" if ok else "WEAK", flush=True)

    import jax
    summary = {
        "platform": jax.default_backend(),
        "protocol": "procedural LineMOD fixture, 48 real frames/object, "
                    "subdiv 2/2, 8+2 rounds",
        "random_background_mode": bg_mode,
        "train_compute_dtype": cfg.compute_dtype,
        "test_patches": int(np.prod(data.test_patches.shape[:2])),
        "train_iters": int(state["iter"]),
        "histogram": {n: round(float(v), 4) for n, v in zip(names, hist)},
        "histogram_bf16_serving": {n: round(float(v), 4)
                                   for n, v in zip(names, hist16)},
        "pose_oracle_floor_median_deg": round(floor_med, 2),
        "pose_oracle_lt20_mass": round(oracle_lt20, 4),
        "thresholds": THRESHOLDS,
        "checks": {k: {"value": round(v, 4), "pass": bool(p)}
                   for k, (v, p) in checks.items()},
        "pass": bool(ok),
    }
    if artifact is None:
        artifact = os.path.join(os.path.dirname(__file__), "..",
                                "LEARNING.json")
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", os.path.abspath(artifact), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    args = sys.argv[1:]
    bf16 = "--bf16-train" in args
    args = [a for a in args if a != "--bf16-train"]
    mode = 1
    if "--mode" in args:
        i = args.index("--mode")
        mode = int(args[i + 1])
        del args[i:i + 2]
    sys.exit(main(args[0] if args else "/tmp/p3d_validate",
                  args[1] if len(args) > 1 else None, bf16_train=bf16,
                  bg_mode=mode))
