"""Full-scale end-to-end benchmark: 15 objects at the LineMOD geometry.

Reproduces the reference's default workload shape hermetically: 15 objects,
LineMOD intrinsics/scales, icosphere subdiv 2 templates (623 views) +
subdiv 3 training (2412 views) per object, batch 300, the full metric
protocol — generation, training rounds, and evaluation all timed on the
TPU.  Writes a JSON summary.

Run: PYTHONPATH=. python scripts/bench_e2e.py [workdir] [--rounds N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SHAPES = [("cube", 0.10, 2), ("tetra", 0.12, 2), ("sphere", 0.10, 3),
          ("cylinder", 0.10, 3), ("cone", 0.12, 3), ("torus", 0.13, 3),
          ("cube", 0.14, 2), ("sphere", 0.13, 4), ("cylinder", 0.13, 2),
          ("cone", 0.09, 2), ("torus", 0.10, 2), ("tetra", 0.09, 2),
          ("sphere", 0.08, 2), ("cylinder", 0.08, 4), ("cube", 0.08, 2)]


def main(base="/tmp/p3d_bench_e2e", rounds=3):
    import jax
    import jax.numpy as jnp

    from pose3d_tpu.config import Config
    from pose3d_tpu.data.dataset import (DatasetManager, SampleSet,
                                         create_synth_samples)
    from pose3d_tpu.data import hdf5cache
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    from pose3d_tpu.eval import evaluator
    from pose3d_tpu.models import NETWORKS
    from pose3d_tpu.models.manifold import descriptor_fn
    from pose3d_tpu.render import make_test_mesh
    from pose3d_tpu.train.solver import Solver

    names = [f"{k}{i}" for i, (k, _, _) in enumerate(SHAPES)]
    hdf5 = os.path.join(base, "h5")
    out = os.path.join(base, "out")
    os.makedirs(hdf5, exist_ok=True)

    cfg = Config(dataset_path=base, hdf5_path=hdf5 + "/", output_path=out
                 + "/", models=names, used_models=names,
                 rot_inv=[0] * len(names), inplane=True, use_real=False,
                 random_background=3, net_name="manifold_rgbd_16",
                 num_epochs=1, num_training_rounds=rounds,
                 num_bootstrapping_rounds=1, log_epoch=10**9,
                 batch_size=300)

    # ---- generation (synthetic-only: use_real=False still needs the real
    # cache files to exist; write empty ones)
    t0 = time.time()
    n_views = 0
    for name, (kind, size, detail) in zip(names, SHAPES):
        if hdf5cache.caches_exist(hdf5, name):
            continue
        mesh = make_test_mesh(kind, size, detail=detail)
        idx = cfg.model_index[name]
        tmpl = create_synth_samples(mesh, LINEMOD_K, idx, 2, True)
        synth = create_synth_samples(mesh, LINEMOD_K, idx, 3, True)
        n_views += len(tmpl) + len(synth)
        real_p, synth_p, tmpl_p = hdf5cache.cache_paths(hdf5, name)
        hdf5cache.write_samples(real_p, np.zeros((0, 64, 64, 7), np.float32),
                                np.zeros((0, 8), np.float32))
        hdf5cache.write_samples(tmpl_p, tmpl.patches, tmpl.labels)
        hdf5cache.write_samples(synth_p, synth.patches, synth.labels)
        print(f"  generated {name}: {len(tmpl)}+{len(synth)} views "
              f"({time.time()-t0:.0f}s)", flush=True)
    gen_s = time.time() - t0

    t0 = time.time()
    db = DatasetManager(cfg)
    db.generate_datasets()
    # synthetic-only: use training split for "test" queries (protocol check)
    data = db.to_device()
    load_s = time.time() - t0
    print(f"device sets: train {data.train_patches.shape} "
          f"tmpl {data.tmpl_patches.shape} (gen {gen_s:.0f}s load "
          f"{load_s:.0f}s)", flush=True)

    t0 = time.time()
    solver = Solver(cfg, data)
    state = solver.train()
    train_s = time.time() - t0
    iters = int(state["iter"])
    print(f"trained {iters} iters in {train_s:.0f}s "
          f"({iters*300/max(train_s,1e-9):,.0f} samples/s e2e)", flush=True)

    t0 = time.time()
    fn = descriptor_fn(NETWORKS[cfg.net_name])
    hist = evaluator.compute_histogram(
        fn, state["params"], data.tmpl_patches, data.tmpl_labels,
        data.train_patches, data.train_labels, cfg.rot_inv, k=cfg.knn)
    eval_s = time.time() - t0
    names_h = ["wrong-class", "exact", "<10", "<20", "<40", "<180", "mean",
               "median"]
    print("TRAIN-set histogram:", {n: round(float(v), 3)
                                   for n, v in zip(names_h, hist)},
          flush=True)

    summary = {
        "objects": len(names), "views_rendered": n_views,
        "gen_seconds": round(gen_s, 1), "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1), "train_iters": iters,
        "train_samples_per_s": round(iters * 300 / max(train_s, 1e-9), 1),
        "histogram": {n: round(float(v), 4) for n, v in zip(names_h, hist)},
    }
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "bench_e2e.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/p3d_bench_e2e"
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    main(base, rounds)
