"""Command-line entry point.

``pose3d train <config.ini>`` reproduces the reference binary's behavior
(reference main.cpp:12-33): parse the INI, generate datasets if caches are
missing, train, snapshot — plus ``eval``, ``render`` and ``binarize``
subcommands the reference folds into flags/recompiles.
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np


def _build_db(cfg):
    from pose3d_tpu.data.dataset import DatasetManager
    db = DatasetManager(cfg)
    db.generate_datasets()
    return db


def _bank(cfg):
    import jax.numpy as jnp
    if cfg.random_background == 4 or cfg.random_background == -1:
        if cfg.background_path:
            from pose3d_tpu.data.backgrounds import (build_crop_bank,
                                                     load_backgrounds)
            return jnp.asarray(build_crop_bank(
                load_backgrounds(cfg.background_path)))
    return None


def cmd_train(args) -> int:
    from pose3d_tpu.config import load_config
    from pose3d_tpu.train.solver import Solver
    cfg = load_config(args.config)
    db = _build_db(cfg)
    solver = Solver(cfg, db.to_device(), bg_bank=_bank(cfg))
    # overlap the training programs' per-process executable loads with the
    # sample-upload/generation queue still draining on device (throwaway
    # dispatches; training results are bit-identical — see Solver.warm)
    solver.warm()
    state = solver.train(resume_iter=args.resume_iter,
                         weights=getattr(args, "weights", None))
    if cfg.binarization:
        solver.binarize(state)
    return 0


def cmd_export_weights(args) -> int:
    """Export the latest snapshot as a Caffe-readable .caffemodel[.h5].

    Pure weight-format conversion: builds the checkpoint restore template
    directly (params + opt + RNG + iter, exactly Solver.init_state minus
    the mesh placement) — no dataset generation or device sample upload.
    """
    import jax
    import jax.numpy as jnp
    from pose3d_tpu.config import load_config
    from pose3d_tpu.models import init_params
    from pose3d_tpu.models.caffe_io import save_caffemodel
    from pose3d_tpu.models.prototxt import load_spec
    from pose3d_tpu.train import checkpoint
    from pose3d_tpu.train.optim import caffe_sgd
    cfg = load_config(args.config)
    found = checkpoint.latest(cfg.output_path, cfg.net_name)
    if not found:
        print(f"no snapshot for {cfg.net_name} in {cfg.output_path}",
              file=sys.stderr)
        return 1
    spec = load_spec(cfg.network_path, cfg.net_name)
    kp, kr = jax.random.split(jax.random.key(cfg.seed))
    params0 = init_params(kp, spec)
    tx = caffe_sgd(cfg.learning_rate, cfg.momentum, cfg.weight_decay,
                   cfg.learning_policy, cfg.step_size, cfg.gamma)
    template = {"params": params0, "opt": tx.init(params0), "key": kr,
                "iter": jnp.zeros((), jnp.int32)}
    state = checkpoint.restore(found[0], template)
    save_caffemodel(args.out, state["params"], spec)
    print(f"wrote {args.out} (from {found[0]})")
    return 0


def cmd_binarize(args) -> int:
    from pose3d_tpu.config import load_config
    from pose3d_tpu.train import checkpoint
    from pose3d_tpu.train.solver import Solver
    cfg = load_config(args.config)
    db = _build_db(cfg)
    solver = Solver(cfg, db.to_device(), bg_bank=_bank(cfg))
    found = checkpoint.latest(cfg.output_path, cfg.net_name)
    if not found:
        print(f"no snapshot for {cfg.net_name} in {cfg.output_path}",
              file=sys.stderr)
        return 1
    state = checkpoint.restore(found[0], solver.init_state())
    solver.binarize(state, resume_iter=args.resume_iter)
    return 0


def cmd_eval(args) -> int:
    from pose3d_tpu.config import load_config
    from pose3d_tpu.eval import evaluator
    from pose3d_tpu.models import NETWORKS, apply
    from pose3d_tpu.models.manifold import descriptor_fn
    from pose3d_tpu.train import checkpoint
    from pose3d_tpu.train.solver import Solver
    cfg = load_config(args.config)
    db = _build_db(cfg)
    data = db.to_device()
    solver = Solver(cfg, data)

    if getattr(args, "hamming", False):
        # binary 128-bit retrieval from the binarization-head snapshot
        bin_name = cfg.binarization_net_name
        found = checkpoint.latest(cfg.output_path, bin_name)
        if not found:
            print(f"no snapshot for {bin_name} in {cfg.output_path}",
                  file=sys.stderr)
            return 1
        import jax
        import jax.numpy as jnp
        from pose3d_tpu.models import init_params
        from pose3d_tpu.models.manifold import trunk_param_names
        from pose3d_tpu.train.optim import caffe_sgd, freeze_trunk
        spec = NETWORKS[bin_name]
        params0 = init_params(jax.random.key(cfg.seed + 1), spec)
        tx = freeze_trunk(
            caffe_sgd(cfg.learning_rate, cfg.momentum, cfg.weight_decay,
                      cfg.learning_policy, cfg.step_size, cfg.gamma),
            trunk_param_names(spec))
        template = {"params": params0, "opt": tx.init(params0),
                    "key": jax.random.key(cfg.seed + 1),
                    "iter": jnp.zeros((), jnp.int32)}
        state = checkpoint.restore(found[0], template)
        fn = evaluator.binary_descriptor_fn(
            lambda p, x: apply(p, spec, x, bin_head=True))
    else:
        found = checkpoint.latest(cfg.output_path, cfg.net_name)
        if not found:
            print(f"no snapshot for {cfg.net_name} in {cfg.output_path}",
                  file=sys.stderr)
            return 1
        state = checkpoint.restore(found[0], solver.init_state())
        from pose3d_tpu.models.manifold import precision_from_config
        fn = descriptor_fn(NETWORKS[cfg.net_name],
                           *precision_from_config(cfg.serving_dtype))

    hist = evaluator.compute_histogram(
        fn, state["params"], data.tmpl_patches, data.tmpl_labels,
        data.test_patches, data.test_labels, cfg.rot_inv, k=cfg.knn)
    names = [f"<{b:g}" for b in evaluator.HISTOGRAM_BINS] + ["mean",
                                                             "median"]
    print("\t".join(names))
    print("\t".join(f"{v:.4g}" for v in hist))

    local_index = {m: i for i, m in enumerate(cfg.used_models)}
    conf = evaluator.compute_confusion_matrix(
        fn, state["params"], data.tmpl_patches, data.tmpl_labels,
        data.test_patches, data.test_labels, cfg.models, local_index,
        k=cfg.knn)
    print("confusion (row-normalized):")
    for m, row in zip(cfg.used_models, conf):
        print(m + "\t" + "\t".join(f"{x:.3f}" for x in row))
    return 0


def cmd_render(args) -> int:
    """Render the template views of one model to an .npz (debug/inspect)."""
    import jax.numpy as jnp

    from pose3d_tpu.config import load_config
    from pose3d_tpu.data.dataset import create_synth_samples
    from pose3d_tpu.render import load_mesh
    cfg = load_config(args.config)
    from pose3d_tpu.data.benchmarks import LINEMOD_K
    mesh = load_mesh(args.mesh) if args.mesh else None
    if mesh is None:
        import os
        for ext in (".ply", ".obj"):
            p = os.path.join(cfg.dataset_path, args.model + ext)
            if os.path.exists(p):
                mesh = load_mesh(p)
                break
    if mesh is None:
        print("mesh not found", file=sys.stderr)
        return 1
    samples = create_synth_samples(mesh, LINEMOD_K,
                                   cfg.model_index.get(args.model, 0),
                                   args.subdiv, cfg.inplane)
    np.savez(args.out, patches=samples.patches, labels=samples.labels)
    print(f"wrote {len(samples.patches)} patches to {args.out}")
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    p = argparse.ArgumentParser(
        prog="pose3d",
        description="TPU-native triplet-manifold pose estimation")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="generate datasets if missing + train")
    t.add_argument("config")
    t.add_argument("--resume-iter", type=int, default=0)
    t.add_argument("--weights", default=None, metavar="SNAPSHOT",
                   help="warm-start from a Caffe .caffemodel / .caffemodel.h5"
                        " (CopyTrainedLayersFrom semantics)")
    t.set_defaults(fn=cmd_train)

    x = sub.add_parser("export-weights",
                       help="export the latest snapshot as a Caffe "
                            ".caffemodel (binary proto) or .caffemodel.h5")
    x.add_argument("config")
    x.add_argument("--out", default="net.caffemodel.h5")
    x.set_defaults(fn=cmd_export_weights)

    b = sub.add_parser("binarize", help="train the 128-bit binarization head")
    b.add_argument("config")
    b.add_argument("--resume-iter", type=int, default=0)
    b.set_defaults(fn=cmd_binarize)

    e = sub.add_parser("eval", help="histogram + confusion from a snapshot")
    e.add_argument("config")
    e.add_argument("--hamming", action="store_true",
                   help="evaluate the binarized 128-bit head (Hamming kNN)")
    e.set_defaults(fn=cmd_eval)

    r = sub.add_parser("render", help="render template views to npz")
    r.add_argument("config")
    r.add_argument("model")
    r.add_argument("--mesh", default=None)
    r.add_argument("--subdiv", type=int, default=2)
    r.add_argument("--out", default="templates.npz")
    r.set_defaults(fn=cmd_render)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
