"""Backward-pass anatomy of the fused train step's fwd+bwd core.

PROFILE_STEP.json shows fwd+bwd (2.1 ms at batch 300) is ~83% of the full
step, ~5x its bf16 compute bound.  This script localizes the bwd cost per
layer segment by growing the differentiated parameter set tail-first
(grads wrt {fc2} -> {fc1,fc2} -> {conv2,fc*} -> all): `stop_gradient` on
the excluded subtrees lets XLA DCE their whole backward segment, so the
DELTAS between rows are the marginal bwd cost of each segment.  A second
block runs trunk experiments (diagnostic, NOT the production model):

* fused parity stem — measured SLOWER for serving FORWARD
  (profile_forward.py history) but its pool-backward is a plain 4-way max
  bwd instead of select_and_scatter, which may flip the verdict for
  TRAINING;
* conv2 zero-padded to 16/32 output channels, sliced back before pooling
  (identical math) — tests whether the O=7 MXU lane starvation is what
  XLA actually bottlenecks on, or whether it pads internally anyway;
* mean-pool instead of ceil-max-pool (different math) — isolates the
  max-pool select_and_scatter backward cost.

Delta-method timing throughout (chained scan iterations inside ONE
program, n_lo vs n_hi; dependence threads through the params — see
profile_step.py / bench.py).

Run on TPU:  PYTHONPATH=. python scripts/profile_bwd.py
Run on CPU:  PYTHONPATH=. python scripts/profile_bwd.py --cpu  (tiny batch)
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def time_scan(fn, n_lo=4, n_hi=132):
    float(fn(n_lo))
    float(fn(n_hi))

    def timed(n):
        t0 = time.perf_counter()
        float(fn(n))
        return time.perf_counter() - t0

    best_lo = min(timed(n_lo) for _ in range(2))
    best_hi = min(timed(n_hi) for _ in range(2))
    return max(best_hi - best_lo, 1e-9) / (n_hi - n_lo)


def main():
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    from pose3d_tpu.models import NETWORKS, apply, init_params, losses
    from pose3d_tpu.models import manifold as M

    cpu = "--cpu" in sys.argv
    batch = 300 if not cpu else 20
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    print(f"device: {jax.devices()[0]}  batch={batch}", flush=True)

    def chain(loss_fn):
        """Scan n dependent fwd(+bwd) iterations; dependence threads
        through the params (1e-12 perturbation), not the batch."""

        def scan_fn(params_, x_, n):
            def body(carry, _):
                p = carry
                loss, grads = jax.value_and_grad(loss_fn)(p, x_)
                p = jax.tree.map(lambda a, g: a + 1e-12 * g, p, grads)
                return p, loss

            p, losses_ = jax.lax.scan(body, params_, None, length=n)
            return losses_.sum()

        jitted = jax.jit(scan_fn, static_argnums=(2,))
        x = jax.random.uniform(jax.random.key(1), (batch, 64, 64, 7))
        return lambda n: jitted(params, x, n)

    def subset_loss(names):
        """Loss with grads flowing ONLY into `names` subtrees — the rest
        stop_gradient'd, so XLA drops their backward segments."""

        def f(p, x):
            q = {k: (v if k in names else jax.lax.stop_gradient(v))
                 for k, v in p.items()}
            return losses.spec_loss(apply(q, spec, x), spec.loss_slices,
                                    spec.margin)

        return f

    def fwd_only_loss(p, x):
        return losses.spec_loss(
            apply(jax.lax.stop_gradient(p), spec, x), spec.loss_slices,
            spec.margin)

    rows = []
    segments = [
        ("fwd only (no grads)", None),
        ("+ bwd fc2", ("fc2",)),
        ("+ bwd fc1", ("fc1", "fc2")),
        ("+ bwd conv2 (+prelu2/pool2)",
         ("conv2", "prelu2", "prelu3", "fc1", "fc2")),
        ("+ bwd conv1 = full bwd", tuple(params.keys())),
    ]
    for name, names in segments:
        fn = chain(subset_loss(names) if names else fwd_only_loss)
        dt = time_scan(fn)
        rows.append((name, dt))
        print(f"{name:34s} {dt*1e3:8.3f} ms/iter", flush=True)

    # ---- trunk experiments (diagnostic only — NOT the production model)
    def fused_loss(p, x):
        return losses.spec_loss(apply(p, spec, x, fused_stem=True),
                                spec.loss_slices, spec.margin)

    def padded_loss(conv2_pad):
        def f(p, x):
            x = x[..., jnp.array(spec.channels)] \
                if x.shape[-1] != spec.in_channels else x
            O = p["conv2"]["w"].shape[-1]
            pad = conv2_pad - O
            w2 = jnp.pad(p["conv2"]["w"], ((0, 0),) * 3 + ((0, pad),))
            b2 = jnp.pad(p["conv2"]["b"], (0, pad))
            x = M._act(spec, p, "prelu1", M._ceil_maxpool2(
                M._conv(x, p["conv1"]["w"], p["conv1"]["b"])))
            x = M._ceil_maxpool2(M._conv(x, w2, b2)[..., :O])
            x = M._act(spec, p, "prelu2", x)
            n = x.shape[0]
            x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
            x = M._act(spec, p, "prelu3",
                       M._fc(x, p["fc1"]["w"], p["fc1"]["b"]))
            x = M._fc(x, p["fc2"]["w"], p["fc2"]["b"])
            return losses.spec_loss(x, spec.loss_slices, spec.margin)

        return f

    def meanpool_loss(p, x):
        def pool(v):
            n, h, w, c = v.shape
            v = jnp.pad(v, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            return jax.lax.reduce_window(
                v, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID") * 0.25

        x = x[..., jnp.array(spec.channels)] \
            if x.shape[-1] != spec.in_channels else x
        x = M._act(spec, p, "prelu1",
                   pool(M._conv(x, p["conv1"]["w"], p["conv1"]["b"])))
        x = M._act(spec, p, "prelu2",
                   pool(M._conv(x, p["conv2"]["w"], p["conv2"]["b"])))
        n = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
        x = M._act(spec, p, "prelu3",
                   M._fc(x, p["fc1"]["w"], p["fc1"]["b"]))
        x = M._fc(x, p["fc2"]["w"], p["fc2"]["b"])
        return losses.spec_loss(x, spec.loss_slices, spec.margin)

    experiments = [
        ("fwd+bwd fused parity stem", fused_loss),
        ("fwd+bwd conv2 padded to 16", padded_loss(16)),
        ("fwd+bwd conv2 padded to 32", padded_loss(32)),
        ("fwd+bwd mean-pool (diagnostic)", meanpool_loss),
    ]
    for name, loss_fn in experiments:
        dt = time_scan(chain(loss_fn))
        rows.append((name, dt))
        print(f"{name:34s} {dt*1e3:8.3f} ms/iter", flush=True)

    out = {"device": str(jax.devices()[0]),
           "platform": jax.default_backend(), "batch": batch,
           "rows": {n: round(dt * 1e3, 3) for n, dt in rows}}
    path = os.path.join(os.path.dirname(__file__), "..",
                        "PROFILE_BWD.json")
    for a in sys.argv[1:]:
        if a.endswith(".json"):
            path = a
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.abspath(path), flush=True)


if __name__ == "__main__":
    main()
