"""Benchmark: LineMOD descriptor throughput on the flagship net.

Primary metric (BASELINE.md): descriptor patches/sec/chip through
manifold_rgbd_16 — the operation both training (forward half) and
evaluation/kNN are built from.  ``vs_baseline`` compares against the same
program on one host CPU, standing in for the reference's CPU-mode Caffe
forward (the reference publishes no numbers and runs with gpu=false,
reference config.ini:19; north star is >=10x CPU e2e).

Prints ONE JSON line; extra detail goes to stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

import jax
import pose3d_tpu  # noqa: F401  (normalizes a pinned JAX_PLATFORMS=axon)
from pose3d_tpu.utils.tpuguard import require_tpu

if "--cpu-baseline" in sys.argv:
    # this image force-selects the axon TPU platform over the env var; the
    # config knob (pre-backend-init) does win
    jax.config.update("jax_platforms", "cpu")

# reuse compiled programs across bench runs
jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def _measure(batch: int, iters: int, compute_dtype=None) -> float:
    """Forward throughput by the delta method.

    The TPU here sits behind a tunnel whose host<->device syncs can stall for
    seconds-to-minutes, so (a) all data is generated ON device — no uploads —
    and (b) we time a jitted chain of n dependent forwards ending in one
    scalar fetch, for n=1 and n=iters, and divide by the difference: the
    (unpredictable) fetch latency cancels.
    """
    from pose3d_tpu.models import NETWORKS, init_params
    from pose3d_tpu.models.manifold import descriptor_fn

    spec = NETWORKS["manifold_rgbd_16"]
    f = descriptor_fn(spec, compute_dtype)
    params = init_params(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (batch, 64, 64, 7))
    if compute_dtype is not None:
        # serving mode reads the production bf16 sample storage directly
        # (config storage_dtype=bfloat16; no f32 upcast pass — the input
        # read is the largest unavoidable HBM term in the forward)
        x = x.astype(compute_dtype)

    @jax.jit
    def chain(params, x, n):
        def body(_, p):
            d = f(p, x)
            # data dependence between iterations prevents overlap/elision.
            # Thread it through the ~100k-float params (1e-12 perturbation,
            # numerically inert), NOT the 114 MB input batch: rewriting the
            # input tensor every iteration costs more HBM traffic than the
            # forward pass itself and would understate throughput ~4x.
            eps = 1e-12 * jnp.mean(d)
            return jax.tree.map(lambda w: w + eps.astype(w.dtype), p)
        pn = jax.lax.fori_loop(0, n, body, params)
        return jnp.sum(f(pn, x))

    float(chain(params, x, 1))                    # compile + first sync
    # min over repeated (t1, tn) pairs: tunnel dispatch throttle inflates
    # individual runs up to 10x, and a throttled SHORT run corrupts the
    # difference — min-of-mins recovers the undisturbed device rate.
    # 5 pairs, not 3: BENCH_r04 landed 25% under the serving profile's
    # rate for the identical program because one throttle window spanned
    # all 3 pairs (reconciled in BENCH_RECONCILE_r5.json)
    t1s, tns = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chain(params, x, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(params, x, iters + 1))
        tns.append(time.perf_counter() - t0)
    per_call = max(min(tns) - min(t1s), 1e-9) / iters
    return batch / per_call


def main():
    if "--cpu-baseline" in sys.argv:
        # subprocess under JAX_PLATFORMS=cpu: stands in for the reference's
        # CPU-mode Caffe forward.  Measure BOTH modes so each TPU number
        # divides by the same program on the host (bf16 serving vs bf16,
        # f32 vs f32 — not a mixed-dtype ratio).
        print(json.dumps({
            "cpu_pps": _measure(256, iters=4),
            "cpu_pps_serving": _measure(256, iters=4,
                                        compute_dtype=jnp.bfloat16)}))
        return

    on_tpu = require_tpu()
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    # headline = the serving mode (config default serving_dtype=bfloat16:
    # bf16 trunk intermediates, f32 descriptors — the mode cli eval /
    # predict run in production; accuracy evidence in LEARNING_r3.json)
    tpu_pps = _measure(1024, iters=64, compute_dtype=jnp.bfloat16)
    f32_pps = _measure(1024, iters=64)
    print(f"descriptor throughput: {tpu_pps:,.0f} patches/s (serving/bf16), "
          f"{f32_pps:,.0f} (f32)", file=sys.stderr)

    cpu_pps = cpu_serving_pps = 0.0
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True, text=True, timeout=900, env=env)
        base = json.loads(out.stdout.strip().splitlines()[-1])
        cpu_pps = base["cpu_pps"]
        cpu_serving_pps = base.get("cpu_pps_serving", 0.0)
        print(f"cpu baseline: {cpu_pps:,.0f} patches/s (f32), "
              f"{cpu_serving_pps:,.0f} (serving/bf16)", file=sys.stderr)
    except Exception as e:  # baseline failure must not kill the bench
        print(f"cpu baseline failed: {e}", file=sys.stderr)

    # vs_baseline divides SAME-PROGRAM numbers (serving mode on both
    # sides); the f32/f32 ratio is reported alongside
    vs = tpu_pps / cpu_serving_pps if cpu_serving_pps else None
    print(json.dumps({
        "metric": "linemod_descriptor_throughput",
        "value": round(tpu_pps, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "platform": "tpu" if on_tpu else "cpu-fallback",
        "f32_value": round(f32_pps, 1),
        "f32_vs_baseline": round(f32_pps / cpu_pps, 2) if cpu_pps else None,
    }))


if __name__ == "__main__":
    main()
