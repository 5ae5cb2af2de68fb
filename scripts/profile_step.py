"""Ablation profile of the fused train step on the live device.

The VERDICT flagged a ~20x gap between forward throughput and the sustained
train rate.  This script measures where the 56.7 ms step goes: it builds a
LineMOD-scale DeviceData from on-device RNG (no rendering, no uploads) and
times the epoch-scan program under ablations, using the delta method (scan
n vs n+K dependent iterations inside one program) so tunnel latency cancels.

Run on TPU:   PYTHONPATH=. python scripts/profile_step.py
Run on CPU:   PYTHONPATH=. python scripts/profile_step.py --cpu  (tiny scale)
"""

import sys
import time

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp


def make_data(O, Ntr, T, dtype):
    from pose3d_tpu.data.dataset import DeviceData

    def patches(key, n):
        return jax.random.uniform(key, (O, n, 64, 64, 7),
                                  dtype=jnp.float32).astype(dtype)

    def labels(key, n):
        k1, k2 = jax.random.split(key)
        q = jax.random.normal(k1, (O, n, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        cls = jnp.broadcast_to(jnp.arange(O, dtype=jnp.float32)[:, None,
                                                                None],
                               (O, n, 1))
        t = jax.random.uniform(k2, (O, n, 3))
        return jnp.concatenate([cls, q, t], axis=-1)

    ks = jax.random.split(jax.random.key(0), 4)
    # zero a depth band so the background-fill mask has work to do
    tp = patches(ks[0], Ntr)
    tp = tp.at[..., 40:, :, 3].set(0.0)
    return DeviceData(
        train_patches=tp, train_labels=labels(ks[1], Ntr),
        tmpl_patches=patches(ks[2], T), tmpl_labels=labels(ks[3], T),
        test_patches=patches(ks[2], 1), test_labels=labels(ks[3], 1),
        max_sim_tmpl=jnp.zeros((O, Ntr, 2), jnp.int32),
        rot_inv=jnp.zeros((O,), jnp.int32),
        elev_ok=jnp.ones((O, T, T), bool),
        hard_negs=jnp.zeros((O, 1, 64, 64, 7), dtype),
        hard_neg_count=jnp.zeros((O,), jnp.int32))


def time_scan(fn, state, n_lo=4, n_hi=132):
    """Per-iteration seconds via the delta method.  BOTH program sizes are
    compiled before any timing (otherwise the n_hi compile lands inside the
    timed region), and the gap is wide (128 iters) so the per-dispatch
    tunnel noise (~seconds) cannot swamp the difference."""
    float(fn(state, n_lo))      # axon: only a scalar fetch truly syncs
    float(fn(state, n_hi))
    best_lo = min(_timed(fn, state, n_lo) for _ in range(2))
    best_hi = min(_timed(fn, state, n_hi) for _ in range(2))
    print(f"    raw: lo({n_lo})={best_lo:.3f}s hi({n_hi})={best_hi:.3f}s",
          flush=True)
    return max(best_hi - best_lo, 1e-9) / (n_hi - n_lo)


def _timed(fn, state, n):
    t0 = time.perf_counter()
    float(fn(state, n))         # scalar fetch = real synchronization
    return time.perf_counter() - t0


def main():
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    from pose3d_tpu.config import Config
    from pose3d_tpu.data.batcher import build_batch
    from pose3d_tpu.data.augment import make_noise_bank, random_fill
    from pose3d_tpu.models import NETWORKS, apply, init_params, losses
    from pose3d_tpu.train.optim import caffe_sgd

    cpu = "--cpu" in sys.argv
    O, Ntr, T = (15, 2412, 623) if not cpu else (3, 64, 32)
    dtype = jnp.bfloat16 if not cpu else jnp.float32
    groups = 60
    data = make_data(O, Ntr, T, dtype)
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    tx = caffe_sgd(0.001, 0.9, 0.001, "step", 15000, 0.9)
    noise_bank = make_noise_bank(jax.random.key(17), 64)
    print(f"device: {jax.devices()[0]}  scale O={O} Ntr={Ntr} T={T}",
          flush=True)

    def variant(mode, fwd=True, bwd=True, mine=True, train_dtype=None,
                fused_stem=False):
        # data/banks are ARGUMENTS (not closures): closed-over device
        # arrays become captured constants re-shipped at compile time,
        # which through the tunnel never finishes
        def scan_fn(data_, bank_, params_, n):
            def body(carry, it):
                params, opt, key = carry
                key, kb = jax.random.split(key)
                if mine:
                    batch = build_batch(kb, it, groups, data_,
                                        random_background=mode,
                                        noise_bank=bank_)
                else:
                    batch = jax.random.uniform(kb, (groups * 5, 64, 64, 7))
                if not fwd:
                    return (params, opt, key), jnp.sum(batch[0, 0, 0, :1])

                def loss_fn(p):
                    return losses.spec_loss(
                        apply(p, spec, batch, compute_dtype=train_dtype,
                              fused_stem=fused_stem),
                        spec.loss_slices, spec.margin)
                if bwd:
                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt = tx.update(grads, opt, params)
                    params = jax.tree.map(lambda p, u: p + u, params,
                                          updates)
                else:
                    loss = loss_fn(params)
                return (params, opt, key), loss

            carry = (params_, tx.init(params_), jax.random.key(1))
            carry, losses_ = jax.lax.scan(body, carry, jnp.arange(n))
            return losses_.sum()

        return jax.jit(scan_fn, static_argnums=(3,))

    rows = [
        ("full step (fractal bg=3)", variant(3)),
        ("full step (mix bg=-1)", variant(-1)),
        ("no background fill (bg=0)", variant(0)),
        ("mine+aug only, no net", variant(3, fwd=False)),
        ("mine only, no aug no net", variant(0, fwd=False)),
        ("fwd+bwd only (random batch)", variant(3, mine=False)),
        ("fwd only (random batch)", variant(3, mine=False, bwd=False)),
        # the OPT-IN bf16 training mode (config compute_dtype=bfloat16,
        # gated by validate_learning --bf16-train): bf16 trunk
        # intermediates through fwd+bwd, f32 master weights/updates
        ("full step bf16 (fractal bg=3)",
         variant(3, train_dtype=jnp.bfloat16)),
        ("fwd+bwd bf16 (random batch)",
         variant(3, mine=False, train_dtype=jnp.bfloat16)),
        # parity-packed conv+pool stem (models/manifold._conv_pool_fused):
        # same multiply-add terms, 4x MXU lane occupancy in the convs, no
        # full-resolution conv intermediate — the PROFILE_BWD win measured
        # through the REAL step program (mining + aug + optimizer included)
        ("full step fused stem (bg=3)", variant(3, fused_stem=True)),
        ("fwd+bwd fused stem (random batch)",
         variant(3, mine=False, fused_stem=True)),
    ]
    import json, os
    results = {"device": str(jax.devices()[0]),
               "platform": jax.default_backend(),
               "scale": {"O": O, "Ntr": Ntr, "T": T, "groups": groups},
               "phases": {}}
    for name, fn in rows:
        dt = time_scan(lambda s, n, f=fn: f(data, noise_bank, params, n),
                       None)
        results["phases"][name] = {
            "ms_per_iter": round(dt * 1e3, 3),
            "samples_per_s": round(groups * 5 / dt, 1)}
        print(f"{name:32s} {dt*1e3:8.2f} ms/iter "
              f"({groups*5/dt:10,.0f} samples/s)", flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "PROFILE_STEP.json")
    for a in sys.argv[1:]:
        if a.endswith(".json"):
            out = a
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", os.path.abspath(out), flush=True)


if __name__ == "__main__":
    main()
