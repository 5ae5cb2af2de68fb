"""Forward-path profile on the live device: full trunk + per-layer deltas
(conv1 / conv2 / fc) by truncated-net timing.

Measured on TPU v5e (batch 1024, 4-ch input): apply 0.91 ms f32/bf16-mxu,
0.80 ms bf16 (~1.1-1.3 M patches/s); conv1+pool is ~75% of the forward.
A space-to-depth MXU-packing variant of the trunk (2x2 block -> 4x output
columns) was prototyped and measured SLOWER on this chip (1.10 ms apply,
0.89 ms conv1 vs 0.68 ms canonical; grad 0.28 ms vs 0.17 ms): XLA's native
conv tiling already hides the column underfill, and the repack adds a
reshape/transpose pass over the activations that costs more HBM traffic
than the MXU occupancy buys back.  The canonical path stays production.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_forward.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import pose3d_tpu  # noqa: F401  (platform normalization)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/p3d_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def timed(fn, args, n_lo=2, n_hi=34):
    """Delta-method: time a jitted chain of n dependent calls for small and
    large n; the tunnel's sync latency cancels in the difference."""
    def chain(a, n):
        def body(_, c):
            out = fn(*a[:-1], c)
            return c * (1.0 + 1e-12 * jnp.sum(out).astype(c.dtype))
        r = jax.lax.fori_loop(0, n, body, a[-1])
        return jnp.sum(fn(*a[:-1], r))
    jc = jax.jit(chain, static_argnums=(1,))
    float(jc(args, n_lo)); float(jc(args, n_hi))
    t0 = time.perf_counter(); float(jc(args, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jc(args, n_hi))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main(batch=1024):
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    from pose3d_tpu.models import NETWORKS, init_params, apply
    from pose3d_tpu.models import manifold as M

    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(0), spec)
    x = jax.random.uniform(jax.random.key(1), (batch, 64, 64, 4))
    print(f"device: {jax.devices()[0]}  batch {batch}", flush=True)

    for dtype, dlabel in [(None, "f32/bf16-mxu"),
                          (jnp.bfloat16, "bf16        ")]:
        dt = timed(lambda p, v: apply(p, spec, v, compute_dtype=dtype),
                   (params, x))
        print(f"apply {dlabel} {dt*1e3:7.3f} ms  "
              f"{batch/dt:,.0f} patches/s", flush=True)

    # isolated conv stages
    c1 = lambda p, v: M._act(spec, p, "prelu1", M._ceil_maxpool2(
        M._conv(v, p["conv1"]["w"], p["conv1"]["b"])))
    dt = timed(c1, (params, x))
    print(f"conv1+pool {dt*1e3:7.3f} ms", flush=True)

    x2 = jax.random.uniform(jax.random.key(2), (batch, 29, 29, 16))
    c2 = lambda p, v: M._ceil_maxpool2(M._conv(v, p["conv2"]["w"],
                                               p["conv2"]["b"]))
    dt = timed(c2, (params, x2))
    print(f"conv2+pool {dt*1e3:7.3f} ms", flush=True)

    # training step proxy: loss grad through the trunk
    from pose3d_tpu.models import losses

    def loss(p, v):
        return losses.spec_loss(apply(p, spec, v), spec.loss_slices)
    g = jax.grad(loss)
    xb = jax.random.uniform(jax.random.key(3), (300, 64, 64, 4))
    dt = timed(lambda p, v: g(p, v)["fc1"]["w"], (params, xb))
    print(f"grad (300) {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
