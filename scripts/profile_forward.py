"""Forward-path profile on the live device: full trunk + per-layer deltas
(conv1 / conv2 / fc) by truncated-net timing.

The dependence between chained iterations threads through the ~100k-float
params (like bench.py), NOT the input batch — rewriting the input tensor
every iteration costs more HBM traffic than small layers and overstates
their time.

History: a space-to-depth MXU-packing variant of the trunk (2x2 block ->
4x output columns) was prototyped and measured SLOWER than the canonical
path on this chip (apply 1.10 vs 0.91 ms, conv1 0.89 vs 0.68 ms, grad
0.28 vs 0.17 ms; input-chained harness, both variants equally burdened so
the comparison stands): XLA's conv tiling already packs output pixels onto
MXU columns, and the repack adds a reshape pass over the activations that
costs more HBM traffic than the occupancy buys back.  The canonical path
stays production; bench.py's params-chained harness puts the full 7-ch
forward at ~0.75 ms/1024 (1.36M patches/s).

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


def timed(fn, params, x, n_lo=2, n_hi=34):
    """Delta-method: time a jitted chain of n dependent calls for small and
    large n; the tunnel's sync latency cancels in the difference.  The
    chain perturbs the params pytree by 1e-12*mean(out) per iteration —
    a real data dependence with negligible memory traffic."""
    def chain(p, v, n):
        def body(_, pc):
            out = fn(pc, v)
            eps = 1e-12 * jnp.mean(out).astype(jnp.float32)
            return jax.tree.map(lambda w: w + eps.astype(w.dtype), pc)
        pn = jax.lax.fori_loop(0, n, body, p)
        return jnp.sum(fn(pn, v))
    jc = jax.jit(chain, static_argnums=(2,))
    float(jc(params, x, n_lo)); float(jc(params, x, n_hi))
    t0 = time.perf_counter(); float(jc(params, x, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jc(params, x, n_hi))
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
        for fused in (False, True):
            dt = timed(lambda p, v: apply(p, spec, v, compute_dtype=dtype,
                                          fused_stem=fused), params, x)
            print(f"apply {dlabel} fused={int(fused)} {dt*1e3:7.3f} ms  "
                  f"{batch/dt:,.0f} patches/s", flush=True)

    # isolated conv stages
    c1 = lambda p, v: M._act(spec, p, "prelu1", M._ceil_maxpool2(
        M._conv(v, p["conv1"]["w"], p["conv1"]["b"])))
    dt = timed(c1, params, x)
    print(f"conv1+pool {dt*1e3:7.3f} ms", flush=True)

    x2 = jax.random.uniform(jax.random.key(2), (batch, 29, 29, 16))
    c2 = lambda p, v: M._ceil_maxpool2(M._conv(v, p["conv2"]["w"],
                                               p["conv2"]["b"]))
    dt = timed(c2, params, x2)
    print(f"conv2+pool {dt*1e3:7.3f} ms", flush=True)

    # training step proxy: loss grad through the trunk
    from pose3d_tpu.models import losses

    xb = jax.random.uniform(jax.random.key(3), (300, 64, 64, 4))
    for fused in (False, True):
        def loss(p, v, fused=fused):
            return losses.spec_loss(apply(p, spec, v, fused_stem=fused),
                                    spec.loss_slices)
        g = jax.grad(loss)
        dt = timed(lambda p, v: g(p, v)["fc1"]["w"], params, xb)
        print(f"grad (300) fused={int(fused)} {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
