"""Component profile of the background augmentation (the train-step
bottleneck: ~7.8 of the 10.1 ms step).  Times each sub-operation of
fractal_fill / shape_fill vmapped over 60 anchors, on the live device.

Run: PYTHONPATH=.:/root/.axon_site python scripts/profile_aug.py
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

from pose3d_tpu.data import augment
from pose3d_tpu.data.augment import (_bank_field, _mask_and_outline,
                                     _median3, fractal_fill, shape_fill,
                                     color_fill, make_noise_bank)
from pose3d_tpu.ops.geometry import depth2normals

B = 60


def timed(fn, *args, n_lo=4, n_hi=260):
    """Per-call seconds: chain n dependent applications in one program."""
    def chain(args_, n):
        def body(i, carry):
            out = fn(*carry[:-1], carry[-1])
            # keep a data dependence through the last arg
            feed = carry[-1] * (1.0 + 1e-12 * jnp.mean(out))
            return carry[:-1] + (feed,)
        out = jax.lax.fori_loop(0, n, body, args_)
        return jnp.sum(out[-1])

    jc = jax.jit(chain, static_argnums=(1,))
    float(jc(args, n_lo))
    float(jc(args, n_hi))
    t0 = time.perf_counter()
    float(jc(args, n_lo))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jc(args, n_hi))
    t_hi = time.perf_counter() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    from pose3d_tpu.utils.tpuguard import require_tpu
    require_tpu()
    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.key(0)
    keys = jax.random.split(key, B)
    patches = jax.random.uniform(jax.random.key(1), (B, 64, 64, 7))
    patches = patches.at[:, 40:, :, 3].set(0.0)
    bank = make_noise_bank(jax.random.key(17), 64)

    rows = []

    def one_key_fn(f):
        # wrap a (key, patch)->patch fn: fori carry feeds patches
        def g(p):
            return jax.vmap(f)(keys, p)
        return g

    rows.append(("fractal_fill (bank)", lambda p: jax.vmap(
        lambda k, q: fractal_fill(k, q, bank))(keys, p), patches))
    rows.append(("shape_fill", one_key_fn(shape_fill), patches))
    rows.append(("color_fill", one_key_fn(color_fill), patches))
    rows.append(("bank_field only", lambda p: jax.vmap(
        lambda k, q: _bank_field(k, bank)[:64, :64] + q[..., 0] * 0)(
        keys, p)[..., None].repeat(7, -1), patches))
    rows.append(("depth2normals 76^2 x60", lambda p: jnp.pad(jax.vmap(
        lambda q: depth2normals(jnp.pad(q[..., 3], 6), 539.0, 539.0))(p)
        [:, :64, :64], ((0, 0), (0, 0), (0, 0), (0, 4))), patches))
    rows.append(("median3 x2 (rgb+nor) x60", lambda p: jax.vmap(
        lambda q: jnp.concatenate([_median3(q[..., :3]), q[..., 3:4],
                                   _median3(q[..., 4:])], -1))(p), patches))
    rows.append(("mask+outline x60", lambda p: (jax.vmap(
        lambda q: _mask_and_outline(q[..., 3])[2])(p)[..., None]
        .astype(jnp.float32).repeat(7, -1)) + p, patches))

    for name, f, arg in rows:
        dt = timed(lambda a: f(a), arg)
        print(f"{name:28s} {dt*1e3:7.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
