"""Serving-regime fused conv+pool Pallas kernels.

The serving forward (descriptor extraction for eval/kNN/predict — the
reference's Caffe ``CNN.Forward`` hot loop, reference
src/networkevaluator.cpp:9-54) is HBM-bound in plain XLA: conv1's
[N, 57, 57, 16] activation is ~4x the input bytes and must round-trip HBM
before the pool (round-3 PROFILE_SERVING_STEM.json).  These kernels fuse
``conv -> ceil-mode maxpool2 -> bias -> activation`` per trunk stage into
Pallas programs that tile the batch through VMEM — the full-resolution
conv activations NEVER exist in HBM, and stage 2 consumes stage 1's
packed output directly so there is no relayout pass between them.

Kernel design (shaped by what Mosaic supports on this toolchain — no
strided value slices, no minor-dim shape casts, no column-shifted lane
concats; probed empirically):
  * the XLA prepass groups input columns by ``FC = 8`` into the lane
    dimension ([N, 64, 64, C] -> [N, 64, 10, 8C], a pure minor-dim
    regroup XLA handles natively) and casts to bf16;
  * in-kernel, the im2col matrix is assembled by storing each (row-tap,
    group-tap) slice at its static lane offset in a VMEM scratch —
    contraction K = 8 * 2 * 8C (512 for RGB-D), giving the MXU a full
    128-lane, deep-K matmul where a direct 4-channel conv would idle 87%
    of the array;
  * the conv kernel is packed over (column offset b in [0, 8), output
    channel): ``wp[(p, t, rc, c), (b, o)] = w[p, 8t + rc - b, c, o]`` —
    one matmul computes all 8 column phases at once;
  * row pooling is a major-dim reshape [.., 58, ..] -> [.., 29, 2, ..] +
    max (ceil-mode edge = one -inf row pad, matching Caffe semantics in
    models/manifold._ceil_maxpool2); column pooling is a lane-slice max
    (adjacent column phases sit in adjacent lane groups);
  * stage 1 emits [N, 29, 9, 4*16] whose row-major (group, phase) order
    IS column order — stage 2 reads it as its own FC=4 grouped layout
    with zero relayout.

Numerics: identical terms to models/manifold.apply's default path (bf16
MXU multiplies, f32 accumulation); only the accumulation order inside the
shared-K matmul differs, so descriptors agree to f32 rounding.  The
bit-parity mode (precision='highest') keeps the unfused XLA path.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float("-inf")


def _act_fn(act: str, y, slope):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "elu":
        return jnp.where(y > 0, y, jnp.expm1(y))
    return jnp.where(y > 0, y, slope * y)


# ------------------------------------------------------------- stage 1
# geometry: input [N, 64, 64, C] (C padded to Cp in the prepass),
# conv 8x8 valid -> 57x57, ceil-pool2 -> 29x29, O = 16 channels.
_H, _K1, _O1 = 64, 8, 16
_HC1 = _H - _K1 + 1            # 57 conv rows/cols
_PR1 = (_HC1 + 1) // 2         # 29 pooled rows/cols
_FC1 = 8                       # column phases per group
_GI1 = 9                       # input col groups (72 cols, zero-padded)
_GO1 = 8                       # output groups computed (32 pooled cols);
                               # group*lanes stays 128-aligned for the
                               # im2col collapse (Mosaic constraint)
_SC1 = 2                       # group taps


def _pack_w1(w: jnp.ndarray, cp: int) -> jnp.ndarray:
    """[8, 8, C, 16] -> [8 * 16*Cp, 8*16]: packed for the OVERLAPPED
    column-group layout (each group carries 16 columns = its 8 phases
    plus the next group's, so all 8 taps of every phase stay in-group):
    contraction order (row tap p, in-group column rc in [0,16), channel),
    lane order (phase b, out channel o); wp[(p, rc, c), (b, o)] =
    w[p, rc - b, c, o], zero outside [0, 8)."""
    K, _, C, O = w.shape
    if C < cp:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - C), (0, 0)))
    blocks = []
    for b in range(_FC1):
        wb = jnp.pad(w, ((0, 0), (b, 2 * _FC1 - K - b), (0, 0), (0, 0)))
        blocks.append(wb.reshape(K * 2 * _FC1 * cp, O))
    return jnp.concatenate(blocks, axis=-1)          # [8*16Cp, 128]


def _stage1_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, *,
                   act: str, cp: int, out_dtype):
    B = x_ref.shape[0]
    rows = B * _HC1 * _GO1
    x = x_ref[...]                                   # [B, 64, 8, 16*Cp]
    lc = _K1 * 2 * _FC1 * cp
    # row-tap concat along lanes (row-shifted concats are the one im2col
    # assembly Mosaic supports; the overlapped groups from the prepass
    # make the column taps in-group, so ONE matmul covers everything)
    catp = jnp.concatenate([x[:, p:p + _HC1, :, :] for p in range(_K1)],
                           axis=-1)                  # [B, 57, 8, 8*16Cp]
    acc = jnp.dot(catp.reshape(rows, lc), w_ref[...],
                  preferred_element_type=jnp.float32)
    acc = acc.reshape(B, _HC1, _GO1, _FC1 * _O1)
    # mask conv columns past the valid output (v = 8g + b >= 57)
    gg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _GO1, _FC1 * _O1), 2)
    bb = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _GO1, _FC1 * _O1),
                                  3) // _O1
    acc = jnp.where(_FC1 * gg + bb < _HC1, acc, _NEG)
    # ceil-mode row pool: 57 -> pad 58 with -inf -> pair max
    acc = jnp.pad(acc, ((0, 0), (0, 1), (0, 0), (0, 0)),
                  constant_values=_NEG)
    acc = acc.reshape(B, _PR1, 2, _GO1, _FC1 * _O1).max(axis=2)
    # column pool: adjacent phases live in adjacent lane groups
    y = jnp.concatenate(
        [jnp.maximum(acc[..., (2 * i) * _O1:(2 * i + 1) * _O1],
                     acc[..., (2 * i + 1) * _O1:(2 * i + 2) * _O1])
         for i in range(_FC1 // 2)], axis=-1)        # [B, 29, 9, 4*16]
    y = _act_fn(act, y + b_ref[...], a_ref[...])
    # zero garbage pooled columns (p = 4g + bh >= 29) so stage 2's
    # contraction stays finite
    g2 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _GO1, 4 * _O1), 2)
    bh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _GO1, 4 * _O1),
                                  3) // _O1
    y = jnp.where(4 * g2 + bh < _PR1, y, 0.0)
    # the output carries a 9th zero group so stage 2's group taps
    # (t in {0, 1}, slices g:g+8) stay in bounds
    o_ref[:, :, :_GO1, :] = y.astype(out_dtype)
    o_ref[:, :, _GO1:, :] = jnp.zeros(
        (y.shape[0], _PR1, 1, 4 * _O1), out_dtype)


# ------------------------------------------------------------- stage 2
# input = stage 1 packed [N, 29, 9, 4*16] (36 columns, 29 valid),
# conv 5x5 valid -> 25x25, ceil-pool2 -> 13x13, O = 7 (lane-padded to 16).
_H2, _K2, _O2, _OP2 = 29, 5, 7, 16
_HC2 = _H2 - _K2 + 1           # 25
_PR2 = (_HC2 + 1) // 2         # 13
_FC2 = 4
_GI2 = 9
_GO2 = 8
_SC2 = 2


def _pack_w2(w: jnp.ndarray) -> jnp.ndarray:
    """[5, 5, 16, 7] -> [2, 6 * 4*16, 4*16] (O zero-padded to 16; row
    taps zero-padded 5 -> 6 so the contraction is 128-lane-tile aligned);
    same (group tap, (p, rc, c), (b, o)) layout as _pack_w1."""
    K, _, C, O = w.shape
    w = jnp.pad(w, ((0, 1), (0, 0), (0, 0), (0, _OP2 - O)))
    Kp = K + 1
    blocks = []
    for b in range(_FC2):
        wb = jnp.pad(w, ((0, 0), (b, _FC2 * _SC2 - K - b), (0, 0), (0, 0)))
        wb = wb.reshape(Kp, _SC2, _FC2, C, _OP2)
        blocks.append(jnp.transpose(wb, (1, 0, 2, 3, 4))
                      .reshape(_SC2, Kp * _FC2 * C, _OP2))
    return jnp.concatenate(blocks, axis=-1)          # [2, 384, 64]


def _stage2_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, *,
                   act: str, out_dtype):
    B = x_ref.shape[0]
    rows = B * _HC2 * _GO2
    x = x_ref[...].astype(jnp.bfloat16)              # [B, 29, 9, 64]
    # 6th zero row tap for contraction tile alignment (see _pack_w2)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))
    lc = (_K2 + 1) * _FC2 * _O1
    catp = jnp.concatenate(
        [x[:, p:p + _HC2, :, :] for p in range(_K2 + 1)],
        axis=-1)                                     # [B, 25, 9, 384]
    w3 = w_ref[...]
    acc = jnp.dot(catp[:, :, 0:_GO2, :].reshape(rows, lc), w3[0],
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(catp[:, :, 1:_GO2 + 1, :].reshape(rows, lc),
                        w3[1], preferred_element_type=jnp.float32)
    acc = acc.reshape(B, _HC2, _GO2, _FC2 * _OP2)
    gg = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _GO2, _FC2 * _OP2), 2)
    bb = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _GO2, _FC2 * _OP2),
                                  3) // _OP2
    acc = jnp.where(_FC2 * gg + bb < _HC2, acc, _NEG)
    acc = jnp.pad(acc, ((0, 0), (0, 1), (0, 0), (0, 0)),
                  constant_values=_NEG)
    acc = acc.reshape(B, _PR2, 2, _GO2, _FC2 * _OP2).max(axis=2)
    y = jnp.concatenate(
        [jnp.maximum(acc[..., (2 * i) * _OP2:(2 * i + 1) * _OP2],
                     acc[..., (2 * i + 1) * _OP2:(2 * i + 2) * _OP2])
         for i in range(_FC2 // 2)], axis=-1)        # [B, 13, 8, 2*16]
    y = _act_fn(act, y + b_ref[...], a_ref[...])
    o_ref[...] = y.astype(out_dtype)


# ------------------------------------------------------------- wrappers

def _call_stage(kern, x, wp, br, ar, block, out_rows, grp, out_groups,
                out_lanes, kdim, out_dtype, interpret):
    """``grp`` = column groups the matmul computes (group*lane_chunk must
    stay 128-aligned for the im2col collapse); ``out_groups`` = groups the
    output block stores (may carry extra zero groups for the next stage's
    taps)."""
    N = x.shape[0]
    pad = (-N) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    rows_per_block = block * out_rows * grp
    out = pl.pallas_call(
        kern,
        grid=(x.shape[0] // block,),
        in_specs=[
            pl.BlockSpec((block,) + x.shape[1:],
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i, _nd=wp.ndim: (0,) * _nd,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(br.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ar.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, (out_rows + 1) // 2, out_groups, out_lanes),
            lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (x.shape[0], (out_rows + 1) // 2, out_groups, out_lanes),
            out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_per_block * kdim * wp.shape[1],
            bytes_accessed=x.nbytes // (x.shape[0] // block) + wp.nbytes,
            transcendentals=0),
        interpret=interpret,
    )(x, wp, br, ar)
    return out[:N] if pad else out


def _tiled(v, reps, pad_to=None):
    if pad_to is not None and v.shape[0] < pad_to:
        v = jnp.pad(v, (0, pad_to - v.shape[0]))
    return jnp.tile(v, reps).reshape(1, 1, 1, -1).astype(jnp.float32)


def stem_pallas(params: Dict, spec, patches: jnp.ndarray,
                *, out_dtype=jnp.float32, block: int = 8,
                interpret: bool = False) -> jnp.ndarray:
    """Fused trunk: patches [N, 64, 64, >=C] -> pooled2 [N, 13, 13, 7].

    Equals ``act(pool(conv2(act(pool(conv1(x))))))`` from
    models/manifold.apply under default (bf16-multiply) precision.
    """
    act = spec.activation
    x = patches
    prefix = spec.channels == tuple(range(spec.in_channels))
    if x.shape[-1] != spec.in_channels:
        x = (x[..., :spec.in_channels] if prefix
             else x[..., jnp.array(spec.channels)])
    C = spec.in_channels
    cp = 4 if C <= 4 else 8

    def slope(name):
        if act == "prelu":
            return params[name]["a"].astype(jnp.float32)
        return jnp.zeros((0,))

    # prepass: bf16 cast + OVERLAPPED column grouping [N, 64, 64, C] ->
    # [N, 64, 8, 16*Cp] (group g = columns 8g..8g+15; the overlap keeps
    # every phase's 8 column taps inside its own group, so the kernel
    # needs no column-shifted assembly).  The only XLA pass in the stem.
    xg = x.astype(jnp.bfloat16)
    if cp > C:
        xg = jnp.pad(xg, ((0, 0), (0, 0), (0, 0), (0, cp - C)))
    x8 = xg.reshape(x.shape[0], _H, _H // _FC1, _FC1 * cp)
    x9 = jnp.pad(x8, ((0, 0), (0, 0), (0, 1), (0, 0)))
    xo = jnp.concatenate([x9[:, :, :_GO1, :], x9[:, :, 1:, :]], axis=-1)

    w1 = _pack_w1(params["conv1"]["w"], cp).astype(jnp.bfloat16)
    b1 = _tiled(params["conv1"]["b"], _FC1 // 2)
    a1 = _tiled(slope("prelu1"), _FC1 // 2) if act == "prelu" else \
        jnp.zeros_like(b1)
    k1 = functools.partial(_stage1_kernel, act=act, cp=cp,
                           out_dtype=out_dtype)
    y1 = _call_stage(k1, xo, w1, b1, a1, block, _HC1, _GO1, _GO1 + 1,
                     4 * _O1, _K1 * 2 * _FC1 * cp, out_dtype, interpret)

    w2 = _pack_w2(params["conv2"]["w"]).astype(jnp.bfloat16)
    b2 = _tiled(params["conv2"]["b"], _FC2 // 2, pad_to=_OP2)
    a2 = _tiled(slope("prelu2"), _FC2 // 2, pad_to=_OP2) \
        if act == "prelu" else jnp.zeros_like(b2)
    k2 = functools.partial(_stage2_kernel, act=act, out_dtype=out_dtype)
    y2 = _call_stage(k2, y1, w2, b2, a2, 2 * block, _HC2, _GO2, _GO2,
                     2 * _OP2, _K2 * _SC2 * _FC2 * _O1, out_dtype,
                     interpret)

    # unpack [N, 13, 8, 2*16] =row-major= [N, 13, 16, 16] -> valid window
    N = y2.shape[0]
    return y2.reshape(N, _PR2, 2 * _GO2, _OP2)[:, :, :_PR2, :_O2]


def serving_apply(params: Dict, spec, patches: jnp.ndarray,
                  *, compute_dtype=None, block: int = 8,
                  interpret: bool = False) -> jnp.ndarray:
    """The serving forward with the Pallas fused stem + XLA fc tail.

    Matches models/manifold.apply(params, spec, patches) under default
    precision (bf16 MXU multiplies) — same terms, fused scheduling.  The
    binarization head (when spec.bin_head) rides the same trunk.
    """
    from pose3d_tpu.models import manifold as M

    mid = compute_dtype if compute_dtype is not None else jnp.float32
    x = stem_pallas(params, spec, patches, out_dtype=mid, block=block,
                    interpret=interpret)

    # fc tail — identical to manifold.apply (CHW flatten for Caffe parity)
    n = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)

    def cast(v):
        return v.astype(compute_dtype) if compute_dtype is not None else v

    x = M._act(spec, params, "prelu3",
               M._fc(cast(x), cast(params["fc1"]["w"]), params["fc1"]["b"],
                     None, out_dtype=mid))
    x = M._fc(cast(x), cast(params["fc2"]["w"]), params["fc2"]["b"], None)
    if spec.bin_head:
        a4 = params["prelu4"]["a"]
        x = jnp.where(x > 0, x, a4 * x)
        h = M._fc(cast(x), cast(params["bin_fc1"]["w"]),
                  params["bin_fc1"]["b"], None)
        a = params["bin_prelu"]["a"]
        h = jnp.where(h > 0, h, a * h)
        x = M._fc(cast(h), cast(params["bin_fc2"]["w"]),
                  params["bin_fc2"]["b"], None)
    return x


def serving_supported(spec, compute_dtype, precision) -> bool:
    """Auto-selection gate for the Pallas serving stem: currently always
    False (explicit ``use_pallas=True`` still runs it).

    Measured result on v5e (PROFILE_SERVING_KERNEL_r4.json): the fused
    stem loses ~3x to the unfused XLA forward.  Two structural causes,
    both toolchain constraints rather than design slack: (a) Mosaic
    rejects the layout ops (column-shifted lane concats, minor-dim shape
    casts, strided slices) that a zero-waste im2col needs, forcing 2x
    packed-MAC overhead plus in-kernel relayouts — which already matches
    XLA's own conv emitter on this 4-channel shape; and (b) XLA inserts
    whole-array layout-normalization copies around every pallas_call
    boundary (trace: 13.5 ms of glue vs 5.5 ms of kernels per 8192-patch
    batch), costing more than the fused HBM savings.  The unfused path
    measures at ~88% of HBM peak for its pass structure, so the serving
    wins shipped this round are protocol-byte reductions instead (bf16
    storage-direct serving, channel select folded into conv1 — see
    models/manifold.apply).
    """
    return False
