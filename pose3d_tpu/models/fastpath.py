"""MXU-packed forward path: space-to-depth conv repacking.

The trunk's convolutions underfill the MXU's 128 output columns —
conv1 writes 16 channels, conv2 writes 7 (reference
network/manifold_rgbd_16.prototxt:37-77), so the systolic array runs at
<=16/128 column utilization and conv1 alone is ~87% of forward FLOPs.

This module repacks each conv+ceil-pool pair as a space-to-depth (block
2x2) convolution:

  * the input is reshaped so each 2x2 pixel block becomes 4x the channels
    ([H, W, C] -> [H/2, W/2, 4C]);
  * the kernel is re-indexed so the 4 output *phases* (py, px in {0,1})
    become extra output channels: W2[Dy, Dx, (iy,ix,c), (py,px,co)] =
    W[2*Dy+iy-py, 2*Dx+ix-px, c, co] (zero where the index leaves the
    kernel) — conv1's [8,8,4,16] becomes [5,5,16,64], conv2's [5,5,16,7]
    becomes [3,3,64,28];
  * Caffe's ceil-mode 2x2/2 max-pool (manifold._ceil_maxpool2) collapses to
    a max over the 4 phase groups at the SAME s2d pixel, because pooling
    pairs (2Y, 2Y+1) are exactly phases py=0,1 of s2d row Y.  Phases whose
    original row/column falls past the valid conv output are masked to -inf
    first (ceil-mode semantics).

Same math as models.manifold.apply (sums merely reassociate), ~2.5x better
MXU occupancy on conv1: 4x the output columns for 1.56x redundant kernel
slots and ~4% extra rows.  Used by descriptor extraction / evaluation;
training keeps the standard path (its backward pass is autodiff'd from the
canonical graph).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from pose3d_tpu.models import manifold as M


def pack_s2d_weights(w: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """[kh, kw, cin, cout] -> [KH2, KW2, block^2*cin, block^2*cout].

    Input channel order (iy, ix, c); output channel order (py, px, co).
    Entries outside the original kernel support are zero.
    """
    kh, kw, cin, cout = w.shape
    b = block
    kh2 = (kh - 1 + (b - 1)) // b + 1
    kw2 = (kw - 1 + (b - 1)) // b + 1

    Dy = np.arange(kh2)[:, None, None]            # [KH2, 1, 1]
    iy = np.arange(b)[None, :, None]              # [1, b(iy), 1]
    py = np.arange(b)[None, None, :]              # [1, 1, b(py)]
    dy = b * Dy + iy - py                         # [KH2, b, b]
    oky = (dy >= 0) & (dy < kh)
    Dx = np.arange(kw2)[:, None, None]
    dx = b * Dx + iy - py                         # [KW2, b(ix), b(px)]
    okx = (dx >= 0) & (dx < kw)

    # gather with clamped indices, zero the out-of-support taps
    dyc = np.clip(dy, 0, kh - 1)
    dxc = np.clip(dx, 0, kw - 1)
    # result axes: [KH2, iy, py, KW2, ix, px, c, co]
    w8 = w[dyc[:, :, :, None, None, None], dxc[None, None, None, :, :, :]]
    mask = (oky[:, :, :, None, None, None] &
            okx[None, None, None, :, :, :]).astype(w.dtype)
    w8 = w8 * mask[..., None, None]
    # -> [KH2, KW2, (iy, ix, c), (py, px, co)]
    w8 = jnp.transpose(w8, (0, 3, 1, 4, 6, 2, 5, 7))
    return w8.reshape(kh2, kw2, b * b * cin, b * b * cout)


def _space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, ceil(H/b), ceil(W/b), b*b*C], zero-padded,
    channel order (iy, ix, c)."""
    n, h, w, c = x.shape
    b = block
    ph, pw = (-h) % b, (-w) % b
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hb, wb = x.shape[1] // b, x.shape[2] // b
    x = x.reshape(n, hb, b, wb, b, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, hb, wb,
                                                        b * b * c)


def s2d_conv_pool(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                  block: int = 2, precision=None) -> jnp.ndarray:
    """conv(w, VALID) + Caffe ceil-mode 2x2/2 max-pool, s2d-packed.

    x [N, H, W, C], w [kh, kw, C, cout] (the CANONICAL kernel; packing
    happens here) -> [N, ceil((H-kh+1)/2), ceil((W-kw+1)/2), cout]
    pre-activation (bias added after the phase max — max(x)+b == max(x+b)).
    """
    assert block == 2, "pooling fusion assumes pool 2x2/2 == the s2d block"
    kh, kw, cin, cout = w.shape
    b = block
    n, h, wd, _ = x.shape
    h_out, w_out = h - kh + 1, wd - kw + 1          # valid conv output
    kh2 = (kh - 1 + (b - 1)) // b + 1
    kw2 = (kw - 1 + (b - 1)) // b + 1
    yo_n = -(-h_out // b)                           # pooled rows (ceil)
    xo_n = -(-w_out // b)

    s = _space_to_depth(x, b)
    # enough s2d rows for Yo in [0, yo_n): need yo_n - 1 + kh2
    need_h, need_w = yo_n - 1 + kh2, xo_n - 1 + kw2
    pad_h, pad_w = max(0, need_h - s.shape[1]), max(0, need_w - s.shape[2])
    if pad_h or pad_w:
        s = jnp.pad(s, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    else:
        s = s[:, :need_h, :need_w]

    w2 = pack_s2d_weights(w, b).astype(s.dtype)
    y = jax.lax.conv_general_dilated(
        s, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32, precision=precision)
    # y [N, yo_n, xo_n, (py, px, co)]
    y = y.reshape(n, yo_n, xo_n, b, b, cout)

    # ceil-mode mask: phase (Yo, py) is real only when b*Yo + py < h_out
    yo = jnp.arange(yo_n)[:, None] * b + jnp.arange(b)[None, :]
    xo = jnp.arange(xo_n)[:, None] * b + jnp.arange(b)[None, :]
    ok = ((yo < h_out)[None, :, None, :, None, None] &
          (xo < w_out)[None, None, :, None, :, None])
    y = jnp.where(ok, y, -jnp.inf)
    return jnp.max(y, axis=(3, 4)) + bias


def apply_fast(params: Dict, spec: M.NetSpec, patches: jnp.ndarray,
               *, bin_head: bool | None = None,
               compute_dtype: jnp.dtype | None = None,
               precision=None) -> jnp.ndarray:
    """manifold.apply with s2d-packed convolutions.

    Bit-comparable up to matmul reassociation (<=1e-5 relative at
    precision='highest'); identical pytree/params contract.
    """
    x = patches
    if x.shape[-1] != spec.in_channels:
        x = x[..., jnp.array(spec.channels)]

    def cast(v):
        return v.astype(compute_dtype) if compute_dtype is not None else v

    x = cast(x)
    x = M._act(spec, params, "prelu1",
               s2d_conv_pool(x, cast(params["conv1"]["w"]),
                             params["conv1"]["b"], precision=precision))
    x = M._act(spec, params, "prelu2",
               s2d_conv_pool(cast(x), cast(params["conv2"]["w"]),
                             params["conv2"]["b"], precision=precision))
    n = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)
    x = M._act(spec, params, "prelu3",
               M._fc(cast(x), cast(params["fc1"]["w"]), params["fc1"]["b"],
                     precision))
    x = M._fc(cast(x), cast(params["fc2"]["w"]), params["fc2"]["b"],
              precision)
    use_head = spec.bin_head if bin_head is None else bin_head
    if use_head:
        # the bin head's activations are PReLU regardless of the trunk's
        # (reference network/manifold_rgbdnor_16_bin.prototxt:113-147)
        a4 = params["prelu4"]["a"]
        x = jnp.where(x > 0, x, a4 * x)
        h = M._fc(cast(x), cast(params["bin_fc1"]["w"]),
                  params["bin_fc1"]["b"], precision)
        a = params["bin_prelu"]["a"]
        h = jnp.where(h > 0, h, a * h)
        x = M._fc(cast(h), cast(params["bin_fc2"]["w"]),
                  params["bin_fc2"]["b"], precision)
    return x
