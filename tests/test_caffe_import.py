"""Caffe weight import/export + bit-parity harness.

The north-star target is "bit-comparable 16-D descriptors vs the Caffe
reference" (BASELINE.md).  Since Caffe itself is not in the image, the
golden model is a NumPy transcription of the exact Caffe layer semantics
for the manifold trunk (reference network/manifold_rgbd_16.prototxt:38-139):

  conv (cross-correlation, VALID, stride 1) -> MAX pool 2x2/2 *ceil mode*
  -> PReLU/ELU -> conv -> pool -> act -> InnerProduct over a CHW flatten
  -> act -> InnerProduct.

A random Caffe snapshot (both HDF5 and binary-protobuf formats) is imported
into the pytree and the repo forward at precision='highest' is compared to
the NumPy golden.  Round-trips prove the exporter writes what the importer
reads, bit for bit.
"""

import numpy as np
import pytest

import jax

from pose3d_tpu.models import NETWORKS, apply
from pose3d_tpu.models import caffe_io
from pose3d_tpu.models.manifold import init_params


# --------------------------------------------------------- NumPy golden net

def _np_conv(x, w, b):
    """Caffe Convolution: out[o,y,x] = sum_{c,ky,kx} w[o,c,ky,kx] *
    in[c,y+ky,x+kx] + b[o].  x: [C,H,W], w: [O,C,kh,kw]."""
    C, H, W = x.shape
    O, _, kh, kw = w.shape
    win = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(1, 2))
    # win: [C, H-kh+1, W-kw+1, kh, kw]
    out = np.einsum("cyxhw,ochw->oyx", win.astype(np.float64),
                    w.astype(np.float64))
    return out + b[:, None, None].astype(np.float64)


def _np_ceil_maxpool2(x):
    """Caffe MAX pooling k=2 s=2 ceil mode: windows clipped at the border."""
    C, H, W = x.shape
    oh, ow = (H + 1) // 2, (W + 1) // 2
    out = np.full((C, oh, ow), -np.inf)
    for y in range(oh):
        for xx in range(ow):
            out[:, y, xx] = x[:, 2 * y:2 * y + 2, 2 * xx:2 * xx + 2].max(
                axis=(1, 2))
    return out


def _np_act(x, kind, slope=None):
    if kind == "relu":
        return np.maximum(x, 0.0)
    if kind == "elu":
        return np.where(x > 0, x, np.expm1(x))
    # prelu, per-channel slope broadcast over trailing spatial dims
    a = slope.reshape((-1,) + (1,) * (x.ndim - 1))
    return np.where(x > 0, x, a * x)


def _np_forward(blobs, patch_chw, activation, bin_head=False):
    """Golden Caffe trunk forward for ONE sample. patch_chw: [C,64,64]."""
    def sl(name):
        return blobs[name][0] if name in blobs else None

    x = _np_conv(patch_chw, blobs["conv1"][0], blobs["conv1"][1])
    x = _np_ceil_maxpool2(x)
    x = _np_act(x, activation, sl("relu1"))
    x = _np_conv(x, blobs["conv2"][0], blobs["conv2"][1])
    x = _np_ceil_maxpool2(x)
    x = _np_act(x, activation, sl("relu2"))
    flat = x.reshape(-1)                       # CHW row-major flatten
    x = blobs["ip1"][0].astype(np.float64) @ flat + blobs["ip1"][1]
    x = _np_act(x, activation, sl("relu_ip1"))
    x = blobs["ip2"][0].astype(np.float64) @ x + blobs["ip2"][1]
    if bin_head:
        x = _np_act(x, "prelu", sl("relu_ip2"))
        x = blobs["bin_ip1"][0].astype(np.float64) @ x + blobs["bin_ip1"][1]
        x = _np_act(x, "prelu", sl("relu_bin_ip1"))
        x = blobs["bin_ip2"][0].astype(np.float64) @ x + blobs["bin_ip2"][1]
    return x


def _random_blobs(spec, rng, scale=0.1):
    """A random Caffe-layout snapshot for a variant."""
    cin = spec.in_channels
    blobs = {
        "conv1": [rng.normal(0, scale, (16, cin, 8, 8)).astype(np.float32),
                  rng.normal(0, scale, (16,)).astype(np.float32)],
        "conv2": [rng.normal(0, scale, (7, 16, 5, 5)).astype(np.float32),
                  rng.normal(0, scale, (7,)).astype(np.float32)],
        "ip1": [rng.normal(0, scale, (256, 1183)).astype(np.float32),
                rng.normal(0, scale, (256,)).astype(np.float32)],
        "ip2": [rng.normal(0, scale, (spec.desc_dim, 256)).astype(np.float32),
                rng.normal(0, scale, (spec.desc_dim,)).astype(np.float32)],
    }
    if spec.activation == "prelu":
        blobs["relu1"] = [rng.uniform(0.1, 0.5, (16,)).astype(np.float32)]
        blobs["relu2"] = [rng.uniform(0.1, 0.5, (7,)).astype(np.float32)]
        blobs["relu_ip1"] = [rng.uniform(0.1, 0.5, (256,)).astype(np.float32)]
    if spec.bin_head:
        blobs["relu_ip2"] = [
            rng.uniform(0.1, 0.5, (spec.desc_dim,)).astype(np.float32)]
        blobs["bin_ip1"] = [
            rng.normal(0, scale, (spec.bin_hidden,
                                  spec.desc_dim)).astype(np.float32),
            rng.normal(0, scale, (spec.bin_hidden,)).astype(np.float32)]
        blobs["relu_bin_ip1"] = [
            rng.uniform(0.1, 0.5, (spec.bin_hidden,)).astype(np.float32)]
        blobs["bin_ip2"] = [
            rng.normal(0, scale, (spec.bin_dim,
                                  spec.bin_hidden)).astype(np.float32),
            rng.normal(0, scale, (spec.bin_dim,)).astype(np.float32)]
    return blobs


@pytest.mark.parametrize("name", ["manifold_rgbd_16", "manifold_rgb_16",
                                  "manifold_rgbdnor_16_bin"])
def test_imported_weights_match_caffe_golden(name, tmp_path):
    """Import a Caffe snapshot, run the repo forward at precision='highest',
    compare against the NumPy transcription of the Caffe math."""
    spec = NETWORKS[name]
    rng = np.random.default_rng(7)
    blobs = _random_blobs(spec, rng)

    # through the HDF5 snapshot format (what Caffe's ToHDF5 writes)
    path = str(tmp_path / "net.caffemodel.h5")
    caffe_io.write_hdf5_snapshot(path, blobs)
    params = caffe_io.params_from_caffe(caffe_io.load_caffemodel(path), spec)

    patches = rng.random((3, 64, 64, 7)).astype(np.float32)
    got = np.asarray(apply(params, spec, patches, precision="highest"))

    sel = np.array(spec.channels)
    for i in range(len(patches)):
        chw = patches[i][..., sel].transpose(2, 0, 1)    # HWC -> CHW
        want = _np_forward(blobs, chw, spec.activation,
                           bin_head=spec.bin_head)
        # f32 forward vs f64 golden: descriptor-scale agreement to ~1e-5
        np.testing.assert_allclose(got[i], want, rtol=2e-5, atol=2e-5)


def test_binaryproto_roundtrip_bit_exact(tmp_path):
    spec = NETWORKS["manifold_rgbdnor_16_bin"]
    params = init_params(jax.random.key(3), spec)
    path = str(tmp_path / "net.caffemodel")
    caffe_io.save_caffemodel(path, params, spec)
    blobs = caffe_io.load_caffemodel(path)
    params2 = caffe_io.params_from_caffe(blobs, spec)
    for name in params:
        for k in params[name]:
            a, b = np.asarray(params[name][k]), np.asarray(params2[name][k])
            assert a.shape == b.shape, (name, k)
            assert (a == b).all(), (name, k)   # bit-exact


def test_hdf5_roundtrip_bit_exact(tmp_path):
    spec = NETWORKS["manifold_rgbd_16"]
    params = init_params(jax.random.key(4), spec)
    path = str(tmp_path / "net.caffemodel.h5")
    caffe_io.save_caffemodel(path, params, spec)
    params2 = caffe_io.params_from_caffe(caffe_io.load_caffemodel(path),
                                         spec)
    for name in params:
        for k in params[name]:
            assert (np.asarray(params[name][k])
                    == np.asarray(params2[name][k])).all(), (name, k)


def test_warm_start_copy_trained_layers_semantics(tmp_path):
    """CopyTrainedLayersFrom: matched layers restored, unmatched keep init —
    exactly how the bin net inherits a trained trunk while its PReLU slopes
    stay at 0.25 (reference src/networksolver.cpp:410-413)."""
    trunk_spec = NETWORKS["manifold_rgbdnor_16"]      # ELU trunk, no prelus
    trunk_params = init_params(jax.random.key(5), trunk_spec)
    path = str(tmp_path / "trunk.caffemodel")
    caffe_io.save_caffemodel(path, trunk_params, trunk_spec)

    bin_spec = NETWORKS["manifold_rgbdnor_16_bin"]
    init = init_params(jax.random.key(6), bin_spec)
    restored = caffe_io.warm_start(init, path, bin_spec)

    # conv/fc trunk copied from the snapshot
    for lay in ("conv1", "conv2", "fc1", "fc2"):
        assert (np.asarray(restored[lay]["w"])
                == np.asarray(trunk_params[lay]["w"])).all()
    # PReLU slopes + bin head keep their initialization (not in snapshot)
    assert (np.asarray(restored["prelu1"]["a"]) == 0.25).all()
    assert (np.asarray(restored["prelu4"]["a"]) == 0.25).all()
    assert (np.asarray(restored["bin_fc1"]["w"])
            == np.asarray(init["bin_fc1"]["w"])).all()


def test_legacy_v1_and_dims_parse(tmp_path):
    """Old-style snapshots: V1LayerParameter (field 2) + legacy 4-D blob
    dims (num/channels/height/width) instead of BlobShape."""
    w = np.arange(16 * 4 * 8 * 8, dtype=np.float32).reshape(16, 4, 8, 8)
    b = np.arange(16, dtype=np.float32)

    def varint(x):
        out = bytearray()
        while True:
            byte = x & 0x7F
            x >>= 7
            if x:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                return bytes(out)

    def len_field(f, payload):
        return varint((f << 3) | 2) + varint(len(payload)) + payload

    def legacy_blob(arr):
        p = b""
        for i, d in enumerate(arr.shape if arr.ndim == 4
                              else (1, 1, 1, arr.shape[0])):
            p += varint(((i + 1) << 3) | 0) + varint(d)
        p += len_field(5, arr.astype("<f4").tobytes())
        return p

    layer = (len_field(4, b"conv1")
             + len_field(6, legacy_blob(w))
             + len_field(6, legacy_blob(b)))
    net = len_field(2, layer)
    path = tmp_path / "legacy.caffemodel"
    path.write_bytes(net)

    blobs = caffe_io.load_caffemodel(str(path))
    assert set(blobs) == {"conv1"}
    assert blobs["conv1"][0].shape == (16, 4, 8, 8)
    assert (blobs["conv1"][0] == w).all()
    assert blobs["conv1"][1].reshape(-1).shape == (16,)


def test_bin_head_prelu4_changes_output():
    """The frozen relu_ip2 PReLU must actually gate the bin head
    (network/manifold_rgbdnor_16_bin.prototxt:113-119)."""
    spec = NETWORKS["manifold_rgbdnor_16_bin"]
    params = init_params(jax.random.key(8), spec)
    x = np.random.default_rng(9).random((4, 64, 64, 7)).astype(np.float32)
    base = np.asarray(apply(params, spec, x, bin_head=True))
    import jax.numpy as jnp
    params2 = dict(params)
    params2["prelu4"] = {"a": jnp.ones_like(params["prelu4"]["a"])}
    changed = np.asarray(apply(params2, spec, x, bin_head=True))
    assert not np.allclose(base, changed)
