"""Caffe weight import/export — the bit-parity bridge to the reference.

The reference restores trained weights with ``CopyTrainedLayersFrom``
(reference src/networksolver.cpp:410-413) and ``solver.Restore``
(reference src/networksolver.cpp:304-310); its snapshots are Caffe
``.caffemodel`` files (NetParameter binary protobuf) or ``.caffemodel.h5``
(HDF5, ``/data/<layer>/<blob_idx>`` datasets — Caffe ``Net::ToHDF5``).

This module reads and writes BOTH formats without a Caffe or protobuf
dependency — the binary wire format is decoded/encoded with a small varint
codec over the three message types that matter (NetParameter field 100 =
LayerParameter; LayerParameter fields 1/2/7 = name/type/blobs; BlobProto
fields 5/7 and the legacy 1-4 dims) — and maps the blobs onto the
:mod:`pose3d_tpu.models.manifold` parameter pytree:

  * Convolution blob0 is OIHW; our conv weights are HWIO (TPU-native
    layout) -> transpose (2, 3, 1, 0).
  * InnerProduct blob0 is [out, in] with ``in`` flattened in Caffe's CHW
    order; ``apply`` flattens NHWC activations to CHW before fc1 exactly so
    these weights line up -> transpose to [in, out].
  * PReLU blob0 is the per-channel slope vector.

Layer-name map (network/manifold_rgbd_16.prototxt:38-139, and the bin net's
head network/manifold_rgbdnor_16_bin.prototxt:100-155):
conv1, conv2, ip1, ip2 -> conv1, conv2, fc1, fc2; relu1, relu2, relu_ip1,
relu_ip2 -> prelu1..4 (PReLU variants only); bin_ip1, relu_bin_ip1, bin_ip2
-> bin_fc1, bin_prelu, bin_fc2.

``warm_start`` reproduces ``CopyTrainedLayersFrom`` semantics: layers are
matched by name; anything absent from the snapshot keeps its initialization
(this is how the reference's bin net inherits an ELU-trained trunk while
its freshly-initialized PReLU slopes stay at 0.25).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from pose3d_tpu.models.manifold import NetSpec

# ----------------------------------------------------------------- protobuf

_WIRE_VARINT = 0
_WIRE_I64 = 1
_WIRE_LEN = 2
_WIRE_I32 = 5


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one serialized message.
    LEN fields yield the raw bytes; numeric fields yield ints."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wire == _WIRE_I64:
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == _WIRE_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == _WIRE_I32:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_or_repeated_floats(chunks: List, wire_vals: List[bytes]) -> np.ndarray:
    """Caffe writes packed floats; accept unpacked I32 records too."""
    parts = []
    for v in chunks:
        parts.append(np.frombuffer(v, dtype="<f4"))
    for v in wire_vals:
        parts.append(np.frombuffer(v, dtype="<f4"))
    if not parts:
        return np.zeros((0,), np.float32)
    return np.concatenate(parts)


def _parse_blob(buf: bytes) -> np.ndarray:
    """BlobProto: shape(7: BlobShape{dim=1}), data(5: packed float),
    legacy dims num/channels/height/width (1-4)."""
    shape: List[int] = []
    legacy = {}
    data_packed: List[bytes] = []
    data_unpacked: List[bytes] = []
    double_packed: List[bytes] = []
    for field, wire, val in _iter_fields(buf):
        if field == 7 and wire == _WIRE_LEN:          # BlobShape
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    if w2 == _WIRE_LEN:               # packed int64
                        pos = 0
                        while pos < len(v2):
                            d, pos = _read_varint(v2, pos)
                            shape.append(d)
                    elif w2 == _WIRE_VARINT:          # unpacked
                        shape.append(int(v2))
        elif field == 5:                              # float data
            if wire == _WIRE_LEN:
                data_packed.append(val)
            else:
                data_unpacked.append(val)
        elif field == 8 and wire == _WIRE_LEN:        # double_data
            double_packed.append(val)
        elif field in (1, 2, 3, 4) and wire == _WIRE_VARINT:
            legacy[field] = val
    if double_packed:
        arr = np.concatenate(
            [np.frombuffer(v, dtype="<f8") for v in double_packed]
        ).astype(np.float32)
    else:
        arr = _packed_or_repeated_floats(data_packed, data_unpacked)
    if not shape and legacy:
        shape = [legacy.get(i, 1) for i in (1, 2, 3, 4)]
    if shape:
        arr = arr.reshape(shape)
    return arr


def _parse_layer(buf: bytes) -> Tuple[str, List[np.ndarray]]:
    """LayerParameter: name(1), type(2), blobs(7)."""
    name = ""
    blobs: List[np.ndarray] = []
    for field, wire, val in _iter_fields(buf):
        if field == 1 and wire == _WIRE_LEN:
            name = val.decode("utf-8")
        elif field == 7 and wire == _WIRE_LEN:
            blobs.append(_parse_blob(val))
    return name, blobs


def _parse_v1layer(buf: bytes) -> Tuple[str, List[np.ndarray]]:
    """V1LayerParameter (legacy NetParameter.layers, field 2):
    name(4), blobs(6)."""
    name = ""
    blobs: List[np.ndarray] = []
    for field, wire, val in _iter_fields(buf):
        if field == 4 and wire == _WIRE_LEN:
            name = val.decode("utf-8")
        elif field == 6 and wire == _WIRE_LEN:
            blobs.append(_parse_blob(val))
    return name, blobs


def parse_netparameter(buf: bytes) -> Dict[str, List[np.ndarray]]:
    """Binary NetParameter -> {layer_name: [blob arrays]} (layers with no
    blobs are dropped — they carry no weights)."""
    out: Dict[str, List[np.ndarray]] = {}
    for field, wire, val in _iter_fields(buf):
        if field == 100 and wire == _WIRE_LEN:        # layer (modern)
            name, blobs = _parse_layer(val)
            if blobs:
                out[name] = blobs
        elif field == 2 and wire == _WIRE_LEN:        # layers (V1 legacy)
            name, blobs = _parse_v1layer(val)
            if blobs:
                out[name] = blobs
    return out


# --- writer -----------------------------------------------------------------

def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | _WIRE_LEN) + _varint(len(payload)) + payload


def _encode_blob(arr: np.ndarray) -> bytes:
    shape_payload = b""
    for d in arr.shape:
        shape_payload += _varint((1 << 3) | _WIRE_VARINT) + _varint(int(d))
    data = np.ascontiguousarray(arr, dtype="<f4").tobytes()
    return (_len_field(7, shape_payload)
            + _len_field(5, data))                    # packed floats


def _encode_layer(name: str, ltype: str, blobs: List[np.ndarray]) -> bytes:
    payload = _len_field(1, name.encode("utf-8"))
    payload += _len_field(2, ltype.encode("utf-8"))
    for b in blobs:
        payload += _len_field(7, _encode_blob(b))
    return payload


def encode_netparameter(layers: Dict[str, List[np.ndarray]],
                        layer_types: Optional[Dict[str, str]] = None,
                        net_name: str = "MANIFOLD") -> bytes:
    """{layer_name: blobs} -> binary NetParameter bytes readable by Caffe's
    CopyTrainedLayersFromBinaryProto (layers matched by name)."""
    out = _len_field(1, net_name.encode("utf-8"))
    for name, blobs in layers.items():
        ltype = (layer_types or {}).get(name, _default_layer_type(name))
        out += _len_field(100, _encode_layer(name, ltype, blobs))
    return out


def _default_layer_type(name: str) -> str:
    if name.startswith("conv"):
        return "Convolution"
    if "ip" in name:
        return "InnerProduct"
    return "PReLU"


# -------------------------------------------------------------------- HDF5

_H5_MAGIC = b"\x89HDF\r\n\x1a\n"


def read_hdf5_snapshot(path: str) -> Dict[str, List[np.ndarray]]:
    """Caffe Net::ToHDF5 layout: /data/<layer_name>/<blob_idx> datasets."""
    import h5py
    out: Dict[str, List[np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        data = f["data"]
        for lname in data:
            grp = data[lname]
            blobs = [np.asarray(grp[str(i)], dtype=np.float32)
                     for i in sorted(grp, key=int)]
            if blobs:
                out[lname] = blobs
    return out


def write_hdf5_snapshot(path: str,
                        layers: Dict[str, List[np.ndarray]]) -> None:
    import h5py
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for lname, blobs in layers.items():
            grp = data.create_group(lname)
            for i, b in enumerate(blobs):
                grp.create_dataset(str(i),
                                   data=np.asarray(b, dtype=np.float32))


# ----------------------------------------------------------- blob <-> pytree

# our param subtree -> (caffe layer name, kind)
_LAYER_MAP: Tuple[Tuple[str, str, str], ...] = (
    ("conv1", "conv1", "conv"),
    ("conv2", "conv2", "conv"),
    ("fc1", "ip1", "ip"),
    ("fc2", "ip2", "ip"),
    ("prelu1", "relu1", "prelu"),
    ("prelu2", "relu2", "prelu"),
    ("prelu3", "relu_ip1", "prelu"),
    ("prelu4", "relu_ip2", "prelu"),
    ("bin_fc1", "bin_ip1", "ip"),
    ("bin_prelu", "relu_bin_ip1", "prelu"),
    ("bin_fc2", "bin_ip2", "ip"),
)

_CAFFE_TYPES = {"conv": "Convolution", "ip": "InnerProduct",
                "prelu": "PReLU"}


def load_caffemodel(path: str) -> Dict[str, List[np.ndarray]]:
    """Read a Caffe snapshot (binary protobuf OR HDF5, sniffed by magic)."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head == _H5_MAGIC:
        return read_hdf5_snapshot(path)
    with open(path, "rb") as f:
        return parse_netparameter(f.read())


def _import_one(kind: str, blobs: List[np.ndarray]) -> Dict[str, np.ndarray]:
    if kind == "conv":
        w = np.asarray(blobs[0], np.float32)
        if w.ndim != 4:
            raise ValueError(f"conv weight blob has shape {w.shape}")
        b = np.asarray(blobs[1], np.float32).reshape(-1)
        return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}   # OIHW -> HWIO
    if kind == "ip":
        w = np.asarray(blobs[0], np.float32)
        w = w.reshape(w.shape[-2], w.shape[-1]) if w.ndim > 2 else w
        b = np.asarray(blobs[1], np.float32).reshape(-1)
        return {"w": w.T.copy(), "b": b}                      # [out,in]->[in,out]
    # prelu
    a = np.asarray(blobs[0], np.float32).reshape(-1)
    return {"a": a}


def _export_one(kind: str, sub: Dict) -> List[np.ndarray]:
    if kind == "conv":
        w = np.asarray(sub["w"], np.float32)
        return [np.transpose(w, (3, 2, 0, 1)).copy(),         # HWIO -> OIHW
                np.asarray(sub["b"], np.float32)]
    if kind == "ip":
        w = np.asarray(sub["w"], np.float32)
        return [w.T.copy(), np.asarray(sub["b"], np.float32)]
    return [np.asarray(sub["a"], np.float32)]


def params_from_caffe(blobs: Dict[str, List[np.ndarray]],
                      spec: NetSpec, *, strict: bool = True) -> Dict:
    """Build the full parameter pytree of ``spec`` from Caffe layer blobs.

    strict=True requires every parameterized layer of the variant to be
    present (use :func:`warm_start` for partial restores)."""
    import jax.numpy as jnp
    params: Dict = {}
    for ours, caffe_name, kind in _LAYER_MAP:
        if not _spec_has(spec, ours):
            continue
        if caffe_name not in blobs:
            if strict:
                raise KeyError(
                    f"snapshot is missing layer {caffe_name!r} "
                    f"(needed for {spec.name!r}); present: "
                    f"{sorted(blobs)}")
            continue
        params[ours] = {k: jnp.asarray(v) for k, v in
                        _import_one(kind, blobs[caffe_name]).items()}
    _validate_shapes(params, spec)
    return params


def caffe_from_params(params: Dict,
                      spec: NetSpec) -> Dict[str, List[np.ndarray]]:
    """Parameter pytree -> {caffe layer name: blobs} (OIHW / [out,in])."""
    out: Dict[str, List[np.ndarray]] = {}
    for ours, caffe_name, kind in _LAYER_MAP:
        if ours in params:
            out[caffe_name] = _export_one(kind, params[ours])
    return out


def _spec_has(spec: NetSpec, name: str) -> bool:
    if name.startswith("bin_") and not spec.bin_head:
        return False
    if name == "prelu4":          # the frozen relu_ip2 before the bin head
        return spec.bin_head
    if name.startswith("prelu"):  # prelu1-3: the trunk's activation params
        return spec.activation == "prelu"
    return True


def _validate_shapes(params: Dict, spec: NetSpec) -> None:
    if "conv1" in params:
        w = params["conv1"]["w"]
        if w.shape != (8, 8, spec.in_channels, 16):
            raise ValueError(
                f"conv1 weights {w.shape} do not match {spec.name!r} "
                f"(expected (8, 8, {spec.in_channels}, 16)); wrong "
                "channel variant?")
    if "fc2" in params:
        w = params["fc2"]["w"]
        if w.shape[1] != spec.desc_dim:
            raise ValueError(
                f"ip2 output dim {w.shape[1]} != desc_dim {spec.desc_dim}")


def warm_start(params: Dict, path: str, spec: NetSpec) -> Dict:
    """CopyTrainedLayersFrom semantics (reference
    src/networksolver.cpp:410-413): overwrite the subtrees whose Caffe layer
    exists in the snapshot, keep everything else at its initialization.
    Returns a new pytree; ``params`` is not mutated."""
    import jax.numpy as jnp
    blobs = load_caffemodel(path)
    out = dict(params)
    for ours, caffe_name, kind in _LAYER_MAP:
        if ours in params and caffe_name in blobs:
            imported = _import_one(kind, blobs[caffe_name])
            cur = params[ours]
            for k, v in imported.items():
                if tuple(cur[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch restoring {caffe_name!r}/{k}: "
                        f"snapshot {v.shape} vs model {tuple(cur[k].shape)}")
            out[ours] = {k: jnp.asarray(v) for k, v in imported.items()}
    return out


def save_caffemodel(path: str, params: Dict, spec: NetSpec) -> None:
    """Write a Caffe-readable snapshot; format picked by extension
    (``.h5`` -> HDF5, anything else -> binary NetParameter protobuf)."""
    layers = caffe_from_params(params, spec)
    if path.endswith(".h5"):
        write_hdf5_snapshot(path, layers)
        return
    types = {caffe: _CAFFE_TYPES[kind] for _, caffe, kind in _LAYER_MAP}
    with open(path, "wb") as f:
        f.write(encode_netparameter(layers, types))
