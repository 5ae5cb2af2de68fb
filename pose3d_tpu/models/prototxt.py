"""Caffe prototxt -> NetSpec: honor the reference's declarative model zoo.

The reference configures each network variant as a Caffe NetParameter text
proto under ``[paths] network_path`` (reference src/networksolver.cpp:278,
network/*.prototxt).  This module parses that text format (generic
message -> nested dicts) and derives the equivalent :class:`NetSpec`, so a
user can point the framework at their own prototxt instead of the built-in
registry — and so tests can prove the registry matches the shipped files.

Supported surface = what the seven reference nets use: input_shape, Slice/
Concat/Silence channel frontends, Convolution/Pooling/InnerProduct trunks,
ReLU/PReLU/ELU activations, TripletLoss/BinarizationLoss heads (with axis-0
Slice multi-loss, network/manifold.prototxt:111-171), lr_mult-0 frozen
trunks with bin heads.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Tuple

from pose3d_tpu.models.manifold import NETWORKS, NetSpec

_TOKEN = re.compile(r"[A-Za-z_][\w.]*|-?\d+\.?\d*(?:[eE][-+]?\d+)?|"
                    r'"[^"]*"|[{}:]')


def _tokenize(text: str) -> List[str]:
    # strip comments
    text = re.sub(r"#.*", "", text)
    return _TOKEN.findall(text)


def parse_prototxt(text: str) -> Dict:
    """Parse protobuf text format into nested dicts; repeated fields become
    lists."""
    tokens = _tokenize(text)
    pos = 0

    def parse_block() -> Dict:
        nonlocal pos
        out: Dict = {}

        def add(key, value):
            if key in out:
                if not isinstance(out[key], list):
                    out[key] = [out[key]]
                out[key].append(value)
            else:
                out[key] = value

        while pos < len(tokens) and tokens[pos] != "}":
            key = tokens[pos]
            pos += 1
            if pos < len(tokens) and tokens[pos] == ":":
                pos += 1
                val = tokens[pos]
                pos += 1
                if val.startswith('"'):
                    add(key, val[1:-1])
                else:
                    try:
                        add(key, int(val))
                    except ValueError:
                        try:
                            add(key, float(val))
                        except ValueError:
                            add(key, val)   # enum identifier
            elif pos < len(tokens) and tokens[pos] == "{":
                pos += 1
                add(key, parse_block())
                pos += 1                     # consume '}'
            else:
                raise ValueError(f"unexpected token after {key!r}")
        return out

    return parse_block()


def _as_list(v) -> List:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


_ACT_TYPES = {"ReLU": "relu", "PReLU": "prelu", "ELU": "elu"}

# The 7-channel patch layout and the canonical Slice(3,4) split
_PART_CHANNELS = {"rgb": (0, 1, 2), "dep": (3,), "nor": (4, 5, 6)}


def spec_from_prototxt(text: str, name: str = "custom") -> NetSpec:
    """Derive a NetSpec from a Caffe NetParameter text proto."""
    net = parse_prototxt(text)
    dims = _as_list(net.get("input_shape", {}).get("dim"))
    if len(dims) != 4:
        raise ValueError("expected 4-D input_shape")
    batch, in_ch = int(dims[0]), int(dims[1])

    layers = _as_list(net.get("layer"))

    # channel frontend: Slice(axis 1) names parts; Concat picks them
    channels: Tuple[int, ...] = tuple(range(in_ch))
    part_of: Dict[str, Tuple[int, ...]] = {}
    for lay in layers:
        if lay.get("type") == "Slice" and \
                lay.get("slice_param", {}).get("axis", 1) == 1:
            tops = _as_list(lay.get("top"))
            pts = [0] + [int(p) for p in
                         _as_list(lay["slice_param"].get("slice_point"))] \
                + [in_ch]
            for t, lo, hi in zip(tops, pts[:-1], pts[1:]):
                part_of[t] = tuple(range(lo, hi))
    for lay in layers:
        if lay.get("type") == "Concat":
            picked = []
            for b in _as_list(lay.get("bottom")):
                picked.extend(part_of.get(b, ()))
            if picked:
                channels = tuple(picked)

    # activation: first ReLU/PReLU/ELU layer in the trunk
    activation = "relu"
    for lay in layers:
        if lay.get("type") in _ACT_TYPES:
            activation = _ACT_TYPES[lay["type"]]
            break

    # trunk fc dims in order; frozen (lr_mult 0) layers belong to the trunk
    # of a binarization net, trainable fcs after them are the head
    ips = [lay for lay in layers if lay.get("type") == "InnerProduct"]

    def lr_mults(lay):
        return [p.get("lr_mult", 1) for p in _as_list(lay.get("param"))]

    frozen = [lay for lay in ips if lr_mults(lay)[:1] == [0]]
    trainable = [lay for lay in ips if lay not in frozen]

    losses_ = [lay for lay in layers
               if lay.get("type") in ("TripletLoss", "BinarizationLoss")]
    bin_head = any(lay.get("type") == "BinarizationLoss" for lay in losses_)

    if bin_head and frozen:
        desc_dim = int(frozen[-1]["inner_product_param"]["num_output"])
        bin_hidden = int(trainable[0]["inner_product_param"]["num_output"])
        bin_dim = int(trainable[-1]["inner_product_param"]["num_output"])
    else:
        desc_dim = int(ips[-1]["inner_product_param"]["num_output"])
        bin_hidden, bin_dim = 512, 128

    # loss plan: TripletLoss layers, optionally fed by an axis-0 Slice
    row_splits = {}
    for lay in layers:
        if lay.get("type") == "Slice" and \
                lay.get("slice_param", {}).get("axis") == 0:
            tops = _as_list(lay.get("top"))
            pts = [0] + [int(p) for p in
                         _as_list(lay["slice_param"].get("slice_point"))] \
                + [-1]
            for t, lo, hi in zip(tops, pts[:-1], pts[1:]):
                row_splits[t] = (lo, hi)

    slices = []
    margin = 0.1
    for lay in losses_:
        if lay.get("type") != "TripletLoss":
            continue
        p = lay.get("triplet_loss_param", {})
        margin = float(p.get("margin", 0.1))
        nneg = int(p.get("num_negatives", 3))
        pair = int(p.get("use_pair", 1))
        bottoms = _as_list(lay.get("bottom"))
        lo, hi = row_splits.get(bottoms[0] if bottoms else "", (0, -1))
        slices.append((lo, hi, nneg, pair))
    if not slices:
        slices = [(0, -1, 3, 1)]

    return NetSpec(name=name, channels=channels, activation=activation,
                   desc_dim=desc_dim, batch_size=batch,
                   loss_slices=tuple(slices), margin=margin,
                   bin_head=bin_head, bin_dim=bin_dim, bin_hidden=bin_hidden)


def load_spec(network_path: str, net_name: str) -> NetSpec:
    """NetSpec for ``net_name``: parse ``<network_path>/<net_name>.prototxt``
    when present, else fall back to the built-in registry."""
    import os
    path = os.path.join(network_path, net_name + ".prototxt")
    if os.path.exists(path):
        spec = spec_from_prototxt(open(path).read(), name=net_name)
        return spec
    if net_name in NETWORKS:
        return NETWORKS[net_name]
    raise KeyError(f"unknown network {net_name!r} (no prototxt at {path}, "
                   "not in the registry)")
