"""Prototxt parser tests: the derived NetSpecs must equal the registry for
every shipped reference network definition."""

import os

import pytest

from pose3d_tpu.models import NETWORKS
from pose3d_tpu.models.prototxt import (load_spec, parse_prototxt,
                                        spec_from_prototxt)

REF_NET_DIR = "/root/reference/network"


def test_parse_basic_structure():
    text = '''
    name: "X"
    input_shape{dim: 300 dim: 7 dim: 64 dim: 64}
    layer { name: "a" type: "Convolution"
            convolution_param { num_output: 16 kernel_size: 8 } }
    layer { name: "b" type: "Convolution"
            convolution_param { num_output: 7 kernel_size: 5 } }
    '''
    d = parse_prototxt(text)
    assert d["name"] == "X"
    assert d["input_shape"]["dim"] == [300, 7, 64, 64]
    assert len(d["layer"]) == 2
    assert d["layer"][0]["convolution_param"]["num_output"] == 16


@pytest.mark.skipif(not os.path.isdir(REF_NET_DIR),
                    reason="reference prototxts not mounted")
@pytest.mark.parametrize("name", sorted(NETWORKS))
def test_reference_prototxts_match_registry(name):
    path = os.path.join(REF_NET_DIR, name + ".prototxt")
    assert os.path.exists(path), f"reference file missing for {name}"
    spec = spec_from_prototxt(open(path).read(), name=name)
    want = NETWORKS[name]
    assert spec.channels == want.channels, name
    assert spec.activation == want.activation, name
    assert spec.desc_dim == want.desc_dim, name
    assert spec.batch_size == want.batch_size, name
    assert spec.bin_head == want.bin_head, name
    if spec.bin_head:
        assert spec.bin_dim == want.bin_dim
        assert spec.bin_hidden == want.bin_hidden
    assert spec.margin == want.margin, name
    assert spec.loss_slices == want.loss_slices, name


def test_load_spec_fallback_registry(tmp_path):
    spec = load_spec(str(tmp_path), "manifold_rgbd_16")
    assert spec is NETWORKS["manifold_rgbd_16"]
    with pytest.raises(KeyError):
        load_spec(str(tmp_path), "nonexistent_net")


def test_load_spec_from_custom_file(tmp_path):
    (tmp_path / "mynet.prototxt").write_text('''
    input_shape{dim: 100 dim: 7 dim: 64 dim: 64}
    layer { name: "c1" type: "Convolution"
            convolution_param { num_output: 16 kernel_size: 8 } }
    layer { name: "r1" type: "ELU" }
    layer { name: "ip" type: "InnerProduct"
            inner_product_param { num_output: 32 } }
    layer { name: "loss" type: "TripletLoss"
            triplet_loss_param { margin: 0.2 num_negatives: 2 use_pair: 0 } }
    ''')
    spec = load_spec(str(tmp_path), "mynet")
    assert spec.batch_size == 100
    assert spec.desc_dim == 32
    assert spec.activation == "elu"
    assert spec.margin == 0.2
    assert spec.loss_slices == ((0, -1, 2, 0),)
