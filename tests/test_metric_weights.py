"""Metric-weight conversion: synthetic torchvision/C3D state_dicts load into
the feature nets and change their outputs (i.e., weights actually apply)."""

import numpy as np

from hpvaegan_tpu.metrics.c3d import C3D, _BLOCKS
from hpvaegan_tpu.metrics.inception import InceptionV3, _iter_convs, _all_specs
from hpvaegan_tpu.tools.metric_weights import (c3d_state_dict_to_npz,
                                               inception_state_dict_to_npz)


def test_inception_weight_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    sd = {}
    for name, cin, cout, k in _iter_convs(_all_specs(1), 3):
        sd[f"{name}.conv.weight"] = rng.randn(cout, cin, k[0], k[1]).astype(
            np.float32) * 0.05
        sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
    path = str(tmp_path / "inc.npz")
    n = inception_state_dict_to_npz(sd, path)
    assert n == 5 * len(sd) // 5

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    m_random = InceptionV3([1])
    m_loaded = InceptionV3([1], weights=path)
    assert m_loaded.pretrained
    out_r = np.asarray(m_random(x)[0])
    out_l = np.asarray(m_loaded(x)[0])
    assert out_r.shape == out_l.shape
    assert np.abs(out_r - out_l).max() > 1e-4  # weights actually applied


def test_c3d_weight_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    sd = {}
    torch_names = {"conv1a": "conv1", "conv2a": "conv2"}
    for block in _BLOCKS[:2]:
        for name, cin, cout in block:
            tname = torch_names.get(name, name)
            sd[f"{tname}.weight"] = rng.randn(cout, cin, 3, 3, 3).astype(
                np.float32) * 0.05
            sd[f"{tname}.bias"] = np.zeros(cout, np.float32)
    path = str(tmp_path / "c3d.npz")
    c3d_state_dict_to_npz(sd, path)

    x = rng.rand(1, 4, 32, 32, 3).astype(np.float32)
    m_loaded = C3D([1], weights=path)
    assert m_loaded.pretrained
    out = np.asarray(m_loaded(x)[-1])
    assert out.shape[-1] == 128
    assert np.isfinite(out).all()
