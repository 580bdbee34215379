"""ImageNet default-init parity: fetch-with-cache + name maps.

The reference loads torchvision model-zoo weights on every fresh model
(odtk/backbones/resnet.py:21-22, mobilenet.py:16-17); odtk-tpu's
io/model_zoo gives the same default with a loud from-scratch warning
when the weights are unobtainable. No test here touches the network.
"""

import numpy as np
import pytest
import torch

from odtk_tpu.io import model_zoo
from odtk_tpu.io.torch_import import (load_backbone_weights,
                                      variables_to_state_dict)
from odtk_tpu.model import Model


@pytest.fixture(autouse=True)
def _reset_zoo_state():
    model_zoo._OFFLINE[0] = False
    model_zoo._WARNED.clear()
    yield
    model_zoo._OFFLINE[0] = False


def _synthetic_torchvision_sd(model, backbone, seed=0):
    """Walk our own template and emit a torchvision-named state_dict."""
    rng = np.random.RandomState(seed)
    sd = {}
    prefix = f'backbones.{backbone}.features.'
    for k, v in variables_to_state_dict(model.variables).items():
        if k.startswith(prefix):
            sd[k[len(prefix):]] = torch.from_numpy(
                rng.randn(*v.shape).astype(np.float32))
    assert sd, f'no backbone keys found for {backbone}'
    return sd


def test_fetch_cache_hit_no_network(tmp_path, monkeypatch):
    d = tmp_path / 'weights'
    d.mkdir()
    (d / 'resnet18-5c106cde.pth').write_bytes(b'x')
    monkeypatch.setenv('ODTK_WEIGHTS_DIR', str(d))

    def boom(*a, **k):
        raise AssertionError('network touched despite cache hit')
    monkeypatch.setattr('urllib.request.urlopen', boom)
    assert model_zoo.fetch('ResNet18FPN') == str(d / 'resnet18-5c106cde.pth')


def test_fetch_offline_warns_once_and_short_circuits(tmp_path, monkeypatch,
                                                     capsys):
    monkeypatch.setenv('ODTK_WEIGHTS_DIR', str(tmp_path / 'empty'))
    monkeypatch.setenv('TORCH_HOME', str(tmp_path / 'th'))
    calls = []

    def fail(*a, **k):
        calls.append(1)
        raise OSError('no route to host')
    monkeypatch.setattr('urllib.request.urlopen', fail)
    assert model_zoo.fetch('ResNet18FPN') is None
    assert model_zoo.fetch('ResNet50FPN') is None   # short-circuited
    assert len(calls) == 1
    err = capsys.readouterr().err
    assert 'FROM SCRATCH' in err


def test_fetch_unknown_backbone_warns(capsys):
    assert model_zoo.fetch('NoSuchNetFPN') is None
    assert 'no ImageNet weights known' in capsys.readouterr().err


def test_init_pretrained_from_cached_file(tmp_path, monkeypatch):
    m = Model(backbones='ResNet18FPN', classes=2)
    m.initialize(rng=0, image_size=(128, 128))
    sd = _synthetic_torchvision_sd(m, 'ResNet18FPN', seed=3)
    d = tmp_path / 'w'
    d.mkdir()
    torch.save(sd, str(d / 'resnet18-5c106cde.pth'))
    monkeypatch.setenv('ODTK_WEIGHTS_DIR', str(d))

    done = model_zoo.init_pretrained(m, verbose=False)
    assert done == ['ResNet18FPN']
    got = np.asarray(m.variables['params']['backbones_ResNet18FPN']
                     ['features']['conv1']['kernel'])
    want = sd['conv1.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize('backbone,probe_key', [
    ('ResNeXt50_32x4dFPN', 'layer1.0.conv2.weight'),   # grouped conv
    ('MobileNetV2FPN', None),                          # nested Sequentials
])
def test_name_map_roundtrip(tmp_path, backbone, probe_key):
    """Synthetic torchvision-named state_dicts load into every family
    the zoo covers: the name map (numeric Sequential flattening, conv
    transposition, frozen BN) is what's under test."""
    m = Model(backbones=backbone, classes=2)
    m.initialize(rng=0, image_size=(128, 128))
    sd = _synthetic_torchvision_sd(m, backbone, seed=5)
    if probe_key is not None:
        assert probe_key in sd
    path = str(tmp_path / 'w.pth')
    torch.save(sd, path)
    report = load_backbone_weights(m, backbone, path)
    assert not report['unmatched']
    # every shipped tensor landed: re-export and compare one conv
    back = variables_to_state_dict(m.variables)
    prefix = f'backbones.{backbone}.features.'
    for k, v in sd.items():
        np.testing.assert_array_equal(back[prefix + k], v.numpy(),
                                      err_msg=k)
