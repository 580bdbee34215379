"""Checkpoint codec round-trip tests (native + torch formats)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odtk_tpu.model import Model
from odtk_tpu.io.torch_import import (variables_to_state_dict,
                                      state_dict_to_variables)


def _make_model(**kw):
    m = Model(backbones='ResNet18FPN', classes=3, **kw)
    m.initialize(rng=0, image_size=(128, 128))
    return m


def _trees_equal(a, b):
    ok = jax.tree.map(lambda x, y: bool(np.allclose(x, y)), a, b)
    return all(jax.tree.leaves(ok))


def test_state_dict_names_are_torch_style():
    m = _make_model()
    sd = variables_to_state_dict(m.variables)
    keys = set(sd)
    assert 'backbones.ResNet18FPN.features.conv1.weight' in keys
    assert 'backbones.ResNet18FPN.features.layer1.0.conv1.weight' in keys
    assert 'backbones.ResNet18FPN.features.bn1.running_mean' in keys
    assert 'backbones.ResNet18FPN.lateral3.weight' in keys
    assert 'cls_head.0.weight' in keys and 'cls_head.8.bias' in keys
    assert 'box_head.8.weight' in keys
    # conv kernels exported as OIHW
    assert sd['backbones.ResNet18FPN.features.conv1.weight'].shape == (64, 3, 7, 7)


def test_state_dict_roundtrip_exact():
    m = _make_model()
    sd = variables_to_state_dict(m.variables)
    refilled, report = state_dict_to_variables(sd, m.variables)
    assert not report['missing'], report['missing'][:3]
    assert not report['unmatched'], report['unmatched'][:3]
    assert _trees_equal(refilled, m.variables)


@pytest.mark.parametrize('ext', ['.ckpt', '.pth'])
def test_checkpoint_save_load_roundtrip(tmp_path, ext):
    m = _make_model()
    # perturb a param so we're not comparing fresh inits
    m.variables['params']['cls_head_0']['bias'] = (
        m.variables['params']['cls_head_0']['bias'] + 1.5)
    path = str(tmp_path / f'model{ext}')
    m.save({'path': path, 'iteration': 123,
            'scheduler': {'last_iter': 123}})
    m2, state = Model.load(path)
    assert state['iteration'] == 123
    assert m2.backbones == ['ResNet18FPN'] and m2.classes == 3
    assert _trees_equal(m2.variables, m.variables)
    # inference parity
    x = jnp.zeros((1, 128, 128, 3))
    o1 = m.module.apply(m.variables, x)[0][0]
    o2 = m2.module.apply(m2.variables, x)[0][0]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_rotated_checkpoint_implies_rotated_model(tmp_path):
    m = Model(backbones='ResNet18FPN', classes=2, rotated_bbox=True)
    m.initialize(rng=0, image_size=(128, 128))
    path = str(tmp_path / 'rot.ckpt')
    m.save({'path': path})
    m2, _ = Model.load(path)
    assert m2.rotated_bbox and m2.angles is not None
    assert m2.num_anchors == 27


def test_fine_tune_surgery(tmp_path):
    donor = _make_model()
    path = str(tmp_path / 'donor.ckpt')
    donor.save({'path': path})
    # fine-tune into a model with different class count: cls_head_8 must
    # be re-initialized, the rest must transfer (model.py:80-98)
    m = Model(backbones='ResNet18FPN', classes=7)
    m.initialize(rng=1, image_size=(128, 128), fine_tune=path)
    same = np.allclose(
        np.asarray(m.variables['params']['cls_head_0']['kernel']),
        np.asarray(donor.variables['params']['cls_head_0']['kernel']))
    assert same
    assert m.variables['params']['cls_head_8']['kernel'].shape[-1] == 7 * 9
