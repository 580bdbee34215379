"""Backbone registry coverage: every entry initializes with correct
feature-map shapes (eval_shape only — no FLOPs, so all 10 registry
entries are cheap to check)."""

import jax
import jax.numpy as jnp
import pytest

from odtk_tpu import backbones

FPN_NETS = ['ResNet18FPN', 'ResNet34FPN', 'ResNet50FPN', 'ResNet101FPN',
            'ResNet152FPN', 'ResNeXt50_32x4dFPN', 'ResNeXt101_32x8dFPN',
            'MobileNetV2FPN']
C4_NETS = ['ResNet18C4', 'ResNet34C4']


def test_registry_complete():
    for name in FPN_NETS + C4_NETS:
        assert name in backbones.available(), name


@pytest.mark.parametrize('name', FPN_NETS)
def test_fpn_backbone_shapes(name):
    net = backbones.build(name)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 256, 256, 3))
    variables_shape = jax.eval_shape(net.init, rng, dummy)
    out = jax.eval_shape(
        lambda v, x: net.apply(v, x), variables_shape, dummy)
    hw = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
    assert len(out) == 5
    for (h, w), o in zip(hw, out):
        assert o.shape == (1, h, w, 256), (name, o.shape)


@pytest.mark.parametrize('name', C4_NETS)
def test_c4_backbone_shapes(name):
    net = backbones.build(name)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 256, 256, 3))
    variables_shape = jax.eval_shape(net.init, rng, dummy)
    out = jax.eval_shape(
        lambda v, x: net.apply(v, x), variables_shape, dummy)
    assert len(out) == 1
    assert out[0].shape[1:3] == (16, 16)   # stride 16


def test_resnext_grouped_conv_shapes():
    net = backbones.build('ResNeXt50_32x4dFPN')
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 128, 128, 3))
    vs = jax.eval_shape(net.init, rng, dummy)
    # grouped conv kernel: [kh, kw, in/groups, out]
    k = vs['params']['features']['layer1_0']['conv2']['kernel']
    assert k.shape == (3, 3, 128 // 32, 128)
