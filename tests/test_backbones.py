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


def _stem_case(seed=0, b=2, h=64, w=64, o=16):
    import numpy as np
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    w7 = jnp.asarray(rng.randn(7, 7, 3, o) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, o), jnp.float32)
    shift = jnp.asarray(rng.randn(o) * 0.2, jnp.float32)
    return x, w7, scale, shift


def test_phase_conv_matches_direct_conv():
    """The merged space-to-depth phase conv reproduces the 7x7/s2
    conv's even and odd output columns exactly (modulo accumulation
    order), lane-packed as [even O | odd O]."""
    import numpy as np
    from odtk_tpu.backbones.layers import (merged_phase_conv,
                                           merged_phase_kernel,
                                           space_to_depth_fold)
    x, w7, _, _ = _stem_case()
    o = w7.shape[-1]
    ref = jax.lax.conv_general_dilated(
        x, w7, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    y = merged_phase_conv(space_to_depth_fold(x), merged_phase_kernel(w7))
    np.testing.assert_allclose(np.asarray(y[..., :o]),
                               np.asarray(ref[:, :, 0::2, :]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[..., o:]),
                               np.asarray(ref[:, :, 1::2, :]),
                               rtol=1e-5, atol=1e-5)


def _plain_stem(x, w7, scale, shift):
    from flax import linen as nn
    y = jax.lax.conv_general_dilated(
        x, w7, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    z = nn.relu(y * scale + shift)
    return nn.max_pool(z, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def test_fused_stem_pool_twin_matches_plain():
    import numpy as np
    from odtk_tpu.backbones.layers import (merged_phase_conv,
                                           merged_phase_kernel,
                                           space_to_depth_fold)
    from odtk_tpu.ops.pallas import fused_bn_relu_pool
    x, w7, scale, shift = _stem_case(seed=1)
    y = merged_phase_conv(space_to_depth_fold(x), merged_phase_kernel(w7))
    got = fused_bn_relu_pool(y, scale, shift)
    want = _plain_stem(x, w7, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_stem_pool_pallas_interpret_matches_twin():
    """Pallas kernel (interpret mode) == jnp twin: forward and the
    routed gradients through the whole stem (w7 cotangent)."""
    import numpy as np
    from odtk_tpu.backbones.layers import (merged_phase_conv,
                                           merged_phase_kernel,
                                           space_to_depth_fold)
    from odtk_tpu.ops.pallas import fused_bn_relu_pool
    # h=128 -> 32 pooled rows = 2 blocks/image of 16: exercises the
    # cross-block prev-row / next-window paths of both kernels
    x, w7, scale, shift = _stem_case(seed=2, b=2, h=128, w=64, o=8)

    def run(interpret):
        def loss(w):
            y = merged_phase_conv(space_to_depth_fold(x),
                                  merged_phase_kernel(w))
            p = fused_bn_relu_pool(y, scale, shift,
                                   interpret=interpret)
            # nonuniform weighting so routing errors change the value
            k = jnp.arange(p.size, dtype=jnp.float32).reshape(p.shape)
            return jnp.sum(p * jnp.sin(k)), p
        (val, p), grad = jax.value_and_grad(loss, has_aux=True)(w7)
        return val, p, grad

    v_t, p_t, g_t = run(False)          # twin (CPU dispatch)
    v_k, p_k, g_k = run(True)           # pallas interpret
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(v_k), float(v_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_t),
                               rtol=1e-4, atol=1e-5)


def test_fused_stem_pool_dead_window_grads_are_zero():
    """When the BN shift drives every pre-activation negative, the
    ReLU zeroes the whole window: the pooled output is 0 and the
    routed gradient must be exactly 0 (the idx plane's sentinel path),
    matching the twin."""
    import numpy as np
    from odtk_tpu.ops.pallas import fused_bn_relu_pool
    y = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (1, 32, 16, 16),
                                  jnp.float32))
    scale = jnp.ones((8,), jnp.float32)
    shift = jnp.full((8,), -100.0, jnp.float32)   # kills every window

    for interpret in (False, True):
        def loss(y):
            return jnp.sum(fused_bn_relu_pool(y, scale, shift,
                                              interpret=interpret) ** 2)
        g = jax.grad(loss)(y)
        np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_fused_stem_pool_tie_routing_matches_twin():
    """Constant input: every window candidate ties, so the gradient
    goes to the FIRST candidate in window scan order — kernel and twin
    (XLA select-and-scatter) must agree position for position."""
    import numpy as np
    from odtk_tpu.ops.pallas import fused_bn_relu_pool
    y = jnp.ones((1, 32, 16, 16), jnp.float32)
    scale = jnp.ones((8,), jnp.float32)
    shift = jnp.zeros((8,), jnp.float32)

    def grad_of(interpret):
        def loss(y):
            p = fused_bn_relu_pool(y, scale, shift, interpret=interpret)
            k = jnp.arange(p.size, dtype=jnp.float32).reshape(p.shape)
            return jnp.sum(p * jnp.cos(k))
        return jax.grad(loss)(y)

    g_t = grad_of(False)
    g_k = grad_of(True)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_t),
                               rtol=1e-6, atol=1e-6)


def test_resnet_fused_stem_matches_plain_stem():
    """Whole-backbone check: fused_stem=True and False produce the same
    features from the same parameters (CPU twin path)."""
    import numpy as np
    from odtk_tpu.backbones.resnet import ResNet
    x = jnp.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                      (1, 64, 64, 3)), jnp.float32)
    fused = ResNet(layers=(2, 2, 2, 2), bottleneck=False, fused_stem=True)
    plain = ResNet(layers=(2, 2, 2, 2), bottleneck=False, fused_stem=False)
    vs = plain.init(jax.random.PRNGKey(0), x)
    of = fused.apply(vs, x)
    op = plain.apply(vs, x)
    for a, b in zip(of, op):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_resnext_grouped_conv_shapes():
    net = backbones.build('ResNeXt50_32x4dFPN')
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 128, 128, 3))
    vs = jax.eval_shape(net.init, rng, dummy)
    # grouped conv kernel: [kh, kw, in/groups, out]
    k = vs['params']['features']['layer1_0']['conv2']['kernel']
    assert k.shape == (3, 3, 128 // 32, 128)


def test_wpack_kernel_matches_plain_conv():
    """wpack_kernel twin check: packed 3x3 and 1x1 convs on
    width-pair-packed input reproduce the plain conv exactly
    (including left/right edge columns)."""
    import numpy as np
    from odtk_tpu.backbones.layers import wpack_kernel

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    key = jax.random.split(jax.random.PRNGKey(7), 3)
    x = jax.random.normal(key[0], (2, 6, 8, 4), jnp.float32)
    xp = x.reshape(2, 6, 4, 8)
    w3 = jax.random.normal(key[1], (3, 3, 4, 4), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv(xp, wpack_kernel(w3))),
        np.asarray(conv(x, w3).reshape(2, 6, 4, 8)), rtol=1e-6, atol=1e-6)
    w1 = jax.random.normal(key[2], (1, 1, 4, 6), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv(xp, wpack_kernel(w1))),
        np.asarray(conv(x, w1).reshape(2, 6, 4, 12)), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize('bottleneck', [False, True])
def test_resnet_wpack_layer1_matches_plain(bottleneck):
    """Whole-backbone twin: wpack_layer1 on/off produce the same
    features AND the same parameter gradients from identical params
    (the packing is a pure graph transform)."""
    import numpy as np
    from odtk_tpu.backbones.resnet import ResNet
    x = jnp.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                      (1, 64, 64, 3)), jnp.float32)
    packed = ResNet(layers=(2, 2, 2, 2), bottleneck=bottleneck,
                    wpack_layer1=True)
    plain = ResNet(layers=(2, 2, 2, 2), bottleneck=bottleneck,
                   wpack_layer1=False)
    vs = plain.init(jax.random.PRNGKey(0), x)
    op = plain.apply(vs, x)
    ok = packed.apply(vs, x)
    # param tree must be identical (same names/shapes -> same ckpts)
    assert (jax.tree_util.tree_structure(packed.init(jax.random.PRNGKey(0),
                                                     x)['params'])
            == jax.tree_util.tree_structure(vs['params']))
    for a, b in zip(ok, op):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    def loss(net):
        def f(params):
            outs = net.apply({'params': params, 'frozen': vs['frozen']}, x)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return f
    gp = jax.grad(loss(plain))(vs['params'])
    gk = jax.grad(loss(packed))(vs['params'])
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_k = jax.tree_util.tree_leaves(gk)
    for (path, a), b in zip(flat_p, flat_k):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_resnet_wpack_layer1_odd_width_falls_back():
    """Odd pooled width cannot pack; the knob must silently fall back
    to the plain path (same outputs)."""
    import numpy as np
    from odtk_tpu.backbones.resnet import ResNet
    # 72/4 = 18 pooled cols (even) vs 68/4 = 17 (odd)
    x = jnp.asarray(jax.random.normal(jax.random.PRNGKey(6),
                                      (1, 64, 68, 3)), jnp.float32)
    packed = ResNet(layers=(2, 2, 2, 2), bottleneck=False,
                    wpack_layer1=True)
    plain = ResNet(layers=(2, 2, 2, 2), bottleneck=False,
                   wpack_layer1=False)
    vs = plain.init(jax.random.PRNGKey(0), x)
    for a, b in zip(packed.apply(vs, x), plain.apply(vs, x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
