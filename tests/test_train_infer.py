"""Workflow tests: train loop mechanics, checkpoint/resume, infer loop.

These drive the real train()/infer() entry points on the virtual-device
CPU backend with a tiny synthetic COCO set — the e2e role of the
reference's extras/test.sh (SURVEY.md §4), minus wall-clock-scale
training.
"""

import os

import numpy as np
import pytest

from odtk_tpu.model import Model
from odtk_tpu.train import train, lr_schedule, make_optimizer
from odtk_tpu.infer import infer
from synth import make_dataset


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e')
    img_dir, ann = make_dataset(str(root), n_images=4, size=(100, 120),
                                seed=7)
    return str(root), img_dir, ann


def small_model():
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    return m


def test_lr_schedule_matches_reference_shape():
    import jax.numpy as jnp
    sched = lr_schedule(0.01, warmup=100, milestones=[500, 800], gamma=0.1)
    # warmup: 0.9*i/warmup + 0.1
    np.testing.assert_allclose(float(sched(jnp.float32(0))), 0.001, rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.float32(50))),
                               0.01 * (0.9 * 0.5 + 0.1), rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.float32(100))), 0.01,
                               rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.float32(499))), 0.01,
                               rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.float32(500))), 0.001,
                               rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.float32(900))), 0.0001,
                               rtol=1e-5)


def test_flat_optimizer_matches_optax_chain():
    """The single-ravel SGD (flat=True, the fast path on TPU) must be
    numerically identical to the optax add_decayed_weights+trace+lr
    chain it replaces, step for step."""
    import jax
    import jax.numpy as jnp
    import optax

    params = {'a': {'kernel': jnp.linspace(-1.0, 1.0, 12).reshape(3, 4),
                    'bias': jnp.arange(4.0)},
              'b': {'kernel': jnp.full((2, 2), 0.3)}}
    kw = dict(lr=0.05, warmup=3, milestones=[6], gamma=0.1,
              weight_decay=1e-2, momentum=0.9)
    tx_flat = make_optimizer(flat=True, **kw)
    tx_ref = make_optimizer(flat=False, **kw)
    s_flat, s_ref = tx_flat.init(params), tx_ref.init(params)
    p_flat, p_ref = params, params

    rng = np.random.RandomState(3)
    for _ in range(8):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32),
            p_flat)
        u1, s_flat = tx_flat.update(grads, s_flat, p_flat)
        p_flat = optax.apply_updates(p_flat, u1)
        u2, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u2)
    for k1, k2 in [('a', 'kernel'), ('a', 'bias'), ('b', 'kernel')]:
        np.testing.assert_allclose(np.asarray(p_flat[k1][k2]),
                                   np.asarray(p_ref[k1][k2]), rtol=2e-6)


def test_train_runs_and_checkpoints(dataset):
    root, img_dir, ann = dataset
    m = small_model()
    ckpt = os.path.join(root, 'model.ckpt')
    state = {'path': ckpt}
    train(m, state, img_dir, ann, img_dir, None,
          resize=64, max_size=128, jitter=[64, 64], batch_size=2,
          iterations=2, val_iterations=0, lr=1e-3, warmup=2, milestones=[],
          gamma=0.1, mixed_precision=False, verbose=False)
    assert state['iteration'] == 2
    assert os.path.isfile(ckpt)

    # resume: continues from iteration 2 with optimizer state restored
    m2, state2 = Model.load(ckpt)
    assert state2['iteration'] == 2
    state2['path'] = ckpt
    train(m2, state2, img_dir, ann, img_dir, None,
          resize=64, max_size=128, jitter=[64, 64], batch_size=2,
          iterations=4, val_iterations=0, lr=1e-3, warmup=2, milestones=[],
          gamma=0.1, mixed_precision=False, verbose=False)
    assert state2['iteration'] == 4


def test_infer_runs_without_detections(dataset, capsys):
    root, img_dir, ann = dataset
    m = small_model()
    out = os.path.join(root, 'det.json')
    stats = infer(m, img_dir, [out], 64, 128, 2, annotations=ann,
                  mixed_precision=False, verbose=False)
    # untrained prior-init model: every score < threshold (by design)
    assert stats is None
    assert 'No detections!' in capsys.readouterr().out


def test_train_divergence_guard(dataset, monkeypatch):
    root, img_dir, ann = dataset
    m = small_model()
    # poison a weight so the loss goes non-finite
    m.variables['params']['cls_head_8']['bias'] = (
        m.variables['params']['cls_head_8']['bias'] + np.nan)
    with pytest.raises(RuntimeError, match='diverging'):
        train(m, {'path': os.path.join(root, 'x.ckpt')}, img_dir, ann,
              img_dir, None, resize=64, max_size=128, jitter=[64, 64],
              batch_size=2, iterations=1, val_iterations=0, lr=1e-3,
              warmup=0, milestones=[], gamma=0.1, mixed_precision=False,
              verbose=False)
