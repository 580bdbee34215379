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
from odtk_tpu.train import train, lr_schedule
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
