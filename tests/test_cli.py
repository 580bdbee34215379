"""CLI argument-surface tests (flag parity with odtk/main.py:15-118)."""

import pytest

from odtk_tpu.main import parse


def test_train_defaults_match_reference_recipe():
    a = parse(['train', 'm.ckpt', '--annotations', 'ann.json'])
    assert a.command == 'train'
    assert a.backbone == ['ResNet50FPN']
    assert a.classes == 80
    assert a.resize == 800 and a.max_size == 1333
    assert a.jitter == [640, 1024]
    assert a.iters == 90000 and a.milestones == [60000, 80000]
    assert a.lr == 0.01 and a.warmup == 1000 and a.gamma == 0.1
    assert a.regularization_l2 == 0.0001
    assert a.anchor_ious == [0.4, 0.5]
    assert a.val_iters == 8000
    assert not a.full_precision and not a.rotated_bbox


def test_train_requires_annotations():
    with pytest.raises(SystemExit):
        parse(['train', 'm.ckpt'])


def test_schedule_scaling_flags():
    a = parse(['train', 'm.ckpt', '--annotations', 'x', '--schedule', '2',
               '--milestones', '100', '200', '--iters', '300'])
    scaled = [int(m * a.schedule) for m in a.milestones]
    assert scaled == [200, 400]
    assert int(a.iters * a.schedule) == 600


def test_infer_flags():
    a = parse(['infer', 'm.ckpt', '--images', '/d', '--batch', '4',
               '--rotated-bbox', '--output', 'a.json', 'b.json'])
    assert a.command == 'infer'
    assert a.output == ['a.json', 'b.json']
    assert a.rotated_bbox


def test_export_flags():
    a = parse(['export', 'm.ckpt', 'out.engine', '--size', '640',
               '--int8', '--calibration-batches', '3',
               '--dynamic-batch-opts', '1', '4', '8'])
    assert a.command == 'export'
    assert a.size == [640]
    assert a.int8 and a.calibration_batches == 3
    assert a.dynamic_batch_opts == [1, 4, 8]


def test_compat_noop_flags_accepted():
    # Reference command lines carry --with-dali/--with-apex (odtk
    # main.py:59-60,91-92); both must parse as no-ops here so existing
    # scripts keep working.
    a = parse(['train', 'm.ckpt', '--annotations', 'x',
               '--with-dali', '--with-apex',
               '--augment-free-rotate', '0', '90'])
    assert a.with_dali and a.with_apex
    assert a.augment_free_rotate == [0, 90]
    a = parse(['infer', 'm.ckpt', '--with-dali', '--with-apex'])
    assert a.with_dali and a.with_apex


def test_multibackbone_flag():
    a = parse(['train', 'm.ckpt', '--annotations', 'x',
               '--backbone', 'ResNet18FPN', 'MobileNetV2FPN'])
    assert a.backbone == ['ResNet18FPN', 'MobileNetV2FPN']


def test_anchor_geometry_flags():
    """Anchor geometry is a CLI surface here (the reference requires
    editing odtk/model.py, TRAINING.md:98-108); a fresh model must pick
    the flags up and persist them through the checkpoint."""
    a = parse(['train', 'm.ckpt', '--annotations', 'x',
               '--anchor-ratios', '0.5', '1.0',
               '--anchor-scales', '3.0', '5.0',
               '--anchor-angles', '-0.3', '0.0', '0.3', '--rotated-bbox'])
    assert a.anchor_ratios == [0.5, 1.0]
    assert a.anchor_scales == [3.0, 5.0]
    assert a.anchor_angles == [-0.3, 0.0, 0.3]

    import jax.numpy as jnp
    from odtk_tpu.model import Model
    model = Model(backbones='ResNet18FPN', classes=3,
                  rotated_bbox=True, ratios=a.anchor_ratios,
                  scales=a.anchor_scales, angles=a.anchor_angles,
                  dtype=jnp.float32)
    model.initialize(rng=0, image_size=(64, 64))
    assert model.num_anchors == 2 * 2 * 3
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'm.ckpt')
        model.save({'path': path})
        loaded, _ = Model.load(path)
        assert loaded.ratios == [0.5, 1.0]
        assert loaded.scales == [3.0, 5.0]
        assert loaded.angles == [-0.3, 0.0, 0.3]


def test_infer_postprocessing_flags():
    a = parse(['infer', 'm.ckpt', '--threshold', '0.2',
               '--detections', '50'])
    assert a.threshold == 0.2 and a.detections == 50
    a = parse(['infer', 'm.ckpt'])
    assert a.threshold is None and a.detections is None


def test_infer_fixed_size_flag():
    # one value -> square canvas; two -> (H, W); absent -> None
    a = parse(['infer', 'm.ckpt', '--fixed-size', '448'])
    assert a.fixed_size == [448]
    a = parse(['infer', 'm.ckpt', '--fixed-size', '384', '512'])
    assert a.fixed_size == [384, 512]
    a = parse(['infer', 'm.ckpt'])
    assert a.fixed_size is None
