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


def test_multibackbone_flag():
    a = parse(['train', 'm.ckpt', '--annotations', 'x',
               '--backbone', 'ResNet18FPN', 'MobileNetV2FPN'])
    assert a.backbone == ['ResNet18FPN', 'MobileNetV2FPN']
