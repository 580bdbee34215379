"""COCO evaluator tests with hand-computable cases."""

import numpy as np

from odtk_tpu.data.coco import CocoIndex
from odtk_tpu.data.coco_eval import CocoEvaluator, box_iou_xywh


def make_index(gts, cats=(1,), img_ids=(0,)):
    dataset = {
        'images': [{'id': i} for i in img_ids],
        'annotations': [
            {'id': i + 1, 'iscrowd': 0,
             'area': g['bbox'][2] * g['bbox'][3], **g}
            for i, g in enumerate(gts)],
        'categories': [{'id': c} for c in cats]}
    return CocoIndex(dataset=dataset)


def det(img, cat, score, bbox):
    return {'image_id': img, 'category_id': cat, 'score': score,
            'bbox': list(bbox)}


def test_box_iou_xywh():
    iou = box_iou_xywh([[0, 0, 10, 10]], [[0, 0, 10, 10], [5, 0, 10, 10]],
                       [0, 0])
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 50 / 150)


def test_perfect_detection_ap1():
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [10, 10, 40, 40]},
        {'image_id': 0, 'category_id': 1, 'bbox': [100, 100, 50, 30]}])
    dets = [det(0, 1, 0.9, [10, 10, 40, 40]),
            det(0, 1, 0.8, [100, 100, 50, 30])]
    stats = CocoEvaluator(idx).evaluate(dets)
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)   # AP
    np.testing.assert_allclose(stats[1], 1.0, atol=1e-6)   # AP50
    np.testing.assert_allclose(stats[8], 1.0, atol=1e-6)   # AR100


def test_miss_halves_recall():
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [10, 10, 40, 40]},
        {'image_id': 0, 'category_id': 1, 'bbox': [100, 100, 40, 40]}])
    dets = [det(0, 1, 0.9, [10, 10, 40, 40])]   # one gt undetected
    stats = CocoEvaluator(idx).evaluate(dets)
    np.testing.assert_allclose(stats[8], 0.5, atol=1e-6)   # AR100
    # AP: precision 1.0 up to recall 0.5, 0 beyond -> 101-pt mean ≈ 0.505
    np.testing.assert_allclose(stats[1], 51 / 101, atol=1e-6)


def test_false_positive_lowers_ap():
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [10, 10, 40, 40]}])
    dets = [det(0, 1, 0.9, [200, 200, 40, 40]),    # FP ranked first
            det(0, 1, 0.8, [10, 10, 40, 40])]      # TP second
    stats = CocoEvaluator(idx).evaluate(dets)
    # precision at recall>=0: best precision after envelope = 0.5
    np.testing.assert_allclose(stats[1], 0.5, atol=1e-6)


def test_localization_threshold_bands():
    """IoU 0.6 det: counts at 0.5 threshold, not at 0.75."""
    # gt 0,0,10,10; det 0,0,10,16.67 -> iou = 100/166.7 ≈ 0.6
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [0, 0, 10, 10]}])
    dets = [det(0, 1, 0.9, [0, 0, 10, 100 / 6])]
    stats = CocoEvaluator(idx).evaluate(dets)
    np.testing.assert_allclose(stats[1], 1.0, atol=1e-6)   # AP50
    np.testing.assert_allclose(stats[2], 0.0, atol=1e-6)   # AP75


def test_wrong_class_is_fp():
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [10, 10, 40, 40]}],
        cats=(1, 2))
    dets = [det(0, 2, 0.9, [10, 10, 40, 40])]
    stats = CocoEvaluator(idx).evaluate(dets)
    np.testing.assert_allclose(stats[0], 0.0, atol=1e-6)


def test_area_range_buckets():
    # small gt (16x16=256 < 1024) and large gt (200x200)
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [0, 0, 16, 16]},
        {'image_id': 0, 'category_id': 1, 'bbox': [300, 300, 200, 200]}])
    dets = [det(0, 1, 0.9, [0, 0, 16, 16]),
            det(0, 1, 0.8, [300, 300, 200, 200])]
    ev = CocoEvaluator(idx)
    stats = ev.evaluate(dets)
    np.testing.assert_allclose(stats[3], 1.0, atol=1e-6)   # AP small
    np.testing.assert_allclose(stats[5], 1.0, atol=1e-6)   # AP large
    np.testing.assert_allclose(stats[4], -1.0, atol=1e-6)  # no medium gts


def test_maxdets_1_limits_recall():
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [0, 0, 40, 40]},
        {'image_id': 0, 'category_id': 1, 'bbox': [100, 0, 40, 40]}])
    dets = [det(0, 1, 0.9, [0, 0, 40, 40]),
            det(0, 1, 0.8, [100, 0, 40, 40])]
    stats = CocoEvaluator(idx).evaluate(dets)
    np.testing.assert_allclose(stats[6], 0.5, atol=1e-6)   # AR max=1
    np.testing.assert_allclose(stats[8], 1.0, atol=1e-6)   # AR max=100


def test_crowd_gt_is_ignored_not_fp():
    idx = make_index([
        {'image_id': 0, 'category_id': 1, 'bbox': [0, 0, 100, 100],
         'iscrowd': 1},
        {'image_id': 0, 'category_id': 1, 'bbox': [200, 200, 40, 40]}])
    # det inside the crowd region: matched to crowd -> ignored
    dets = [det(0, 1, 0.9, [10, 10, 30, 30]),
            det(0, 1, 0.8, [200, 200, 40, 40])]
    stats = CocoEvaluator(idx).evaluate(dets)
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)


def test_rotated_segm_eval():
    theta = 0.4
    gt = {'image_id': 0, 'category_id': 1, 'bbox': [50, 50, 40, 20, theta]}
    idx = make_index([dict(gt, area=800)])
    # detection polygon = exactly the rotated gt corners
    x, y, w, h = 50, 50, 40, 20
    cx, cy = x + (w - 1) / 2, y + (h - 1) / 2
    cs, sn = np.cos(theta), np.sin(theta)
    base = np.array([[x, y], [x, y + h - 1], [x + w - 1, y + h - 1],
                     [x + w - 1, y]])
    poly = ((base - [cx, cy]) @ np.array([[cs, sn], [-sn, cs]])
            + [cx, cy]).reshape(-1)
    d = det(0, 1, 0.9, [x, y, w, h, theta])
    d['segmentation'] = [poly.tolist()]
    stats = CocoEvaluator(idx, iou_type='segm').evaluate([d])
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)
