"""Target-assignment (snap_to_anchors) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from odtk_tpu.ops import (generate_anchors, generate_anchors_rotated,
                          snap_to_anchors, snap_to_anchors_rotated,
                          snap_to_anchors_rotated_batched, box2delta)

STRIDE = 8
SIZE = (64, 64)  # pixels (W, H) -> 8x8 cells


def pad_targets(rows, max_det=8, width=5):
    t = np.full((max_det, width), -1.0, np.float32)
    for i, r in enumerate(rows):
        t[i] = r
    return jnp.asarray(t)


def test_empty_targets_all_background():
    table = generate_anchors(STRIDE, [1.0], [4.0])
    cls, box, depth = snap_to_anchors(pad_targets([]), SIZE, STRIDE,
                                      table, num_classes=3)
    assert cls.shape == (8, 8, 1, 3)
    assert box.shape == (8, 8, 1, 4)
    assert depth.shape == (8, 8, 1)
    assert np.all(np.asarray(depth) == 0)
    assert np.all(np.asarray(cls) == 0)
    assert np.isfinite(np.asarray(box)).all()


def test_perfect_anchor_is_foreground():
    """A target exactly equal to one anchor gets IoU 1 -> fg with its class."""
    table = generate_anchors(STRIDE, [1.0], [4.0])  # single 32x32 anchor
    # anchor at cell (2, 3): x1 = 2*8 - 12 = 4, y1 = 3*8 - 12 = 12, w = h = 33
    x1, y1 = 2 * STRIDE + table[0, 0], 3 * STRIDE + table[0, 1]
    w = table[0, 2] - table[0, 0] + 1
    t = pad_targets([[x1, y1, w, w, 2.0]])
    cls, box, depth = snap_to_anchors(t, SIZE, STRIDE, table, num_classes=3)
    d = np.asarray(depth)
    assert d[3, 2, 0] == 3.0  # class 2 -> depth c+1
    c = np.asarray(cls)
    np.testing.assert_allclose(c[3, 2, 0], [0, 0, 1])
    # the delta for the perfectly-matching anchor is ~0
    np.testing.assert_allclose(np.asarray(box)[3, 2, 0], 0, atol=1e-4)


def test_iou_bands():
    """Check bg / ignore / fg depth bands against a brute-force IoU."""
    rng = np.random.RandomState(0)
    table = generate_anchors(STRIDE, [1.0, 2.0, 0.5],
                             [4 * 2 ** (i / 3) for i in range(3)])
    rows = []
    for _ in range(4):
        x, y = rng.uniform(0, 40, 2)
        w, h = rng.uniform(8, 30, 2)
        rows.append([x, y, w, h, float(rng.randint(0, 3))])
    t = pad_targets(rows)
    cls, box, depth = snap_to_anchors(t, SIZE, STRIDE, table, num_classes=3)

    # brute force
    boxes = np.asarray(t)[:4]
    bx = np.stack([boxes[:, 0], boxes[:, 1],
                   boxes[:, 0] + boxes[:, 2] - 1,
                   boxes[:, 1] + boxes[:, 3] - 1], axis=1)
    d = np.asarray(depth)
    got_cls = np.asarray(cls)
    for (hcell, wcell, a) in [(0, 0, 0), (3, 4, 2), (5, 1, 7), (7, 7, 4)]:
        anc = np.array([wcell * STRIDE, hcell * STRIDE] * 2) + np.asarray(table[a])
        x1 = np.maximum(anc[0], bx[:, 0]); y1 = np.maximum(anc[1], bx[:, 1])
        x2 = np.minimum(anc[2], bx[:, 2]); y2 = np.minimum(anc[3], bx[:, 3])
        inter = np.clip(x2 - x1 + 1, 0, None) * np.clip(y2 - y1 + 1, 0, None)
        area_a = (anc[2] - anc[0] + 1) * (anc[3] - anc[1] + 1)
        area_b = (bx[:, 2] - bx[:, 0] + 1) * (bx[:, 3] - bx[:, 1] + 1)
        iou = inter / (area_a + area_b - inter)
        best = int(np.argmax(iou))
        if iou[best] < 0.4:
            assert d[hcell, wcell, a] == 0
        elif iou[best] >= 0.5:
            assert d[hcell, wcell, a] == boxes[best, 4] + 1
            assert got_cls[hcell, wcell, a, int(boxes[best, 4])] == 1
        else:
            assert d[hcell, wcell, a] == -1


def test_box_targets_match_box2delta():
    table = generate_anchors(STRIDE, [1.0], [4.0])
    t = pad_targets([[4.0, 12.0, 30.0, 30.0, 1.0]])
    cls, box, depth = snap_to_anchors(t, SIZE, STRIDE, table, num_classes=2)
    d = np.asarray(depth)
    fg = np.argwhere(d > 0)
    assert len(fg) > 0
    h, w, a = fg[0]
    anc = jnp.asarray(
        np.array([w * STRIDE, h * STRIDE] * 2) + np.asarray(table[a]),
        jnp.float32)[None]
    tb = jnp.asarray([[4.0, 12.0, 4 + 30 - 1, 12 + 30 - 1]])
    want = np.asarray(box2delta(tb, anc))[0]
    np.testing.assert_allclose(np.asarray(box)[h, w, a], want, atol=1e-5)


def test_rotated_assignment_runs_and_bands():
    tables = generate_anchors_rotated(STRIDE, [1.0], [4.0],
                                      [-np.pi / 6, 0, np.pi / 6])
    t = pad_targets([[4.0, 12.0, 33.0, 33.0, 0.0, 1.0]], width=6)
    cls, box, depth = snap_to_anchors_rotated(t, SIZE, STRIDE, tables,
                                              num_classes=2)
    assert cls.shape == (8, 8, 3, 2)
    assert box.shape == (8, 8, 3, 6)
    d = np.asarray(depth)
    # the zero-angle anchor congruent with the target must be fg class 1
    assert (d == 2.0).any()
    assert np.isfinite(np.asarray(box)).all()
    # sin/cos channels of fg targets: theta=0 -> sin 0, cos 1
    fg = np.argwhere(d > 0)
    h, w, a = fg[0]
    bt = np.asarray(box)[h, w, a]
    np.testing.assert_allclose(bt[4], 0.0, atol=1e-5)
    np.testing.assert_allclose(bt[5], 1.0, atol=1e-5)


def test_rotated_batched_matches_vmapped():
    """The cond-skipping batched assignment must agree with
    vmap(snap_to_anchors_rotated) on everything the loss consumes:
    depth and cls everywhere, box deltas wherever depth > 0 (for
    background anchors the skipped path may pick a different —
    equally sub-threshold — best box, which the loss masks out)."""
    rng = np.random.RandomState(7)
    tables = generate_anchors_rotated(STRIDE, [1.0, 2.0], [4.0, 5.0],
                                      [-np.pi / 6, 0.0, np.pi / 6])
    batch = []
    for b in range(3):
        rows = []
        for _ in range(rng.randint(0, 5)):
            x, y = rng.uniform(0, 40, 2)
            w, h = rng.uniform(6, 40, 2)
            th = rng.uniform(-0.6, 0.6)
            rows.append([x, y, w, h, th, float(rng.randint(0, 3))])
        batch.append(np.array(pad_targets(rows, width=6)))
    # extremes: an out-of-band giant target and an exact anchor match
    batch[0][3] = [0, 0, 3000, 3000, 0.1, 2.0]
    batch = jnp.asarray(np.stack(batch))

    kw = dict(size=SIZE, stride=STRIDE, anchor_table=tables,
              num_classes=3, anchor_ious=(0.4, 0.5))
    want = jax.vmap(lambda t: snap_to_anchors_rotated(t, **kw))(batch)
    got = snap_to_anchors_rotated_batched(batch, **kw)

    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               atol=1e-5)                    # depth
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)                    # cls one-hot
    fg = np.asarray(want[2]) > 0
    np.testing.assert_allclose(np.asarray(got[1])[fg],
                               np.asarray(want[1])[fg], atol=1e-4)


def test_rotated_batched_chunks_match_vmapped():
    """Chunked best-match: with more active targets than one chunk
    (2 images x 6+ in-band targets > chunk=8), the loop runs multiple
    chunk iterations plus a masked partial tail — all must still agree
    with the vmapped reference on depth/cls everywhere and boxes on fg
    anchors."""
    size = (256, 512)                       # 32 x 64 cells at stride 8
    tables = generate_anchors_rotated(STRIDE, [1.0], [1.0],
                                      [-np.pi / 6, 0.0, np.pi / 6])

    rng = np.random.RandomState(11)
    batch = []
    for _ in range(2):
        rows = []
        for _ in range(5):
            x, y = rng.uniform(0, 230, 1)[0], rng.uniform(0, 480, 1)[0]
            w, h = rng.uniform(4, 14, 2)
            rows.append([x, y, w, h, rng.uniform(-0.6, 0.6),
                         float(rng.randint(0, 3))])
        batch.append(np.array(pad_targets(rows, width=6)))
    # tall-thin but still in the area band
    batch[0][5] = [100.0, 50.0, 2.0, 80.0, 0.05, 1.0]
    # at the image bottom edge
    batch[1][5] = [60.0, 500.0, 8.0, 8.0, 0.0, 2.0]
    batch = jnp.asarray(np.stack(batch))

    kw = dict(size=size, stride=STRIDE, anchor_table=tables,
              num_classes=3, anchor_ious=(0.4, 0.5))
    want = jax.vmap(lambda t: snap_to_anchors_rotated(t, **kw))(batch)
    got = snap_to_anchors_rotated_batched(batch, **kw)

    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               atol=1e-5)                    # depth
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-5)                    # cls one-hot
    fg = np.asarray(want[2]) > 0
    np.testing.assert_allclose(np.asarray(got[1])[fg],
                               np.asarray(want[1])[fg], atol=1e-4)


def test_empty_rotated_targets():
    tables = generate_anchors_rotated(STRIDE, [1.0], [4.0], [0.0])
    cls, box, depth = snap_to_anchors_rotated(
        pad_targets([], width=6), SIZE, STRIDE, tables, num_classes=2)
    assert np.all(np.asarray(depth) == 0)
    assert np.isfinite(np.asarray(box)).all()
