"""Anchor generation parity tests (golden values derived by hand from the
reference formulas at odtk/box.py:8-64)."""

import numpy as np

from odtk_tpu.ops import generate_anchors, generate_anchors_rotated

RATIOS = [1.0, 2.0, 0.5]
SCALES = [4 * 2 ** (i / 3) for i in range(3)]


def test_axis_anchor_golden_ratio1():
    # stride 8, ratio 1, scale 4: ws = sqrt(64/1) = 8, dwh = (8, 8),
    # xy1 = 0.5*(8 - 32) = -12, xy2 = 0.5*(8 + 32) = 20
    a = generate_anchors(8, [1.0], [4.0])
    np.testing.assert_allclose(a, [[-12, -12, 20, 20]], atol=1e-5)


def test_axis_anchor_golden_ratio2():
    # ratio 2: ws = sqrt(64/2), h = 2*ws -> box w = ws*scale, h = 2*ws*scale
    a = generate_anchors(8, [2.0], [4.0])[0]
    ws = np.sqrt(64 / 2.0)
    np.testing.assert_allclose(a[2] - a[0], ws * 4, atol=1e-4)
    np.testing.assert_allclose(a[3] - a[1], 2 * ws * 4, atol=1e-4)
    # centered on the stride x stride window
    np.testing.assert_allclose(a[0] + a[2], 8, atol=1e-4)
    np.testing.assert_allclose(a[1] + a[3], 8, atol=1e-4)


def test_axis_anchor_enumeration_order():
    """Scale-major, ratio-minor: rows [s0r0, s0r1, s0r2, s1r0, ...]."""
    a = generate_anchors(8, RATIOS, SCALES)
    assert a.shape == (9, 4)
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    ar = h / w
    np.testing.assert_allclose(ar[:3], RATIOS, rtol=1e-5)
    np.testing.assert_allclose(ar[3:6], RATIOS, rtol=1e-5)
    # areas grow with scale within a ratio slot
    areas = w * h
    assert areas[3] > areas[0] and areas[6] > areas[3]


def test_rotated_anchor_shapes_and_zero_angle():
    axis, rot = generate_anchors_rotated(8, RATIOS, SCALES,
                                         [-np.pi / 6, 0, np.pi / 6])
    assert axis.shape == (27, 4) and rot.shape == (27, 8)
    # angle-major: rows 9..17 are the zero-angle block; their corner
    # polygon must equal the axis-aligned corners (tl, tr, br, bl)
    for i in range(9, 18):
        x1, y1, x2, y2 = axis[i]
        expect = np.array([x1, y1, x2, y1, x2, y2, x1, y2])
        np.testing.assert_allclose(rot[i], expect, atol=1e-4)


def test_rotated_anchor_rotation_preserves_center_and_size():
    angles = [-np.pi / 6, 0, np.pi / 6]
    axis, rot = generate_anchors_rotated(16, [1.0], [4.0], angles)
    ctr = 16 / 2 - 0.5
    for i, ang in enumerate(angles):
        quad = rot[i].reshape(4, 2)
        np.testing.assert_allclose(quad.mean(0), [ctr, ctr], atol=1e-3)
        # side lengths preserved under rotation
        d01 = np.linalg.norm(quad[1] - quad[0])
        d12 = np.linalg.norm(quad[2] - quad[1])
        w = axis[i, 2] - axis[i, 0]
        h = axis[i, 3] - axis[i, 1]
        np.testing.assert_allclose(sorted([d01, d12]), sorted([w, h]),
                                   atol=1e-3)
