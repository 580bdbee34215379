"""Box codec round-trip and geometry tests."""

import jax.numpy as jnp
import numpy as np

from odtk_tpu.ops import (box2delta, box2delta_rotated, delta2box,
                          delta2box_rotated, order_points, rotate_boxes)


def rand_boxes(n, seed=0, lim=500.0):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, lim, (n, 2)).astype(np.float32)
    wh = rng.uniform(2, 80, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh - 1], axis=1)


def test_box_delta_roundtrip():
    boxes = rand_boxes(64, seed=1)
    anchors = rand_boxes(64, seed=2)
    deltas = box2delta(jnp.asarray(boxes), jnp.asarray(anchors))
    # decode without clamping effects: use a huge size
    rec = delta2box(deltas, jnp.asarray(anchors), [10000, 10000], 1)
    np.testing.assert_allclose(np.asarray(rec), boxes, rtol=1e-3, atol=1e-2)


def test_zero_delta_is_identity():
    anchors = rand_boxes(16, seed=3)
    deltas = jnp.zeros((16, 4))
    rec = delta2box(deltas, jnp.asarray(anchors), [10000, 10000], 1)
    np.testing.assert_allclose(np.asarray(rec), anchors, rtol=1e-4, atol=1e-2)


def test_delta2box_clamps():
    anchors = jnp.asarray([[-20.0, -20.0, 20.0, 20.0]])
    deltas = jnp.zeros((1, 4))
    rec = np.asarray(delta2box(deltas, anchors, [10, 10], 8))
    assert rec[0, 0] == 0 and rec[0, 1] == 0
    assert rec[0, 2] == 20 and rec[0, 3] == 20
    big = jnp.asarray([[0.0, 0.0, 3.0, 3.0]])
    rec = np.asarray(delta2box(big, anchors, [10, 10], 8))
    assert rec[0, 2] == 79 and rec[0, 3] == 79  # size*stride - 1


def test_rotated_delta_roundtrip():
    boxes = rand_boxes(32, seed=4)
    theta = np.random.RandomState(5).uniform(-0.7, 0.7, (32, 1)).astype(np.float32)
    boxes6 = np.concatenate([boxes, np.sin(theta), np.cos(theta)], axis=1)
    anchors = rand_boxes(32, seed=6)
    d = box2delta_rotated(jnp.asarray(boxes6), jnp.asarray(anchors))
    rec = delta2box_rotated(d, jnp.asarray(anchors), [10000, 10000], 1)
    np.testing.assert_allclose(np.asarray(rec), boxes6, rtol=1e-3, atol=1e-2)


def test_order_points_canonical():
    quad = np.array([[[5.0, 1.0], [1.0, 1.0], [1.0, 4.0], [5.0, 4.0]]],
                    np.float32)  # tr, tl, bl, br shuffled
    out = np.asarray(order_points(jnp.asarray(quad)))[0]
    np.testing.assert_allclose(
        out, [[1, 1], [5, 1], [5, 4], [1, 4]], atol=1e-5)


def test_rotate_boxes_zero_angle():
    boxes = np.array([[10.0, 20.0, 8.0, 6.0, 0.0]], np.float32)
    axis, rot = rotate_boxes(jnp.asarray(boxes))
    np.testing.assert_allclose(
        np.asarray(axis), [[10, 20, 17, 25, 0, 1]], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rot), [[10, 20, 18, 20, 18, 26, 10, 26]], atol=1e-4)


def test_rotate_boxes_preserves_shape():
    rng = np.random.RandomState(7)
    boxes = np.concatenate([
        rng.uniform(0, 100, (16, 2)), rng.uniform(5, 40, (16, 2)),
        rng.uniform(-1.2, 1.2, (16, 1))], axis=1).astype(np.float32)
    _, rot = rotate_boxes(jnp.asarray(boxes))
    quads = np.asarray(rot).reshape(16, 4, 2)
    # each rotated quad keeps the w x h side lengths and the center
    for q, b in zip(quads, boxes):
        sides = sorted([np.linalg.norm(q[1] - q[0]), np.linalg.norm(q[2] - q[1])])
        np.testing.assert_allclose(sides, sorted(b[2:4]), atol=1e-3)
        np.testing.assert_allclose(q.mean(0), b[:2] + b[2:4] / 2, atol=1e-3)
