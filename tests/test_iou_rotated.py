"""Rotated polygon IoU vs an independent shapely-free numpy clipper."""

import jax
import jax.numpy as jnp
import numpy as np

from odtk_tpu.ops import polygon_iou, rotated_pair_iou
from odtk_tpu.ops.iou_rotated import sincos_box_corners


def np_poly_area(poly):
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def np_clip(subject, clip):
    """Independent Sutherland-Hodgman (list-based) for verification."""
    out = list(subject)
    for i in range(len(clip)):
        v1, v2 = clip[i], clip[(i + 1) % len(clip)]
        a, b = v2[1] - v1[1], v1[0] - v2[0]
        c = v2[0] * v1[1] - v2[1] * v1[0]
        inp, out = out, []
        for j in range(len(inp)):
            p, q = inp[j], inp[(j + 1) % len(inp)]
            fp = a * p[0] + b * p[1] + c
            fq = a * q[0] + b * q[1] + c
            if fp <= 0:
                out.append(p)
            if fp * fq < 0:
                t = fp / (fp - fq)
                out.append((p[0] + t * (q[0] - p[0]), p[1] + t * (q[1] - p[1])))
        if not out:
            return []
    return out


def np_quad_iou(qa, qb):
    inter_poly = np_clip([tuple(p) for p in qa], [tuple(p) for p in qb])
    inter = np_poly_area(np.asarray(inter_poly)) if len(inter_poly) > 2 else 0.0
    union = np_poly_area(qa) + np_poly_area(qb) - inter
    return inter / union


def rot_quad(cx, cy, w, h, theta):
    c, s = np.cos(theta), np.sin(theta)
    pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                    [w / 2, h / 2], [-w / 2, h / 2]])
    rot = pts @ np.array([[c, s], [-s, c]])
    return rot + [cx, cy]


def test_identical_boxes_iou_one():
    q = rot_quad(10, 10, 8, 4, 0.3).astype(np.float32).reshape(1, 8)
    iou = np.asarray(polygon_iou(jnp.asarray(q), jnp.asarray(q)))
    np.testing.assert_allclose(iou, 1.0, atol=5e-3)  # 0.001 pad -> approx 1


def test_disjoint_boxes_iou_zero():
    qa = rot_quad(0, 0, 4, 4, 0.2).astype(np.float32).reshape(1, 8)
    qb = rot_quad(100, 100, 4, 4, -0.4).astype(np.float32).reshape(1, 8)
    iou = np.asarray(polygon_iou(jnp.asarray(qa), jnp.asarray(qb)))
    np.testing.assert_allclose(iou, 0.0, atol=1e-6)


def test_random_quads_match_numpy_reference():
    rng = np.random.RandomState(0)
    n = 40
    quads_a, quads_b, want = [], [], []
    for _ in range(n):
        qa = rot_quad(rng.uniform(0, 30), rng.uniform(0, 30),
                      rng.uniform(4, 20), rng.uniform(4, 20),
                      rng.uniform(-1.5, 1.5))
        qb = rot_quad(rng.uniform(0, 30), rng.uniform(0, 30),
                      rng.uniform(4, 20), rng.uniform(4, 20),
                      rng.uniform(-1.5, 1.5))
        quads_a.append(qa.reshape(8))
        quads_b.append(qb.reshape(8))
        want.append(np_quad_iou(qa, qb))
    got = np.asarray(polygon_iou(jnp.asarray(np.stack(quads_a), jnp.float32),
                                 jnp.asarray(np.stack(quads_b), jnp.float32)))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_pair_matrix_shape_and_symmetry():
    rng = np.random.RandomState(1)
    qa = np.stack([rot_quad(rng.uniform(0, 20), rng.uniform(0, 20), 8, 6,
                            rng.uniform(-1, 1)).reshape(8) for _ in range(5)])
    qb = np.stack([rot_quad(rng.uniform(0, 20), rng.uniform(0, 20), 8, 6,
                            rng.uniform(-1, 1)).reshape(8) for _ in range(3)])
    mat = np.asarray(rotated_pair_iou(jnp.asarray(qa, jnp.float32),
                                      jnp.asarray(qb, jnp.float32)))
    assert mat.shape == (5, 3)
    mat_t = np.asarray(rotated_pair_iou(jnp.asarray(qb, jnp.float32),
                                        jnp.asarray(qa, jnp.float32)))
    np.testing.assert_allclose(mat, mat_t.T, atol=5e-3)


def test_sincos_corner_construction():
    # zero rotation: corners are the rect corners in (tl, tr, br, bl) order
    box = jnp.asarray([[2.0, 3.0, 10.0, 7.0, 0.0, 1.0]])
    got = np.asarray(sincos_box_corners(box))[0]
    np.testing.assert_allclose(got, [2, 3, 10, 3, 10, 7, 2, 7], atol=1e-5)


def test_batched_best_match_chunk_invariance():
    # The chunked stream must give identical results for any chunk
    # width, including widths that do not divide the packed B*M length
    # (the last window is padded, never start-clamped).
    from odtk_tpu.ops.iou_rotated import rotated_best_match_batched
    rng = np.random.RandomState(11)
    bsz, m, n = 3, 7, 40
    subs = np.stack([rot_quad(rng.uniform(0, 40), rng.uniform(0, 40),
                              rng.uniform(5, 20), rng.uniform(5, 20),
                              rng.uniform(-1.4, 1.4)).reshape(8)
                     for _ in range(n)]).astype(np.float32)
    clips = np.stack([rot_quad(rng.uniform(0, 40), rng.uniform(0, 40),
                               rng.uniform(5, 20), rng.uniform(5, 20),
                               rng.uniform(-1.4, 1.4)).reshape(8)
                      for _ in range(bsz * m)]).astype(np.float32)
    clips = clips.reshape(bsz, m, 8)
    valid = np.ones((bsz, m), bool)       # n_act = 21: 5 and 8 don't divide
    outs = {}
    for chunk in (5, 8, 21):
        iou, slot = jax.tree.map(np.asarray, rotated_best_match_batched(
            jnp.asarray(subs), jnp.asarray(clips), jnp.asarray(valid),
            chunk=chunk))
        outs[chunk] = (iou, slot)
    for chunk in (8, 21):
        np.testing.assert_allclose(outs[chunk][0], outs[5][0], atol=1e-6)
        np.testing.assert_array_equal(outs[chunk][1], outs[5][1])


def test_best_match_agrees_with_pair_matrix():
    from odtk_tpu.ops.iou_rotated import rotated_best_match
    rng = np.random.RandomState(4)
    subs = np.stack([rot_quad(rng.uniform(0, 40), rng.uniform(0, 40),
                              rng.uniform(5, 20), rng.uniform(5, 20),
                              rng.uniform(-1.4, 1.4)).reshape(8)
                     for _ in range(60)]).astype(np.float32)
    clips = np.stack([rot_quad(rng.uniform(0, 40), rng.uniform(0, 40),
                               rng.uniform(5, 20), rng.uniform(5, 20),
                               rng.uniform(-1.4, 1.4)).reshape(8)
                      for _ in range(7)]).astype(np.float32)
    valid = np.array([1, 1, 1, 0, 1, 1, 0], bool)
    mat = np.asarray(rotated_pair_iou(jnp.asarray(subs), jnp.asarray(clips)))
    mat = np.where(valid[None, :], mat, -1.0)
    want_iou = mat.max(1)
    want_idx = mat.argmax(1)
    got_iou, got_idx = jax.tree.map(np.asarray, rotated_best_match(
        jnp.asarray(subs), jnp.asarray(clips), jnp.asarray(valid)))
    np.testing.assert_allclose(got_iou, want_iou, atol=5e-3)
    # indices may differ only where IoUs tie within tolerance
    diff = got_idx != want_idx
    if diff.any():
        np.testing.assert_allclose(mat[np.arange(60), got_idx][diff],
                                   want_iou[diff], atol=5e-3)

