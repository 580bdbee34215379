"""Pallas kernel parity tests (interpreter mode on CPU).

Mirrors the reference's dual-implementation testing seam (SURVEY.md §4):
each Pallas kernel must match its jnp reference twin box-for-box.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import jax.experimental.pallas as pl


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Force pallas_call into interpreter mode (no TPU in CI)."""
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs['interpret'] = True
        return orig(*args, **kwargs)

    import odtk_tpu.ops.pallas.nms_kernel as nk
    monkeypatch.setattr(nk.pl, 'pallas_call', patched)
    yield


def _random_case(b, n, classes=10, seed=0):
    rng = np.random.RandomState(seed)
    scores = np.where(rng.rand(b, n) > 0.7, rng.rand(b, n), 0).astype(
        np.float32)
    xy = rng.uniform(0, 700, (b, n, 2))
    wh = rng.uniform(5, 120, (b, n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    cls = rng.randint(0, classes, (b, n)).astype(np.float32)
    return scores, boxes, cls


def test_pallas_nms_matches_reference(interpret_pallas):
    from odtk_tpu.ops import nms
    from odtk_tpu.ops.pallas import nms_pallas
    scores, boxes, cls = _random_case(2, 500)
    ref = jax.tree.map(np.asarray, nms(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(cls),
        0.5, 50, use_pallas=False))
    got = jax.tree.map(np.asarray, nms_pallas(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(cls), 0.5, 50))
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], atol=1e-4)
    np.testing.assert_allclose(got[2], ref[2], atol=1e-6)


def test_pallas_nms_empty(interpret_pallas):
    from odtk_tpu.ops.pallas import nms_pallas
    s, b, c = (jnp.zeros((1, 256)), jnp.zeros((1, 256, 4)),
               jnp.zeros((1, 256)))
    out = jax.tree.map(np.asarray, nms_pallas(s, b, c, 0.5, 20))
    assert all((o == 0).all() for o in out)


def test_pallas_nms_nonaligned_n(interpret_pallas):
    """N not a multiple of 128 must pad correctly."""
    from odtk_tpu.ops import nms
    from odtk_tpu.ops.pallas import nms_pallas
    scores, boxes, cls = _random_case(1, 333, seed=3)
    ref = jax.tree.map(np.asarray, nms(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(cls),
        0.5, 30, use_pallas=False))
    got = jax.tree.map(np.asarray, nms_pallas(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(cls), 0.5, 30))
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)


def _random_rotated_case(b, n, classes=5, seed=7):
    rng = np.random.RandomState(seed)
    scores = np.where(rng.rand(b, n) > 0.7, rng.rand(b, n), 0).astype(
        np.float32)
    xy = rng.uniform(0, 600, (b, n, 2))
    wh = rng.uniform(8, 100, (b, n, 2))
    theta = rng.uniform(-0.8, 0.8, (b, n, 1))
    boxes = np.concatenate([xy, xy + wh, np.sin(theta), np.cos(theta)],
                           -1).astype(np.float32)
    cls = rng.randint(0, classes, (b, n)).astype(np.float32)
    return scores, boxes, cls


def test_pallas_nms_rotated_matches_reference():
    from odtk_tpu.ops import nms_rotated
    from odtk_tpu.ops.pallas import nms_rotated_pallas
    scores, boxes, cls = _random_rotated_case(2, 300)
    ref = jax.tree.map(np.asarray, nms_rotated(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(cls),
        0.5, 30, use_pallas=False))
    got = jax.tree.map(np.asarray, nms_rotated_pallas(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(cls),
        0.5, 30, interpret=True))
    np.testing.assert_allclose(got[0], ref[0], atol=1e-5)
    np.testing.assert_allclose(got[1], ref[1], atol=1e-4)
    np.testing.assert_allclose(got[2], ref[2], atol=1e-6)


def test_pallas_nms_rotated_empty():
    from odtk_tpu.ops.pallas import nms_rotated_pallas
    s, b, c = (jnp.zeros((1, 256)), jnp.zeros((1, 256, 6)),
               jnp.zeros((1, 256)))
    out = jax.tree.map(np.asarray, nms_rotated_pallas(
        s, b, c, 0.5, 20, interpret=True))
    assert all((o == 0).all() for o in out)


def test_nms_rotated_large_ndetections_uses_jnp_path(monkeypatch):
    """ndetections > 128 exceeds the kernel's one-lane-vector output;
    the dispatcher must fall back to the jnp twin, never the kernel."""
    import importlib
    nms_mod = importlib.import_module('odtk_tpu.ops.nms')

    def boom(*a, **k):
        raise AssertionError('pallas kernel must not be selected')

    monkeypatch.setattr('odtk_tpu.ops.pallas.nms_rotated_pallas', boom)
    monkeypatch.setattr(nms_mod, '_tpu_backend', lambda: True)
    scores, boxes, cls = _random_rotated_case(1, 300)
    out = nms_mod.nms_rotated(jnp.asarray(scores), jnp.asarray(boxes),
                              jnp.asarray(cls), 0.5, 200)
    assert out[0].shape == (1, 200)


def test_pallas_rotated_best_match_matches_reference(monkeypatch):
    """Interpret-mode parity of the Pallas polygon-IoU best-match kernel
    against the jnp plane-parallel reference."""
    from odtk_tpu.ops.iou_rotated import rotated_best_match
    from odtk_tpu.ops.pallas.iou_kernel import rotated_best_match_pallas

    rng = np.random.RandomState(2)
    n, m = 500, 9

    def quad(cx, cy, w, h, th):
        c, s = np.cos(th), np.sin(th)
        pts = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        return (pts @ np.array([[c, s], [-s, c]]) + [cx, cy]).reshape(8)

    subs = np.stack([quad(rng.uniform(0, 80), rng.uniform(0, 80),
                          rng.uniform(5, 30), rng.uniform(5, 30),
                          rng.uniform(-1.2, 1.2)) for _ in range(n)]
                    ).astype(np.float32)
    clips = np.stack([quad(rng.uniform(0, 80), rng.uniform(0, 80),
                           rng.uniform(5, 30), rng.uniform(5, 30),
                           rng.uniform(-1.2, 1.2)) for _ in range(m)]
                     ).astype(np.float32)
    valid = np.array([1, 1, 0, 1, 1, 1, 0, 1, 1], bool)

    ri, rx = jax.tree.map(np.asarray, rotated_best_match(
        jnp.asarray(subs), jnp.asarray(clips), jnp.asarray(valid)))
    pi, px = jax.tree.map(np.asarray, rotated_best_match_pallas(
        jnp.asarray(subs), jnp.asarray(clips), jnp.asarray(valid),
        interpret=True))
    # identical where any box was considered; fully-rejected anchors
    # keep the -2 sentinel (documented, classification-equivalent)
    considered = pi > -1.5
    np.testing.assert_allclose(pi[considered], ri[considered], atol=1e-5)
    assert (px[considered] == rx[considered]).all()
    assert (ri[~considered] <= 0.0).all()


def _focal_dense_reference(head, cls_idx, depth, classes):
    """Dense one-hot focal sum — the jnp twin the kernel must match."""
    from odtk_tpu.ops import focal_loss
    b = head.shape[0]
    logits = jnp.reshape(head, (b, -1, classes))
    onehot = (cls_idx[..., None] == jnp.arange(classes)).astype(
        jnp.float32) * (depth[..., None] > 0)
    valid = (depth >= 0)[..., None]
    return (focal_loss(logits, onehot) * valid).sum()


def _focal_case(seed=0, b=2, h=4, w=4, a=3, k=7):
    rng = np.random.RandomState(seed)
    head = jnp.asarray(rng.randn(b, h, w, a * k) * 3, jnp.float32)
    n = h * w * a
    cls_idx = jnp.asarray(rng.randint(0, k, (b, n)), jnp.float32)
    depth = jnp.asarray(
        rng.choice([-1.0, 0.0, 2.0], (b, n), p=[0.2, 0.6, 0.2]),
        jnp.float32)
    return head, cls_idx, depth, k


def test_fused_focal_forward_matches_dense():
    from odtk_tpu.ops.pallas import focal_sum_fused
    head, cls_idx, depth, k = _focal_case()
    got = focal_sum_fused(head, cls_idx, depth, classes=k, interpret=True)
    want = _focal_dense_reference(head, cls_idx, depth, k)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_fused_focal_grad_matches_dense():
    from odtk_tpu.ops.pallas import focal_sum_fused
    head, cls_idx, depth, k = _focal_case(seed=3)

    g_fused = jax.grad(lambda x: focal_sum_fused(
        x, cls_idx, depth, classes=k, interpret=True) * 0.37)(head)
    g_dense = jax.grad(lambda x: _focal_dense_reference(
        x, cls_idx, depth, k) * 0.37)(head)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-6)


def test_fused_focal_shard_map_matches_dense():
    """The mesh>1 branch (shard_map over the data axis + psum) must
    match the dense twin — it only runs on real multi-chip TPU meshes,
    so this is its one test seam (8 virtual CPU devices, interpret)."""
    from jax.sharding import Mesh
    from odtk_tpu.ops.pallas import focal_sum_fused
    head, cls_idx, depth, k = _focal_case(seed=7, b=8, h=4, w=4, a=3, k=7)
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    got = focal_sum_fused(head, cls_idx, depth, classes=k, mesh=mesh,
                          interpret=True)
    want = _focal_dense_reference(head, cls_idx, depth, k)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_fused_focal_nondivisible_rows_padded():
    # b*h*w = 6 rows -> not a multiple of any block; exercises padding
    from odtk_tpu.ops.pallas import focal_sum_fused
    head, cls_idx, depth, k = _focal_case(seed=5, b=1, h=2, w=3, a=2, k=5)
    got = focal_sum_fused(head, cls_idx, depth, classes=k, interpret=True)
    want = _focal_dense_reference(head, cls_idx, depth, k)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _joint_case(seed=0, b=2, h=4, w=4, a=3, k=7, d=4):
    head, cls_idx, depth, _ = _focal_case(seed=seed, b=b, h=h, w=w, a=a, k=k)
    rng = np.random.RandomState(seed + 100)
    n = h * w * a
    box_head = jnp.asarray(rng.randn(b, h, w, a * d) * 0.3, jnp.float32)
    box_t = jnp.asarray(rng.randn(b, n, d) * 0.3, jnp.float32)
    return head, box_head, cls_idx, box_t, depth, k


def _smooth_l1_dense_reference(box_head, box_t, depth, d):
    from odtk_tpu.ops import smooth_l1_loss
    b = box_head.shape[0]
    box_p = jnp.reshape(box_head, (b, -1, d))
    fg = (depth > 0)[..., None]
    return (smooth_l1_loss(box_p, box_t) * fg).sum()


def test_joint_loss_forward_matches_dense():
    from odtk_tpu.ops.pallas import detection_loss_sums_fused
    head, box_head, cls_idx, box_t, depth, k = _joint_case()
    c, bx = detection_loss_sums_fused(head, box_head, cls_idx, box_t,
                                      depth, classes=k, interpret=True)
    np.testing.assert_allclose(
        float(c), float(_focal_dense_reference(head, cls_idx, depth, k)),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(bx), float(_smooth_l1_dense_reference(box_head, box_t,
                                                    depth, 4)), rtol=1e-5)


def test_joint_loss_grads_match_dense():
    """Both cotangents flow: grads w.r.t. cls head AND box head, with
    distinct upstream weights on the two sums (rules out a swapped or
    shared g in the backward kernel)."""
    from odtk_tpu.ops.pallas import detection_loss_sums_fused
    head, box_head, cls_idx, box_t, depth, k = _joint_case(seed=3)

    def fused(x, bxh):
        c, bx = detection_loss_sums_fused(x, bxh, cls_idx, box_t, depth,
                                          classes=k, interpret=True)
        return 0.37 * c + 1.91 * bx

    def dense(x, bxh):
        return (0.37 * _focal_dense_reference(x, cls_idx, depth, k)
                + 1.91 * _smooth_l1_dense_reference(bxh, box_t, depth, 4))

    gf = jax.grad(fused, argnums=(0, 1))(head, box_head)
    gd = jax.grad(dense, argnums=(0, 1))(head, box_head)
    for a_, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_joint_loss_rotated_dims_and_padding():
    # box_dim=6 (rotated) + non-divisible rows
    from odtk_tpu.ops.pallas import detection_loss_sums_fused
    head, box_head, cls_idx, box_t, depth, k = _joint_case(
        seed=5, b=1, h=2, w=3, a=2, k=5, d=6)
    c, bx = detection_loss_sums_fused(head, box_head, cls_idx, box_t,
                                      depth, classes=k, interpret=True)
    np.testing.assert_allclose(
        float(c), float(_focal_dense_reference(head, cls_idx, depth, k)),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(bx), float(_smooth_l1_dense_reference(box_head, box_t,
                                                    depth, 6)), rtol=1e-5)


def test_joint_loss_planar_bt_matches_interleaved():
    """The planar [D, B, HW, A] box-target form (the assignment's
    free-bitcast layout; kernel interleaves in VMEM via MXU expanders)
    gives the same sums and gradients as the interleaved [B, N, D]."""
    from odtk_tpu.ops.pallas import detection_loss_sums_fused
    head, box_head, cls_idx, box_t, depth, k = _joint_case(seed=11)
    b, h, w, _ = head.shape
    a, d = 3, 4
    # [B, N, D] -> [D, B, HW, A]: N is (h, w, a)-ordered
    planar = jnp.transpose(
        box_t.reshape(b, h * w, a, d), (3, 0, 1, 2))

    def loss(fn_bt, x, bxh):
        c, bx = detection_loss_sums_fused(x, bxh, cls_idx, fn_bt, depth,
                                          classes=k, interpret=True)
        return 0.7 * c + 1.3 * bx

    want = loss(box_t, head, box_head)
    got = loss(planar, head, box_head)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    gw = jax.grad(lambda x, y: loss(box_t, x, y), argnums=(0, 1))(
        head, box_head)
    gg = jax.grad(lambda x, y: loss(planar, x, y), argnums=(0, 1))(
        head, box_head)
    for a_, b_ in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)


def test_joint_loss_planar_bt_shard_map():
    from jax.sharding import Mesh
    from odtk_tpu.ops.pallas import detection_loss_sums_fused
    head, box_head, cls_idx, box_t, depth, k = _joint_case(seed=13, b=8)
    b, h, w, _ = head.shape
    planar = jnp.transpose(box_t.reshape(b, h * w, 3, 4), (3, 0, 1, 2))
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    c, bx = detection_loss_sums_fused(head, box_head, cls_idx, planar,
                                      depth, classes=k, mesh=mesh,
                                      interpret=True)
    np.testing.assert_allclose(
        float(c), float(_focal_dense_reference(head, cls_idx, depth, k)),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(bx), float(_smooth_l1_dense_reference(box_head, box_t,
                                                    depth, 4)), rtol=1e-5)


def test_joint_loss_shard_map_matches_dense():
    from jax.sharding import Mesh
    from odtk_tpu.ops.pallas import detection_loss_sums_fused
    head, box_head, cls_idx, box_t, depth, k = _joint_case(seed=7, b=8)
    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    c, bx = detection_loss_sums_fused(head, box_head, cls_idx, box_t,
                                      depth, classes=k, mesh=mesh,
                                      interpret=True)
    np.testing.assert_allclose(
        float(c), float(_focal_dense_reference(head, cls_idx, depth, k)),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(bx), float(_smooth_l1_dense_reference(box_head, box_t,
                                                    depth, 4)), rtol=1e-5)


def test_pallas_batched_match_matches_stream():
    """The one-launch batched matcher (packed actives + tile-AABB skip)
    agrees with the chunk-streaming jnp path on every anchor either one
    considered; anchors only the kernel rejected (tile AABB miss) keep
    the -2 sentinel, which is classification-equivalent (IoU would be
    exactly 0 there: disjoint AABBs => disjoint polygons)."""
    from odtk_tpu.ops.iou_rotated import rotated_best_match_batched

    rng = np.random.RandomState(5)
    b, n, m = 3, 700, 12

    def quad(cx, cy, w, h, th):
        c, s = np.cos(th), np.sin(th)
        pts = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        return (pts @ np.array([[c, s], [-s, c]]) + [cx, cy]).reshape(8)

    subs = np.stack([quad(rng.uniform(0, 120), rng.uniform(0, 120),
                          rng.uniform(4, 25), rng.uniform(4, 25),
                          rng.uniform(-1.2, 1.2)) for _ in range(n)]
                    ).astype(np.float32)
    clips = np.stack([quad(rng.uniform(0, 120), rng.uniform(0, 120),
                           rng.uniform(4, 40), rng.uniform(4, 40),
                           rng.uniform(-1.2, 1.2))
                      for _ in range(b * m)]).reshape(b, m, 8) \
        .astype(np.float32)
    valid = rng.rand(b, m) > 0.3
    payload = rng.randn(b, m, 5).astype(np.float32)

    import jax.experimental.pallas as pl_mod
    orig = pl_mod.pallas_call

    def interp(*a, **kw):
        kw['interpret'] = True
        return orig(*a, **kw)

    ri, rp = jax.tree.map(np.asarray, rotated_best_match_batched(
        jnp.asarray(subs), jnp.asarray(clips), jnp.asarray(valid),
        skip_ratio=0.4, payload=jnp.asarray(payload), use_pallas=False))
    try:
        pl_mod.pallas_call = interp
        import odtk_tpu.ops.pallas.match_rotated_kernel as mk
        mk.pl.pallas_call = interp
        pi, pp = jax.tree.map(np.asarray, rotated_best_match_batched(
            jnp.asarray(subs), jnp.asarray(clips), jnp.asarray(valid),
            skip_ratio=0.4, payload=jnp.asarray(payload), use_pallas=True))
    finally:
        pl_mod.pallas_call = orig
        mk.pl.pallas_call = orig

    considered = pi > -1.5
    assert considered.any()
    np.testing.assert_allclose(pi[considered], ri[considered], atol=1e-5)
    np.testing.assert_allclose(pp[considered], rp[considered], atol=1e-5)
    # kernel-rejected anchors: the stream saw IoU <= 0 there (background
    # either way)
    assert (ri[~considered] <= 1e-6).all()


def test_pallas_batched_match_empty_and_full():
    """Zero active targets leaves every anchor at the sentinel."""
    from odtk_tpu.ops.iou_rotated import rotated_best_match_batched

    import odtk_tpu.ops.pallas.match_rotated_kernel as mk
    orig = mk.pl.pallas_call

    def interp(*a, **kw):
        kw['interpret'] = True
        return orig(*a, **kw)

    rng = np.random.RandomState(7)

    def quad(cx, cy, w, h, th):
        c, s = np.cos(th), np.sin(th)
        pts = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
        return (pts @ np.array([[c, s], [-s, c]]) + [cx, cy]).reshape(8)

    quads = np.stack([quad(rng.uniform(0, 60), rng.uniform(0, 60),
                           rng.uniform(5, 20), rng.uniform(5, 20),
                           rng.uniform(-1, 1)) for _ in range(8)]
                     ).reshape(2, 4, 8).astype(np.float32)
    subs = quads.reshape(-1, 8)[:6]

    try:
        mk.pl.pallas_call = interp
        none_iou, none_slot = jax.tree.map(
            np.asarray, rotated_best_match_batched(
                jnp.asarray(subs), jnp.asarray(quads),
                jnp.zeros((2, 4), bool), use_pallas=True))
    finally:
        mk.pl.pallas_call = orig
    assert (none_iou == -2.0).all() and (none_slot == 0).all()
