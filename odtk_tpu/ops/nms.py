"""Greedy per-class NMS — static-shape sequential-selection formulation.

TPU-native equivalent of csrc/cuda/nms.cu / nms_iou.cu (rotated): the
CUDA path sorts by score and runs a 1024-thread suppression sweep; on
TPU we run ``ndetections`` rounds of (argmax -> record -> suppress)
inside a ``lax.fori_loop``. Each round is O(N) vector work with N fixed
at top_n * levels, so the whole thing stays static-shape and fuses into
the inference graph. Greedy-by-score semantics are identical: a
suppressed candidate (score zeroed) can never suppress others, matching
nms.cu:52 (``scores[m] > 0`` guard).

Inputs use the zero-score-is-empty convention shared with decode.
"""

import jax
import jax.numpy as jnp

from .iou_rotated import quad_iou_one_vs_all, sincos_box_corners


def _axis_iou_one_vs_all(box, boxes):
    """IoU of one (x1,y1,x2,y2) box vs [N, 4], +1 convention (nms.cu:60-69)."""
    xy1 = jnp.maximum(boxes[:, 0:2], box[0:2])
    xy2 = jnp.minimum(boxes[:, 2:4], box[2:4])
    inter = jnp.prod(jnp.clip(xy2 - xy1 + 1, 0), axis=1)
    area = jnp.prod(boxes[:, 2:4] - boxes[:, 0:2] + 1, axis=1)
    area_m = jnp.prod(box[2:4] - box[0:2] + 1)
    return inter / (area + area_m - inter)


def _rotated_iou_one_vs_all(box, boxes):
    """Polygon IoU of one (x1,y1,x2,y2,sin,cos) box vs [N, 6].

    Subject polygons are the candidates (i-boxes), clipped against the
    selected m-box — same orientation as nms_iou.cu:171-251; uses the
    plane-parallel clipper ([N]-wide elementwise, no tiny matmuls).
    """
    corners = sincos_box_corners(boxes)                     # [N, 8]
    m_corner = sincos_box_corners(box[None, :])[0]          # [8]
    return quad_iou_one_vs_all(corners, m_corner)


def _nms_single(scores, boxes, classes, nms_thresh, ndetections, iou_fn, nb):
    n = scores.shape[0]

    def round_fn(i, state):
        live, out_s, out_b, out_c = state
        m = jnp.argmax(live)
        s = live[m]
        picked = s > 0.0

        out_s = out_s.at[i].set(jnp.where(picked, s, 0.0))
        out_b = out_b.at[i].set(jnp.where(picked, boxes[m], 0.0))
        out_c = out_c.at[i].set(jnp.where(picked, classes[m], 0.0))

        iou = iou_fn(boxes[m], boxes)
        suppress = (iou > nms_thresh) & (classes == classes[m])
        suppress = suppress.at[m].set(True)                 # consume selection
        live = jnp.where(picked & suppress, 0.0, live)
        return live, out_s, out_b, out_c

    init = (scores,
            jnp.zeros((ndetections,), jnp.float32),
            jnp.zeros((ndetections, nb), jnp.float32),
            jnp.zeros((ndetections,), jnp.float32))
    _, out_s, out_b, out_c = jax.lax.fori_loop(0, ndetections, round_fn, init)
    return out_s, out_b, out_c


def _tpu_backend():
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except RuntimeError:
        return False


def nms(all_scores, all_boxes, all_classes, nms_thresh=0.5, ndetections=100,
        use_pallas=None):
    """Batched axis-aligned NMS.

    all_scores [B, N], all_boxes [B, N, 4], all_classes [B, N] ->
    (scores [B, D], boxes [B, D, 4], classes [B, D]), score-descending,
    zero-padded (csrc/cuda/nms.cu:82-160 contract).

    Dispatches to the Pallas VMEM-resident kernel on TPU (the fast path,
    like box.py:315-317 dispatching to CUDA); the jnp formulation below
    is the portable reference twin.
    """
    if use_pallas is None:
        use_pallas = _tpu_backend() and ndetections <= 128
    if use_pallas:
        from .pallas import nms_pallas
        return nms_pallas(all_scores, all_boxes, all_classes, nms_thresh,
                          ndetections)
    fn = lambda s, b, c: _nms_single(
        s.astype(jnp.float32), b.astype(jnp.float32), c.astype(jnp.float32),
        nms_thresh, ndetections, _axis_iou_one_vs_all, 4)
    return jax.vmap(fn)(all_scores, all_boxes, all_classes)


def nms_rotated(all_scores, all_boxes, all_classes, nms_thresh=0.5,
                ndetections=100, use_pallas=None):
    """Batched rotated NMS over (x1,y1,x2,y2,sin,cos) boxes
    (csrc/cuda/nms_iou.cu:260-322 contract).

    On TPU, dispatches to the VMEM-resident Pallas kernel
    (pallas/nms_rotated_kernel.py) — the jnp fori_loop form below
    dispatches the ~1.4k-op polygon clip as hundreds of tiny XLA
    kernels per selection round (~5.8 ms at 5000 candidates on v5e vs
    ~0.1 ms in-kernel); both share _soa_clip_iou so IoU is identical.
    """
    if use_pallas is None:
        use_pallas = _tpu_backend() and ndetections <= 128
    if use_pallas:
        from .pallas import nms_rotated_pallas
        return nms_rotated_pallas(all_scores, all_boxes, all_classes,
                                  nms_thresh, ndetections)
    fn = lambda s, b, c: _nms_single(
        s.astype(jnp.float32), b.astype(jnp.float32), c.astype(jnp.float32),
        nms_thresh, ndetections, _rotated_iou_one_vs_all, 6)
    return jax.vmap(fn)(all_scores, all_boxes, all_classes)
