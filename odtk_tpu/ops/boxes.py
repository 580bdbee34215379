"""Box codecs (box <-> anchor deltas) and rotated-box geometry.

Pure jnp, fully vectorized, static-shape — usable inside jit and vmap.
Behavioral contract follows the reference (odtk/box.py:67-131 for the
codecs, odtk/utils.py:15-101 for rotated geometry). All box coordinates
use the inclusive-pixel convention: ``w = x2 - x1 + 1``.
"""

import jax.numpy as jnp


def box2delta(boxes, anchors):
    """Encode (x1,y1,x2,y2) boxes as deltas from anchors. [..., 4].

    Matches odtk/box.py:67-78: (dctr/wh, log wh ratio).
    """
    aw = anchors[..., 2:4] - anchors[..., 0:2] + 1
    actr = anchors[..., 0:2] + 0.5 * aw
    bw = boxes[..., 2:4] - boxes[..., 0:2] + 1
    bctr = boxes[..., 0:2] + 0.5 * bw
    return jnp.concatenate([(bctr - actr) / aw, jnp.log(bw / aw)], axis=-1)


def box2delta_planar(boxes, anchors):
    """box2delta with the 4 delta channels stacked on a LEADING axis
    ([4, ...] instead of [..., 4]) — the loss-native planar layout.
    Emitting the planes directly lets XLA realize them as whole-block
    copies; transposing box2delta's channel-minor output after the fact
    profiled 0.54 ms/step at 46 GB/s (4-wide strided relayout) at b=8
    @832 on v5e."""
    return jnp.stack(_delta_planes(boxes, anchors))


def box2delta_rotated_planar(boxes, anchors):
    """box2delta_rotated in the planar layout ([6, ...]); see
    box2delta_planar."""
    return jnp.stack(_delta_planes(boxes, anchors)
                     + [boxes[..., 4], boxes[..., 5]])


def _delta_planes(boxes, anchors):
    # component-wise (no [..., 2] intermediates): each plane is one
    # fused elementwise chain over [N] columns, so the stack writes
    # plane-contiguous output without strided re-slicing
    aw = anchors[..., 2] - anchors[..., 0] + 1
    ah = anchors[..., 3] - anchors[..., 1] + 1
    bw = boxes[..., 2] - boxes[..., 0] + 1
    bh = boxes[..., 3] - boxes[..., 1] + 1
    dx = (boxes[..., 0] + 0.5 * bw - (anchors[..., 0] + 0.5 * aw)) / aw
    dy = (boxes[..., 1] + 0.5 * bh - (anchors[..., 1] + 0.5 * ah)) / ah
    return [dx, dy, jnp.log(bw / aw), jnp.log(bh / ah)]


def box2delta_rotated(boxes, anchors):
    """Encode rotated boxes (x1,y1,x2,y2,sin,cos) vs axis anchors. [..., 6].

    Matches odtk/box.py:81-94: first four channels as box2delta, sin/cos
    pass through.
    """
    aw = anchors[..., 2:4] - anchors[..., 0:2] + 1
    actr = anchors[..., 0:2] + 0.5 * aw
    bw = boxes[..., 2:4] - boxes[..., 0:2] + 1
    bctr = boxes[..., 0:2] + 0.5 * bw
    return jnp.concatenate(
        [(bctr - actr) / aw, jnp.log(bw / aw), boxes[..., 4:6]], axis=-1)


def delta2box(deltas, anchors, size, stride):
    """Decode deltas into clamped (x1,y1,x2,y2) boxes.

    ``size`` is (width, height) in feature cells; clamping is to
    ``[0, size*stride - 1]`` per odtk/box.py:97-111 (and the fused form
    in csrc/cuda/decode.cu:139-155).
    """
    aw = anchors[..., 2:4] - anchors[..., 0:2] + 1
    actr = anchors[..., 0:2] + 0.5 * aw
    pred_ctr = deltas[..., 0:2] * aw + actr
    pred_wh = jnp.exp(deltas[..., 2:4]) * aw
    lim = jnp.asarray(size, deltas.dtype) * stride - 1
    lo = jnp.clip(pred_ctr - 0.5 * pred_wh, 0, lim)
    hi = jnp.clip(pred_ctr + 0.5 * pred_wh - 1, 0, lim)
    return jnp.concatenate([lo, hi], axis=-1)


def delta2box_rotated(deltas, anchors, size, stride):
    """Decode 6-channel rotated deltas into (x1,y1,x2,y2,sin,cos).

    Matches the CUDA fast path (csrc/cuda/decode_rotate.cu:116-167),
    which carries raw sin/cos through — theta is only materialized at
    NMS/eval time via atan2.
    """
    box = delta2box(deltas[..., 0:4], anchors, size, stride)
    return jnp.concatenate([box, deltas[..., 4:6]], axis=-1)


def order_points(pts):
    """Canonicalize 4-corner polygons to (tl, tr, br, bl). pts: [N,4,2].

    Same rule as odtk/utils.py:15-31 — see anchors._order_points_np for
    the host-side twin used at anchor-generation time.
    """
    idx = jnp.argsort(pts[..., 0], axis=-1)
    xs = jnp.take_along_axis(pts, idx[..., None], axis=-2)
    left, right = xs[..., :2, :], xs[..., 2:, :]
    lidx = jnp.argsort(left[..., 1], axis=-1)
    left = jnp.take_along_axis(left, lidx[..., None], axis=-2)
    tl, bl = left[..., 0, :], left[..., 1, :]
    d = jnp.linalg.norm(right - tl[..., None, :], axis=-1)
    ridx = jnp.argsort(-d, axis=-1)
    right = jnp.take_along_axis(right, ridx[..., None], axis=-2)
    br, tr = right[..., 0, :], right[..., 1, :]
    return jnp.stack([tl, tr, br, bl], axis=-2)


def rotate_boxes(boxes, points=False):
    """Expand rotated boxes into (axis-aligned+sincos [N,6], corners [N,8]).

    ``points=False``: boxes are (x, y, w, h, theta) — matches
    odtk/utils.py:33-80 target preprocessing.
    ``points=True``: boxes are (x1, y1, x2, y2, theta) — the NMS-side
    call (odtk/box.py:407).
    Corners are rotated about the box center by R=[[cos,sin],[-sin,cos]]
    and canonicalized with order_points.
    """
    boxes = jnp.asarray(boxes)
    theta = boxes[..., 4]
    c, s = jnp.cos(theta), jnp.sin(theta)

    if points:
        x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    else:
        x1, y1 = boxes[..., 0], boxes[..., 1]
        x2, y2 = x1 + boxes[..., 2], y1 + boxes[..., 3]
        cx, cy = x1 + boxes[..., 2] / 2, y1 + boxes[..., 3] / 2

    # Rotate corners about the center, expanded elementwise
    # (VPU-friendly, exact in fp32 — no MXU bf16).
    #
    # Deliberate divergence from the reference: odtk/utils.py:44-49
    # rotates training polygons by the TRANSPOSE of the rotation its
    # own inference/eval side uses (nms_iou.cu:218-227,
    # utils.py:95-99 rotate_box) — training assignment sees mirrored-
    # theta rectangles. We use the inference/eval convention
    # (x' = c*dx - s*dy) consistently, which measurably improves
    # rotated AP75 on synthetic data.
    xs = jnp.stack([x1, x2, x2, x1], axis=-1) - cx[..., None]
    ys = jnp.stack([y1, y1, y2, y2], axis=-1) - cy[..., None]
    rx = c[..., None] * xs - s[..., None] * ys + cx[..., None]
    ry = s[..., None] * xs + c[..., None] * ys + cy[..., None]
    rotated = order_points(jnp.stack([rx, ry], axis=-1))

    if points:
        axis_hi = jnp.stack([x1 + x2 - 1, y1 + y2 - 1], -1)
    else:
        axis_hi = jnp.stack([x2 - 1, y2 - 1], -1)
    boxes_axis = jnp.concatenate([
        boxes[..., 0:2], axis_hi, s[..., None], c[..., None]], axis=-1)
    return boxes_axis, rotated.reshape(*rotated.shape[:-2], 8)
