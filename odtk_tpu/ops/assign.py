"""Anchor target assignment (``snap_to_anchors``), batched and static-shape.

TPU-first redesign of odtk/box.py:134-252 + odtk/model.py:167-184: the
reference loops per image in Python and early-exits on empty targets;
here assignment is one fused jnp computation over a fixed-size padded
target tensor, vmappable over the batch, so it lives inside the jitted
train step (no host sync, no recompilation).

Target tensor convention (same as the reference collate, data.py:158-161):
``targets[max_det, 5]`` rows ``(x, y, w, h, class)`` (or ``[max_det, 6]``
``(x, y, w, h, theta, class)`` for rotated), padded with -1 rows.

Depth semantics (odtk/box.py:169-172):
  -1 = ignore (lo <= IoU < hi), 0 = background (IoU < lo),
  c+1 = object of class c (IoU >= hi).

Output layout is feature-cell major: cls [H, W, A, K], box [H, W, A, 4|6],
depth [H, W, A]. The reference uses [A, C, H, W] (NCHW); NHWC is the
natural TPU layout and the heads produce matching [H, W, A*K] channels
(anchor-major, class-minor — same channel semantics as the reference
convs, model.py:64-68).

One deliberate divergence: for *ignored* anchors the reference leaves
the best-box one-hot in cls_target (odtk/box.py:175-185) but masks it
out of the loss (model.py:196-198); we emit zeros there instead.
Loss-equivalent, simpler.
"""

import jax.numpy as jnp

from .boxes import (box2delta, box2delta_planar, box2delta_rotated,
                    box2delta_rotated_planar, rotate_boxes)
from .iou_rotated import rotated_best_match, rotated_best_match_batched


def _cell_xy(width, height, stride, dtype):
    """Top-left pixel coordinate of each feature cell: [H, W, 2]."""
    x = jnp.arange(width, dtype=dtype) * stride
    y = jnp.arange(height, dtype=dtype) * stride
    return jnp.stack(jnp.meshgrid(x, y, indexing='xy'), axis=-1)


def _axis_iou(anchors, boxes):
    """IoU matrix [N, M] with the inclusive +1 pixel convention
    (odtk/box.py:153-160)."""
    xy1 = jnp.maximum(anchors[:, None, :2], boxes[None, :, :2])
    xy2 = jnp.minimum(anchors[:, None, 2:4], boxes[None, :, 2:4])
    inter = jnp.prod(jnp.clip(xy2 - xy1 + 1, 0), axis=2)
    area_a = jnp.prod(anchors[:, 2:4] - anchors[:, :2] + 1, axis=1)
    area_b = jnp.prod(boxes[:, 2:4] - boxes[:, :2] + 1, axis=1)
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _one_hot(idx, num_classes):
    idx = idx.astype(jnp.int32)
    return (idx[..., None]
            == jnp.arange(num_classes)).astype(jnp.float32)


def _finalize(best_iou, best_cls, deltas, num_classes, anchor_ious,
              height, width, num_anchors, one_hot_cls, flat=False):
    """Depth/cls/box maps from best matches. Accepts [..., N] inputs
    (optional leading batch dims); the anchor axis unflattens to
    (H, W, A) — unless ``flat=True``, which returns the fused-loss
    form: cls/depth [*, H*W, A] (the NHWC head's memory order —
    [B, H, W, A*K] -> [BHW, A*K] is a bitcast; channels are
    anchor-major) and deltas PLANAR [nb, *, H*W, A] (``deltas`` must
    then arrive planar [nb, *, N], from the box2delta_*planar
    encoders). The [H, W, A, K]
    form costs ~4 ms/step of physical transposes at 832 px on v5e;
    the earlier interleaved [*, HW, A*nb] delta form left a ~1.25
    ms/step [B,N,nb] relayout copy in front of the loss kernel
    (profiled r3) because box2delta's output is physically planar."""
    lead = best_iou.shape[:-1]
    lo, hi = anchor_ious
    nb = deltas.shape[0] if flat else deltas.shape[-1]
    depth = jnp.full_like(best_iou, -1.0)
    depth = jnp.where(best_iou < lo, 0.0, depth)
    depth = jnp.where(best_iou >= hi, best_cls + 1.0, depth)

    if one_hot_cls:
        fg = (best_iou >= hi).astype(jnp.float32)
        cls_target = _one_hot(best_cls, num_classes) * fg[..., None]
    else:
        # index form: the dense one-hot [*, K] never materializes — the
        # fused focal loss in Model.loss_fn gathers the fg-class logit
        # instead (big bandwidth win at K=80 with ~100k anchors)
        cls_target = jnp.clip(best_cls, 0, num_classes - 1).astype(
            jnp.int32)

    if flat:
        hw = height * width
        if not one_hot_cls:
            cls_target = cls_target.reshape(*lead, hw, num_anchors)
        # Planar deltas [nb, *lead, HW, A]: the flat path receives them
        # ALREADY planar ([nb, *lead, N], from box2delta_planar — the
        # channels are emitted as whole planes, never channel-minor).
        # Reshaping to the interleaved [*, HW, A*nb] head order costs a
        # profiled ~1.25 ms/step relayout copy at 832 px, and even the
        # nb-minor -> nb-leading moveaxis of box2delta's output was a
        # 0.54 ms/step 46 GB/s strided relayout — the fused loss kernel
        # re-interleaves in VMEM instead (focal_kernel._loss_fwd_kernel).
        planar = deltas.reshape(nb, *lead, hw, num_anchors)
        return (cls_target, planar,
                depth.reshape(*lead, hw, num_anchors))
    grid = (height, width, num_anchors)
    if one_hot_cls:
        cls_target = cls_target.reshape(*lead, *grid, num_classes)
    else:
        cls_target = cls_target.reshape(*lead, *grid)
    return (cls_target,
            deltas.reshape(*lead, *grid, nb),
            depth.reshape(*lead, *grid))


def snap_to_anchors(targets, size, stride, anchor_table, num_classes,
                    anchor_ious=(0.4, 0.5), one_hot_cls=True, flat=False):
    """Assign padded targets [max_det, 5] to anchors of one FPN level.

    size: (width, height) of the level in pixels (cells * stride).
    Returns (cls [H,W,A,K] one-hot — or [H,W,A] int32 class indices
    with one_hot_cls=False — box_deltas [H,W,A,4], depth [H,W,A]).
    """
    width = int(size[0]) // int(stride)
    height = int(size[1]) // int(stride)
    table = jnp.asarray(anchor_table, targets.dtype)
    num_anchors = table.shape[0]

    classes = targets[:, 4]
    valid = classes > -1
    # (x, y, w, h) -> inclusive (x1, y1, x2, y2); clamp wh so padded
    # (-1-filled) rows stay finite through log in box2delta
    wh = jnp.maximum(targets[:, 2:4], 1e-4)
    boxes = jnp.concatenate([targets[:, 0:2], targets[:, 0:2] + wh - 1], axis=1)

    cell = _cell_xy(width, height, stride, targets.dtype)          # [H,W,2]
    anchors = (jnp.concatenate([cell, cell], -1)[:, :, None, :]
               + table).reshape(-1, 4)

    overlap = jnp.where(valid[None, :], _axis_iou(anchors, boxes), -1.0)
    # argmax + take_along_axis + boxes[best] lower to batched-gather
    # custom calls that cost ~20 ms/step at N~100k under vmap (profiled
    # on v5e); a first-max one-hot contracted over the tiny M axis is
    # the same result as pure elementwise + matmul. min-of-iota keeps
    # argmax's first-hit tie-break in two passes over [N, M] (a cumsum
    # lowers to several).
    m = overlap.shape[1]
    best_iou = jnp.max(overlap, axis=1)
    is_max = overlap == best_iou[:, None]
    cols = jnp.arange(m, dtype=jnp.int32)
    first = jnp.min(jnp.where(is_max, cols, m), axis=1)         # [N]
    onehot = (cols == first[:, None]).astype(overlap.dtype)     # [N, M]
    best_cls = onehot @ classes
    encode = box2delta_planar if flat else box2delta
    deltas = encode(onehot @ boxes, anchors)
    return _finalize(best_iou, best_cls, deltas, num_classes,
                     anchor_ious, height, width, num_anchors, one_hot_cls,
                     flat)


def snap_to_anchors_rotated(targets, size, stride, anchor_table,
                            num_classes, anchor_ious=(0.4, 0.5),
                            one_hot_cls=True, flat=False):
    """Rotated assignment: targets [max_det, 6] = (x, y, w, h, theta, cls).

    anchor_table: (axis [A,4], corners [A,8]) pair from
    generate_anchors_rotated. Overlap uses polygon IoU between rotated
    anchor corners and rotated target corners (odtk/box.py:192-252);
    regression targets are 6-channel (dx, dy, dlogw, dlogh, sin, cos)
    vs the *axis-aligned* anchor (odtk/box.py:227).
    Returns (cls [H,W,A,K], box_deltas [H,W,A,6], depth [H,W,A]).
    """
    table_axis, table_rot = anchor_table
    table_axis = jnp.asarray(table_axis, targets.dtype)
    table_rot = jnp.asarray(table_rot, targets.dtype)
    width = int(size[0]) // int(stride)
    height = int(size[1]) // int(stride)
    num_anchors = table_axis.shape[0]

    classes = targets[:, 5]
    valid = classes > -1
    safe = jnp.concatenate(
        [targets[:, 0:2], jnp.maximum(targets[:, 2:4], 1e-4),
         targets[:, 4:5]], axis=1)
    boxes_axis, boxes_rot = rotate_boxes(safe)                     # [M,6],[M,8]

    cell = _cell_xy(width, height, stride, targets.dtype)          # [H,W,2]
    anchors_axis = (jnp.concatenate([cell, cell], -1)[:, :, None, :]
                    + table_axis).reshape(-1, 4)
    cell4 = jnp.concatenate([cell] * 4, axis=-1)                   # [H,W,8]
    anchors_rot = (cell4[:, :, None, :] + table_rot).reshape(-1, 8)

    best_iou, best = rotated_best_match(anchors_rot, boxes_rot, valid)
    # one-hot contraction instead of boxes_axis[best]/classes[best]
    # gathers (same gather-lowering cost story as snap_to_anchors)
    onehot = (best[:, None] == jnp.arange(boxes_rot.shape[0])).astype(
        jnp.float32)
    encode = box2delta_rotated_planar if flat else box2delta_rotated
    deltas = encode(onehot @ boxes_axis, anchors_axis)
    return _finalize(best_iou, onehot @ classes, deltas, num_classes,
                     anchor_ious, height, width, num_anchors, one_hot_cls,
                     flat)


def snap_to_anchors_rotated_batched(targets, size, stride, anchor_table,
                                    num_classes, anchor_ious=(0.4, 0.5),
                                    one_hot_cls=True, flat=False):
    """Batched rotated assignment: targets [B, max_det, 6].

    Numerically identical to ``vmap(snap_to_anchors_rotated)`` but keeps
    the batch axis explicit so the streaming best-match can *actually
    skip* padding slots and out-of-size-band targets with ``lax.cond``
    (vmap would lower the cond to a both-branches select) — see
    rotated_best_match_batched. This is the form the train step uses;
    the unbatched variant remains the reference/parity twin.
    """
    table_axis, table_rot = anchor_table
    table_axis = jnp.asarray(table_axis, targets.dtype)
    table_rot = jnp.asarray(table_rot, targets.dtype)
    width = int(size[0]) // int(stride)
    height = int(size[1]) // int(stride)
    num_anchors = table_axis.shape[0]

    classes = targets[..., 5]                                # [B, M]
    valid = classes > -1
    safe = jnp.concatenate(
        [targets[..., 0:2], jnp.maximum(targets[..., 2:4], 1e-4),
         targets[..., 4:5]], axis=-1)
    boxes_axis, boxes_rot = rotate_boxes(safe)               # [B,M,6],[B,M,8]

    cell = _cell_xy(width, height, stride, targets.dtype)    # [H,W,2]
    anchors_axis = (jnp.concatenate([cell, cell], -1)[:, :, None, :]
                    + table_axis).reshape(-1, 4)
    cell4 = jnp.concatenate([cell] * 4, axis=-1)             # [H,W,8]
    anchors_rot = (cell4[:, :, None, :] + table_rot).reshape(-1, 8)

    payload = jnp.concatenate([boxes_axis, classes[..., None]], -1)
    best_iou, best_pay = rotated_best_match_batched(
        anchors_rot, boxes_rot, valid, skip_ratio=anchor_ious[0],
        payload=payload)
    best_boxes, best_cls = best_pay[..., :6], best_pay[..., 6]
    encode = box2delta_rotated_planar if flat else box2delta_rotated
    deltas = encode(best_boxes, anchors_axis)
    return _finalize(best_iou, best_cls, deltas, num_classes,
                     anchor_ious, height, width, num_anchors, one_hot_cls,
                     flat)
