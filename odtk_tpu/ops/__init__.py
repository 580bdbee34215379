"""Detection ops: anchors, box codecs, target assignment, decode, NMS, IoU.

All ops are pure jnp functions with static shapes (jit/pjit friendly).
The hot inference ops (decode, NMS) have Pallas fast paths under
``odtk_tpu.ops.pallas`` validated box-for-box against these references,
mirroring how the reference keeps dual CPU/CUDA implementations
(reference: odtk/box.py vs csrc/cuda/*.cu).
"""

from .anchors import generate_anchors, generate_anchors_rotated
from .boxes import (box2delta, box2delta_rotated, delta2box,
                    delta2box_rotated, order_points, rotate_boxes)
from .assign import (snap_to_anchors, snap_to_anchors_rotated,
                     snap_to_anchors_rotated_batched)
from .decode import decode, decode_fused
from .nms import nms, nms_rotated
from .iou_rotated import polygon_iou, rotated_pair_iou
from .losses import focal_loss, smooth_l1_loss

__all__ = [
    'generate_anchors', 'generate_anchors_rotated',
    'box2delta', 'box2delta_rotated', 'delta2box', 'delta2box_rotated',
    'order_points', 'rotate_boxes',
    'snap_to_anchors', 'snap_to_anchors_rotated',
    'snap_to_anchors_rotated_batched',
    'decode', 'decode_fused', 'nms', 'nms_rotated',
    'polygon_iou', 'rotated_pair_iou',
    'focal_loss', 'smooth_l1_loss',
]
