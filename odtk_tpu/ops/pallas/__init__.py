"""Hand-written Pallas TPU kernels for the hot detection ops.

Each kernel has a jnp reference twin in odtk_tpu.ops validated
box-for-box in tests (mirroring the reference's CPU-vs-CUDA dual
implementations, odtk/box.py vs csrc/cuda/*).

Availability is platform-gated: on non-TPU backends the jnp reference
is used automatically.
"""

from .nms_kernel import nms_pallas
from .nms_rotated_kernel import nms_rotated_pallas
from .iou_kernel import rotated_best_match_pallas
from .match_rotated_kernel import rotated_match_pallas
from .focal_kernel import detection_loss_sums_fused, focal_sum_fused
from .stem_kernel import fused_bn_relu_pool

__all__ = ['nms_pallas', 'nms_rotated_pallas', 'rotated_best_match_pallas',
           'rotated_match_pallas', 'focal_sum_fused',
           'detection_loss_sums_fused', 'fused_bn_relu_pool']
