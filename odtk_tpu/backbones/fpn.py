"""Feature Pyramid Network head over a 3-level backbone.

Parity with odtk/backbones/fpn.py:11-61: laterals (1x1) on C3/C4/C5,
nearest x2 top-down additions, 3x3 smoothing, and extra P6/P7 levels
(P6 = 3x3 s2 on C5, P7 = 3x3 s2 on relu(P6)). All pyramid channels
are 256; overall stride (for input padding) is 128.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import QuantConv
from .mobilenet import MobileNet
from .registry import register

_XAVIER = nn.initializers.xavier_uniform()


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32):
    pad = kernel // 2
    return QuantConv(features, (kernel, kernel), strides=(stride, stride),
                     padding=[(pad, pad), (pad, pad)], use_bias=True,
                     dtype=dtype, param_dtype=jnp.float32,
                     kernel_init=_XAVIER, name=name)


def _upsample2x(x):
    """Nearest-neighbor x2 (matches F.interpolate(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    features: nn.Module
    dtype: Any = jnp.float32
    stride: int = 128

    @nn.compact
    def __call__(self, x):
        c3, c4, c5 = self.features(x)

        p5 = _conv(256, 1, name='lateral5', dtype=self.dtype)(c5)
        p4 = _conv(256, 1, name='lateral4', dtype=self.dtype)(c4)
        p4 = _upsample2x(p5) + p4
        p3 = _conv(256, 1, name='lateral3', dtype=self.dtype)(c3)
        p3 = _upsample2x(p4) + p3

        p6 = _conv(256, 3, 2, name='pyramid6', dtype=self.dtype)(c5)
        p7 = _conv(256, 3, 2, name='pyramid7', dtype=self.dtype)(nn.relu(p6))

        p3 = _conv(256, 3, name='smooth3', dtype=self.dtype)(p3)
        p4 = _conv(256, 3, name='smooth4', dtype=self.dtype)(p4)
        p5 = _conv(256, 3, name='smooth5', dtype=self.dtype)(p5)
        return [p3, p4, p5, p6, p7]


@register
def MobileNetV2FPN(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
                   wpack_layer1=False):
    # 3x3/s2 stem, inverted-residual trunk — no fused 7x7 stem and no
    # 64-ch layer1 to width-pack here
    del mesh, fused_stem, wpack_layer1
    return FPN(MobileNet(outputs=(6, 13, 17), dtype=dtype), dtype=dtype, name=name)
