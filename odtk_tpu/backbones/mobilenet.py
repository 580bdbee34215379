"""MobileNetV2 feature extractor in flax (NHWC).

Parity target: the reference taps torchvision MobileNetV2 features
6, 13, 17 for strides 8/16/32 with channels 32/96/320
(odtk/backbones/mobilenet.py:5-25, fpn.py:23-24).

Module names encode torchvision's nested Sequential indices flattened
with underscores (``features.3.conv.0.0`` -> ``features_3`` module with
inner conv ``conv_0_0``), so torch state_dicts map through the single
merge-digits rule in io.torch_import.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import FixedBatchNorm, QuantConv

_KAIMING = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')

# (expand_ratio, out_channels, stride) per torchvision features[1..17]
_IR_CFG = [
    (1, 16, 1),
    (6, 24, 2), (6, 24, 1),
    (6, 32, 2), (6, 32, 1), (6, 32, 1),
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
    (6, 96, 1), (6, 96, 1), (6, 96, 1),
    (6, 160, 2), (6, 160, 1), (6, 160, 1),
    (6, 320, 1),
]


def _conv_bn_relu6(x, features, kernel, stride, groups, name, dtype):
    """ConvBNReLU block: names ``{name}_0`` (conv) / ``{name}_1`` (bn)."""
    pad = kernel // 2
    x = QuantConv(features, (kernel, kernel), strides=(stride, stride),
                  padding=[(pad, pad), (pad, pad)], use_bias=False,
                  feature_group_count=groups, dtype=dtype,
                  param_dtype=jnp.float32, kernel_init=_KAIMING,
                  name=f'{name}_0')(x)
    x = FixedBatchNorm(features, dtype=dtype, name=f'{name}_1')(x)
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    stride: int
    expand: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = self.in_ch * self.expand
        out = x
        i = 0
        if self.expand != 1:
            out = _conv_bn_relu6(out, hidden, 1, 1, 1, f'conv_{i}', self.dtype)
            i += 1
        out = _conv_bn_relu6(out, hidden, 3, self.stride, hidden,
                             f'conv_{i}', self.dtype)
        i += 1
        out = QuantConv(self.out_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=_KAIMING, name=f'conv_{i}')(out)
        out = FixedBatchNorm(self.out_ch, dtype=self.dtype,
                             name=f'conv_{i + 1}')(out)
        if self.stride == 1 and self.in_ch == self.out_ch:
            out = out + x
        return out


class MobileNet(nn.Module):
    """Returns feature maps at the tapped block indices."""
    outputs: Sequence[int] = (6, 13, 17)
    dtype: Any = jnp.float32

    feature_channels = [32, 96, 320]

    @nn.compact
    def __call__(self, x):
        x = _conv_bn_relu6(x, 32, 3, 2, 1, 'features_0', self.dtype)
        outs = []
        if 0 in self.outputs:
            outs.append(x)
        in_ch = 32
        for idx, (t, c, s) in enumerate(_IR_CFG, start=1):
            x = InvertedResidual(in_ch, c, s, t, dtype=self.dtype,
                                 name=f'features_{idx}')(x)
            in_ch = c
            if idx in self.outputs:
                outs.append(x)
        return outs
