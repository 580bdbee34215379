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

    fold=True returns the folded fp32 (scale, shift) pair instead of
    applying them (the fused-stem pool kernel consumes them directly);
    variables are declared identically, so checkpoints are unaffected.
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32
    fold: bool = False
    # wpack: x is width-pair-packed ([..., 2*features], packed channel
    # = phase*features + c); apply the per-channel affine tiled x2.
    wpack: bool = False

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
        if self.fold:
            return w, b
        if self.wpack:
            w, b = jnp.tile(w, 2), jnp.tile(b, 2)
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def space_to_depth_fold(x):
    """[B, H, W, C] -> 2x2(x2) space-to-depth [B, H/2, W/4, 8C],
    channel order (row-phase fi | col-pair j2, col-phase fj, c).

    Row-phase-MAJOR on purpose: each half is a sublane-strided row
    slice (H is an untiled dim on TPU, so the slice is a near-BW DMA)
    followed by a FREE row-major (W, C) -> (W/4, 4C) lane regroup and
    one lane concat. The earlier (j2, fi, fj, c) interleaved order was
    a genuine 6-dim transpose that XLA lowered at ~49 GB/s
    (~2 ms/step at b=8 @832)."""
    b, h, w, c = x.shape
    x0 = x[:, 0::2].reshape(b, h // 2, w // 4, 4 * c)
    x1 = x[:, 1::2].reshape(b, h // 2, w // 4, 4 * c)
    return jnp.concatenate([x0, x1], axis=-1)


def merged_phase_kernel(kernel, dtype=None):
    """[7, 7, Cin, O] stride-2 kernel -> km [4, 3, 8Cin, 2O]: ONE
    stride-1 kernel over the space-to-depth-folded input whose output
    channels pack the even-column result in [..., :O] and the odd-
    column result in [..., O:] (the stride-2 conv's columns
    de-interleaved, lane-packed — full 128-wide MXU output tiles for
    O=64, where two separate 64-channel phase convs ran at half lane
    utilization).

    Tap algebra (x4 = space_to_depth_fold(x), channel
    ch = fi*4Cin + j2*2Cin + fj*Cin + c):
      rows: x row 2i+di-3 = 2(i+dI-2)+fi  =>  di = 2*dI + fi - 1
      cols: x col 4q+2fo+dj-3 = 4(q+dv-1)+2*j2+fj
                              =>  dj = 4*dv + 2*j2 + fj - 1 - 2*fo
    so each (di, dj, fo) tap of the 7x7 kernel lands at exactly one
    (dI, dv, ch-block, fo*O) slot of the merged kernel. Built by 98
    static block-assignments — pure indexing, so autodiff maps the
    merged weight gradient back to the [7,7,Cin,O] parameter.
    Validated tap-for-tap against lax.conv (tests/test_backbones.py)."""
    cin, o = kernel.shape[2], kernel.shape[3]
    if dtype is None:
        dtype = kernel.dtype
    km = jnp.zeros((4, 3, 8 * cin, 2 * o), dtype)
    for di in range(7):
        fi = (di + 1) % 2
        d_i = (di + 1 - fi) // 2
        for dj in range(7):
            for fo in range(2):
                t = dj + 1 + 2 * fo
                dv, rem = divmod(t, 4)
                j2, fj = divmod(rem, 2)
                if not 0 <= dv <= 2:
                    continue
                ch = (fi * 4 + j2 * 2 + fj) * cin
                km = km.at[d_i, dv, ch:ch + cin,
                           fo * o:(fo + 1) * o].set(kernel[di, dj])
    return km


def merged_phase_conv(x4, km, feature_group_count=1,
                      preferred_element_type=None):
    """Run the merged stem phase conv on the folded input: returns
    [B, H/2, W/4, 2O] with channels [even-col O | odd-col O] — the
    stride-2 conv's output with columns de-interleaved into the channel
    axis (y[..., :O] = out[:, :, 0::2], y[..., O:] = out[:, :, 1::2],
    bit-for-bit up to accumulation order)."""
    kw = dict(window_strides=(1, 1),
              dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
              feature_group_count=feature_group_count)
    if preferred_element_type is not None:
        kw['preferred_element_type'] = preferred_element_type
    return jax.lax.conv_general_dilated(x4, km, padding=[(2, 1), (1, 1)],
                                        **kw)


def wpack_kernel(w):
    """Stride-1, pad-k//2 kernel [kh,kw,C,O] -> its W-packed twin
    [kh,kw',2C,2O] operating on width-pair-packed activations
    ([B,H,W,C] -> [B,H,W/2,2C], a FREE row-major reshape; packed
    channel = phase*C + c).

    Rationale: layer1's 64-in/64-out 3x3 convs fill only half of a
    128-lane MXU tile on each side (~47 TFLOP/s measured, 24% of
    peak). Packing adjacent column pairs into lanes doubles the FLOPs
    (each packed tap carries two column phases) but quadruples lane
    utilization, with identical activation bytes.

    1x1: block-diagonal duplicate (each phase maps through w).
    3x3: output packed col q, phase fo reads orig cols 2q+fo+dj-1,
    which live at packed (q+dv-1, phase fi); exactly 6 (fo,dv,fi)
    slots carry the taps dj, the rest stay zero:
        fo=0: (dv,fi,dj) = (0,1,0), (1,0,1), (1,1,2)
        fo=1: (dv,fi,dj) = (1,0,0), (1,1,1), (2,0,2)
    Edge columns are exact: packed SAME padding zeroes orig cols
    {-2,-1} and {W,W+1}; the taps only ever reach -1 and W. Built by
    static block-assignments, so autodiff routes the packed weight
    gradient back to the [kh,kw,C,O] parameter."""
    kh, kw, c, o = w.shape
    if (kh, kw) == (1, 1):
        K = jnp.zeros((1, 1, 2 * c, 2 * o), w.dtype)
        K = K.at[:, :, :c, :o].set(w)
        return K.at[:, :, c:, o:].set(w)
    assert (kh, kw) == (3, 3), f'wpack supports 1x1/3x3 kernels, got {w.shape}'
    K = jnp.zeros((3, 3, 2 * c, 2 * o), w.dtype)
    slots = {0: [(0, 1, 0), (1, 0, 1), (1, 1, 2)],
             1: [(1, 0, 0), (1, 1, 1), (2, 0, 2)]}
    for fo, lst in slots.items():
        for dv, fi, dj in lst:
            K = K.at[:, dv, fi * c:(fi + 1) * c,
                     fo * o:(fo + 1) * o].set(w[:, dj])
    return K


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
    # s2d_phases: TPU stem mode for the 7x7/s2 conv — run as ONE
    # stride-(2,4) merged phase conv on the raw image, returning
    # [B, H/2, W/4, 2O] with output columns de-interleaved into
    # lane-packed channels [even O | odd O] (consumed by the fused
    # BN+ReLU+pool kernel in exactly this layout — no relayout between
    # conv and pool, and no input fold). Parameter shape/name unchanged
    # ([7,7,Cin,O] ``kernel``), so checkpoints and torch import are
    # unaffected. The plain form pays a 3-channel MXU contraction, a
    # [B,H/2,W/2,O] relayout, and misaligned 7x7x3 weight-gradient
    # fixups — together ~3 ms/step at b=8 @832 on v5e.
    s2d_phases: bool = False
    # wpack: activations arrive width-pair-packed ([B,H,W/2,2Cin]) and
    # the result is returned packed ([B,H,W/2,2*features]); the stored
    # parameter keeps its plain [kh,kw,Cin,features] shape/name (same
    # checkpoints) and is transformed at apply time by wpack_kernel.
    # Only stride-1 ungrouped 1x1/3x3 convs (the layer1 shapes).
    wpack: bool = False

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
            if self.wpack:
                in_ch = x.shape[-1] // 2
            kernel = self.param('kernel', self.kernel_init,
                                (*self.kernel_size, in_ch, self.features),
                                self.param_dtype)
            bias = (self.param('bias', self.bias_init, (self.features,),
                               self.param_dtype) if self.use_bias else None)

        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding)] * 2

        if self.s2d_phases:
            # the merged-phase derivation is specific to a 7x7/stride-2/
            # pad-3 conv over an even-H, %4-W input (the ResNet stem);
            # any other config would silently produce wrong outputs
            assert self.kernel_size == (7, 7), \
                f's2d_phases requires a 7x7 kernel, got {self.kernel_size}'
            assert tuple(self.strides) == (2, 2), \
                f's2d_phases requires stride (2, 2), got {self.strides}'
            assert list(map(tuple, padding)) == [(3, 3), (3, 3)], \
                f's2d_phases requires padding [(3,3),(3,3)], got {padding}'
            assert x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0, \
                ('s2d_phases requires input H%2==0 and W%4==0, got '
                 f'{x.shape[1]}x{x.shape[2]}')

        if self.wpack:
            assert not self.s2d_phases, 'wpack and s2d_phases are exclusive'
            assert self.kernel_size in ((1, 1), (3, 3)), \
                f'wpack supports 1x1/3x3 kernels, got {self.kernel_size}'
            assert tuple(self.strides) == (1, 1), \
                f'wpack requires stride (1, 1), got {self.strides}'
            assert self.feature_group_count == 1, \
                'wpack requires an ungrouped conv'
            p = self.kernel_size[0] // 2
            assert list(map(tuple, padding)) == [(p, p)] * 2, \
                f'wpack requires pad k//2, got {padding}'

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
            if self.s2d_phases:
                km = merged_phase_kernel(kernel.astype(jnp.int8))
                y = merged_phase_conv(space_to_depth_fold(xq), km,
                                      self.feature_group_count,
                                      preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32)
                     * (act_scale * jnp.tile(w_scale, 2)))
                if bias is not None:
                    y = y + jnp.tile(bias, 2).astype(jnp.float32)
                return y.astype(self.dtype)
            if self.wpack:
                y = jax.lax.conv_general_dilated(
                    xq, wpack_kernel(kernel.astype(jnp.int8)),
                    window_strides=(1, 1), padding=padding,
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32)
                     * (act_scale * jnp.tile(w_scale, 2)))
                if bias is not None:
                    y = y + jnp.tile(bias, 2).astype(jnp.float32)
                return y.astype(self.dtype)
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

        if self.s2d_phases:
            km = merged_phase_kernel(kernel, dtype=self.dtype)
            y = merged_phase_conv(space_to_depth_fold(x.astype(self.dtype)),
                                  km, self.feature_group_count)
            if bias is None:
                return y
            return y + jnp.tile(bias, 2).astype(self.dtype)

        if self.wpack:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wpack_kernel(kernel.astype(self.dtype)),
                window_strides=(1, 1), padding=padding,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            if bias is not None:
                y = y + jnp.tile(bias, 2).astype(self.dtype)
            return y

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
