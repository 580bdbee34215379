"""ResNet / ResNeXt feature extractors in flax (NHWC, bf16-friendly).

Functional parity with the reference's torchvision subclass
(odtk/backbones/resnet.py:7-39): returns the C3, C4, C5 feature maps
(strides 8/16/32) for FPN, or C4 only for the C4 variants. Module names
deliberately mirror torchvision's state_dict keys (conv1, bn1,
layer{1-4}.{i}.conv{j}/bn{j}/downsample.{0,1}) so pretrained torch
checkpoints map 1:1 through io.torch_import.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import FixedBatchNorm, QuantConv
from .registry import register

_KAIMING = nn.initializers.variance_scaling(2.0, 'fan_out', 'normal')


def _conv(features, kernel, stride=1, groups=1, name=None, dtype=jnp.float32,
          s2d=False, wpack=False):
    pad = kernel // 2
    return QuantConv(features, (kernel, kernel), strides=(stride, stride),
                     padding=[(pad, pad), (pad, pad)], use_bias=False,
                     feature_group_count=groups, dtype=dtype,
                     param_dtype=jnp.float32, kernel_init=_KAIMING,
                     s2d_phases=s2d, wpack=wpack, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    # wpack: the whole block runs on width-pair-packed activations
    # (stride-1 stages only; parameters identical either way)
    wpack: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 3, self.stride, name='conv1',
                    dtype=self.dtype, wpack=self.wpack)(x)
        out = FixedBatchNorm(self.planes, dtype=self.dtype, name='bn1',
                             wpack=self.wpack)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, name='conv2', dtype=self.dtype,
                    wpack=self.wpack)(out)
        out = FixedBatchNorm(self.planes, dtype=self.dtype, name='bn2',
                             wpack=self.wpack)(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, name='downsample_0',
                             dtype=self.dtype, wpack=self.wpack)(x)
            identity = FixedBatchNorm(self.planes, dtype=self.dtype,
                                      name='downsample_1',
                                      wpack=self.wpack)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32
    expansion: int = 4
    wpack: bool = False

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.width_per_group / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        out = _conv(width, 1, name='conv1', dtype=self.dtype,
                    wpack=self.wpack)(x)
        out = FixedBatchNorm(width, dtype=self.dtype, name='bn1',
                             wpack=self.wpack)(out)
        out = nn.relu(out)
        out = _conv(width, 3, self.stride, groups=self.groups, name='conv2',
                    dtype=self.dtype, wpack=self.wpack)(out)
        out = FixedBatchNorm(width, dtype=self.dtype, name='bn2',
                             wpack=self.wpack)(out)
        out = nn.relu(out)
        out = _conv(out_ch, 1, name='conv3', dtype=self.dtype,
                    wpack=self.wpack)(out)
        out = FixedBatchNorm(out_ch, dtype=self.dtype, name='bn3',
                             wpack=self.wpack)(out)
        if self.downsample:
            identity = _conv(out_ch, 1, self.stride, name='downsample_0',
                             dtype=self.dtype, wpack=self.wpack)(x)
            identity = FixedBatchNorm(out_ch, dtype=self.dtype,
                                      name='downsample_1',
                                      wpack=self.wpack)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns feature maps C{level} for level in ``outputs``.

    x: [B, H, W, 3] NHWC. Levels: C2=stride 4 ... C5=stride 32.

    fused_stem (default): conv1 runs as ONE stride-(2,4) merged phase
    conv on the raw image (output columns de-interleaved into
    lane-packed channels, 189-deep im2col contraction — no input fold)
    and BN+ReLU+maxpool as one fused op consuming that layout
    directly (Pallas on TPU, jnp twin elsewhere) — the [B, H/2, W/2,
    64] stem activation never hits HBM and no relayout runs between
    conv and pool. Same parameters/checkpoints either way; ~5 ms/step at b=8
    @832 on v5e. ``mesh``: >1-device mesh threaded to the Pallas op
    (shard_map over batch — pallas_call is opaque to GSPMD).
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = True
    outputs: Sequence[int] = (3, 4, 5)
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32
    # real constructor knob (Model(config={'fused_stem': ...}) / CLI
    # --no-fused-stem thread it down here); a plain default, never an
    # env read at class-definition time
    fused_stem: bool = True
    # run layer1 on width-pair-packed activations ([B,H,W/2,2C]): its
    # 64-channel convs fill only half the 128-lane MXU tile; packing
    # trades 2x FLOPs for 4x lane utilization (see layers.wpack_kernel).
    # Entry/exit are free reshapes; parameters/checkpoints identical.
    # Applies to ungrouped stage-0 blocks with even pooled width only.
    wpack_layer1: bool = False
    mesh: Any = None

    # FPN channel table hook (odtk/backbones/fpn.py:20-22)
    @property
    def feature_channels(self):
        mult = 4 if self.bottleneck else 1
        return [128 * mult, 256 * mult, 512 * mult]

    @nn.compact
    def __call__(self, x):
        if self.fused_stem:
            from ..ops.pallas.stem_kernel import fused_bn_relu_pool
            y = _conv(64, 7, 2, name='conv1', dtype=self.dtype,
                      s2d=True)(x)
            scale, shift = FixedBatchNorm(64, dtype=self.dtype,
                                          name='bn1', fold=True)(None)
            x = fused_bn_relu_pool(y, scale, shift, mesh=self.mesh)
        else:
            x = _conv(64, 7, 2, name='conv1', dtype=self.dtype)(x)
            x = FixedBatchNorm(64, dtype=self.dtype, name='bn1')(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        block = Bottleneck if self.bottleneck else BasicBlock
        expansion = 4 if self.bottleneck else 1
        outs = []
        in_ch = 64
        for stage, blocks in enumerate(self.layers):
            level = stage + 2
            if level > max(self.outputs):
                break
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            wp = (stage == 0 and self.wpack_layer1 and self.groups == 1
                  and x.shape[2] % 2 == 0)
            if wp:
                b_, h_, w_, c_ = x.shape
                x = x.reshape(b_, h_, w_ // 2, 2 * c_)
            for i in range(blocks):
                kwargs = dict(planes=planes, dtype=self.dtype, wpack=wp,
                              name=f'layer{stage + 1}_{i}')
                if self.bottleneck:
                    kwargs.update(groups=self.groups,
                                  width_per_group=self.width_per_group)
                needs_ds = (i == 0 and
                            (stride != 1 or in_ch != planes * expansion))
                x = block(stride=stride if i == 0 else 1,
                          downsample=needs_ds, **kwargs)(x)
            if wp:
                b_, h_, wh, c2 = x.shape
                x = x.reshape(b_, h_, wh * 2, c2 // 2)
            in_ch = planes * expansion
            if level in self.outputs:
                outs.append(x)
        return outs


@register
def ResNet18FPN(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
                wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(2, 2, 2, 2), bottleneck=False, dtype=dtype,
                      mesh=mesh, fused_stem=fused_stem,
                      wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


@register
def ResNet34FPN(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
                wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(3, 4, 6, 3), bottleneck=False, dtype=dtype,
                      mesh=mesh, fused_stem=fused_stem,
                      wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


@register
def ResNet50FPN(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
                wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(3, 4, 6, 3), dtype=dtype, mesh=mesh,
                      fused_stem=fused_stem, wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


@register
def ResNet101FPN(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
                 wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(3, 4, 23, 3), dtype=dtype, mesh=mesh,
                      fused_stem=fused_stem, wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


@register
def ResNet152FPN(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
                 wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(3, 8, 36, 3), dtype=dtype, mesh=mesh,
                      fused_stem=fused_stem, wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


@register
def ResNeXt50_32x4dFPN(dtype=jnp.float32, name=None, mesh=None,
                       fused_stem=True, wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(3, 4, 6, 3), groups=32, width_per_group=4,
                      dtype=dtype, mesh=mesh, fused_stem=fused_stem,
                      wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


@register
def ResNeXt101_32x8dFPN(dtype=jnp.float32, name=None, mesh=None,
                        fused_stem=True, wpack_layer1=False):
    from .fpn import FPN
    return FPN(ResNet(layers=(3, 4, 23, 3), groups=32, width_per_group=8,
                      dtype=dtype, mesh=mesh, fused_stem=fused_stem,
                      wpack_layer1=wpack_layer1),
               dtype=dtype, name=name)


class ResNetC4(nn.Module):
    """Single-level C4 backbone (stride 16), reference resnet.py:41-47."""
    layers: Sequence[int]
    dtype: Any = jnp.float32
    stride: int = 16
    mesh: Any = None
    fused_stem: bool = True
    wpack_layer1: bool = False
    feature_channels = None

    @nn.compact
    def __call__(self, x):
        net = ResNet(layers=self.layers, bottleneck=False, outputs=(4,),
                     dtype=self.dtype, mesh=self.mesh,
                     fused_stem=self.fused_stem,
                     wpack_layer1=self.wpack_layer1, name='features')
        return net(x)


@register
def ResNet18C4(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
               wpack_layer1=False):
    return ResNetC4(layers=(2, 2, 2, 2), dtype=dtype, mesh=mesh,
                    fused_stem=fused_stem, wpack_layer1=wpack_layer1,
                    name=name)


@register
def ResNet34C4(dtype=jnp.float32, name=None, mesh=None, fused_stem=True,
               wpack_layer1=False):
    return ResNetC4(layers=(3, 4, 6, 3), dtype=dtype, mesh=mesh,
                    fused_stem=fused_stem, wpack_layer1=wpack_layer1,
                    name=name)
