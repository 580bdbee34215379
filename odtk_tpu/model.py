"""RetinaNet — TPU-native model layer.

Functional parity with the reference Model (odtk/model.py:15-305), split
the JAX way: a flax ``RetinaNet`` module holds only parameters and the
pure forward pass (backbones -> shared heads); the ``Model`` wrapper owns
hyperparameters, anchors, the loss/inference functions that close over
jnp ops, and checkpoint I/O. Train/eval/export are separate pure
functions rather than module-state flags (cf. model.py:137-144).

Layouts: NHWC images [B, H, W, 3]; head channels = anchor-major,
class/box-minor (channel c = a * K + k), matching the reference conv
semantics (model.py:64-68) so imported checkpoints behave identically.
"""

import math
import os
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import unfreeze

from . import backbones as backbones_mod
from .backbones.layers import QuantConv
from .ops import (decode, decode_fused, nms, nms_rotated, focal_loss,
                  smooth_l1_loss, snap_to_anchors, snap_to_anchors_rotated,
                  snap_to_anchors_rotated_batched,
                  generate_anchors, generate_anchors_rotated)
from .ops.pallas import detection_loss_sums_fused


def _tpu_backend():
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except RuntimeError:
        return False


class RetinaNet(nn.Module):
    """Backbones + shared classification/box heads.

    Head structure (model.py:57-68): 4x (3x3 conv 256 + ReLU) then a
    final 3x3 conv; cls head emits classes*A channels, box head 4*A
    (or 6*A rotated, sin/cos theta). Conv param names use torch
    Sequential indices (cls_head_0..cls_head_8) for checkpoint interop.
    """
    backbone_names: Sequence[str] = ('ResNet50FPN',)
    classes: int = 80
    num_anchors: int = 9
    box_size: int = 4           # 6 when rotated
    rotated: bool = False
    dtype: Any = jnp.float32
    # >1-device mesh for ops GSPMD can't partition (the Pallas fused
    # stem pool) — threaded to the backbones; see Model.set_spmd_mesh
    spmd_mesh: Any = None
    # run the 7x7/s2 stem as the merged space-to-depth phase conv +
    # fused BN/ReLU/pool kernel (ResNet-family backbones only)
    fused_stem: bool = True
    # run layer1 width-pair-packed (64-ch convs at full MXU lane
    # width; see backbones.layers.wpack_kernel)
    wpack_layer1: bool = False

    def setup(self):
        self.nets = [backbones_mod.build(b, dtype=self.dtype,
                                         mesh=self.spmd_mesh,
                                         fused_stem=self.fused_stem,
                                         wpack_layer1=self.wpack_layer1,
                                         name=f'backbones_{b}')
                     for b in self.backbone_names]
        normal01 = nn.initializers.normal(stddev=0.01)
        pi = 0.01
        prior = nn.initializers.constant(-math.log((1 - pi) / pi))

        def head_convs(prefix, out_size, final_bias):
            convs = [QuantConv(256, (3, 3), padding=[(1, 1), (1, 1)],
                               dtype=self.dtype, param_dtype=jnp.float32,
                               kernel_init=normal01,
                               bias_init=nn.initializers.zeros,
                               name=f'{prefix}_{i * 2}') for i in range(4)]
            convs.append(QuantConv(out_size, (3, 3),
                                   padding=[(1, 1), (1, 1)],
                                   dtype=self.dtype,
                                   param_dtype=jnp.float32,
                                   kernel_init=normal01,
                                   bias_init=final_bias,
                                   name=f'{prefix}_8'))
            return convs

        self.cls_convs = head_convs('cls_head', self.classes * self.num_anchors,
                                    prior)
        box_final_bias = prior if self.rotated else nn.initializers.zeros
        self.box_convs = head_convs('box_head', self.box_size * self.num_anchors,
                                    box_final_bias)

    def _run_head(self, convs, x):
        for conv in convs[:-1]:
            x = nn.relu(conv(x))
        return convs[-1](x)

    def __call__(self, x):
        """x [B, H, W, 3] -> (cls_heads, box_heads): lists of NHWC logits."""
        features = []
        for net in self.nets:
            features.extend(net(x))
        cls_heads = [self._run_head(self.cls_convs, f) for f in features]
        box_heads = [self._run_head(self.box_convs, f) for f in features]
        return cls_heads, box_heads


class Model:
    """User-facing model: hyperparams + pure train/infer functions.

    Mirrors the reference constructor signature (model.py:18-52):
    ratios/scales/angles define the per-level anchor tables; ``config``
    carries threshold/top_n/nms/detections.
    """

    def __init__(self, backbones='ResNet50FPN', classes=80,
                 ratios=(1.0, 2.0, 0.5),
                 scales=tuple(4 * 2 ** (i / 3) for i in range(3)),
                 angles=None, rotated_bbox=False, anchor_ious=(0.4, 0.5),
                 config=None, dtype=jnp.float32):
        if not isinstance(backbones, (list, tuple)):
            backbones = [backbones]
        config = dict(config or {})

        self.backbones = list(backbones)
        self.name = 'RetinaNet'
        self.classes = classes
        self.ratios = list(ratios)
        self.scales = list(scales)
        self.rotated_bbox = rotated_bbox
        self.angles = (list(angles) if angles is not None else
                       [-np.pi / 6, 0, np.pi / 6] if rotated_bbox else None)
        self.anchor_ious = tuple(anchor_ious)

        self.threshold = config.get('threshold', 0.05)
        self.top_n = config.get('top_n', 1000)
        self.nms = config.get('nms', 0.5)
        self.detections = config.get('detections', 100)
        # one global top-(fused_top_n) selection instead of 5 per-level
        # top-k calls (0.87 vs 1.44 ms at b=1 @800 — see
        # ops/decode.decode_fused); config {'decode_fused': False}
        # restores per-level selection, 'fused_top_n' sets the budget
        self.decode_fused = config.get('decode_fused', True)
        self.fused_top_n = config.get('fused_top_n', 2 * self.top_n)
        # fused space-to-depth stem: a runtime perf knob (identical
        # params/checkpoints either way). Config/CLI-first; the env var
        # is a fallback read HERE, at construction time, not at import
        # (setting it after `import odtk_tpu` works as expected).
        self.fused_stem = bool(config.get(
            'fused_stem', os.environ.get('ODTK_FUSED_STEM', '1') != '0'))
        # width-pair-packed layer1 (backbones.layers.wpack_kernel).
        # Default 'auto': ON in the training graph (65.3 vs 67.4 ms
        # b=8 @832 v5e, extras/bench_wpack.py), OFF for inference and
        # export (3.94 vs 4.01 ms b=1 @800 — single-image convs don't
        # amortize the doubled FLOPs). make_train_step/export apply the
        # policy; config/env True/False pins one choice for every graph.
        raw = config.get('wpack_layer1',
                         os.environ.get('ODTK_WPACK_LAYER1', 'auto'))
        self.wpack_auto = raw in ('auto', None)
        self.wpack_layer1 = (False if self.wpack_auto
                             else raw not in (False, 0, '0', 'off'))

        self.stride = 128            # padding stride (fpn.py:17)
        self.dtype = dtype

        self.num_anchors = len(self.ratios) * len(self.scales)
        if rotated_bbox:
            self.num_anchors *= len(self.angles)
        self.box_size = 6 if rotated_bbox else 4

        self._spmd_mesh = None
        self.module = RetinaNet(
            backbone_names=tuple(self.backbones), classes=classes,
            num_anchors=self.num_anchors, box_size=self.box_size,
            rotated=rotated_bbox, dtype=dtype,
            fused_stem=self.fused_stem, wpack_layer1=self.wpack_layer1)
        self._anchors = {}
        self._jitted = {}            # (dtype, mesh key) -> compiled infer fn
        self._loss_mesh = None       # >1-device mesh for the fused focal op
        self.variables = None        # {'params': ..., 'frozen': ...}

    def __repr__(self):
        return '\n'.join([
            '     model: {}'.format(self.name),
            '  backbone: {}'.format(', '.join(self.backbones)),
            '   classes: {}, anchors: {}'.format(self.classes,
                                                 self.num_anchors)])

    def set_dtype(self, dtype):
        """Switch compute dtype (bf16 mixed precision); params stay fp32,
        so existing variables remain valid."""
        if dtype != self.dtype:
            self.dtype = dtype
            self._rebuild_module()
        return self

    def set_spmd_mesh(self, mesh):
        """Thread a >1-device mesh into the module for Pallas ops that
        GSPMD cannot auto-partition (the fused stem pool runs under
        shard_map over the batch axis). Static module field — changing
        it retraces, same as set_dtype; parameters are unaffected."""
        mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if mesh is not self._spmd_mesh:
            self._spmd_mesh = mesh
            self._rebuild_module()
        return self

    def set_fused_stem(self, fused_stem):
        """Toggle the fused space-to-depth stem (runtime perf knob;
        parameters and checkpoints are identical either way)."""
        if bool(fused_stem) != self.fused_stem:
            self.fused_stem = bool(fused_stem)
            self._rebuild_module()
        return self

    def set_wpack_layer1(self, wpack_layer1, pin=False):
        """Toggle width-pair-packed layer1 (runtime perf knob;
        parameters and checkpoints are identical either way).
        pin=True also disables the 'auto' train-on/infer-off policy so
        an explicit CLI/user choice can't be overridden later."""
        if pin:
            self.wpack_auto = False
        if bool(wpack_layer1) != self.wpack_layer1:
            self.wpack_layer1 = bool(wpack_layer1)
            self._rebuild_module()
        return self

    def _rebuild_module(self):
        self.module = RetinaNet(
            backbone_names=tuple(self.backbones), classes=self.classes,
            num_anchors=self.num_anchors, box_size=self.box_size,
            rotated=self.rotated_bbox, dtype=self.dtype,
            spmd_mesh=self._spmd_mesh, fused_stem=self.fused_stem,
            wpack_layer1=self.wpack_layer1)

    # ------------------------------------------------------------- anchors
    def anchors(self, stride):
        """Cached per-stride anchor table (model.py:156-157)."""
        if stride not in self._anchors:
            gen = (generate_anchors_rotated if self.rotated_bbox
                   else generate_anchors)
            self._anchors[stride] = gen(stride, self.ratios, self.scales,
                                        self.angles)
        return self._anchors[stride]

    # ------------------------------------------------------------ init
    def initialize(self, rng=0, image_size=(256, 256), fine_tune=None):
        """Build initial variables; optionally graft fine-tune weights.

        Fine-tune surgery matches model.py:80-98: load everything except
        the final cls-head conv (and final box-head conv if rotated).
        """
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), self.dtype)
        self.variables = unfreeze(self.module.init(rng, dummy))

        if fine_tune is not None:
            from .io import checkpoint as ckpt_io
            donor, _ = ckpt_io.load(fine_tune)
            skip = {('cls_head_8',)}
            if self.rotated_bbox:
                skip.add(('box_head_8',))
            for coll in ('params', 'frozen'):
                src = donor.variables.get(coll, {})
                dst = self.variables[coll]
                for key, sub in src.items():
                    if (key,) in skip or key not in dst:
                        continue
                    try:
                        ok = jax.tree_util.tree_all(
                            jax.tree.map(lambda a, b: a.shape == b.shape,
                                         dst[key], sub))
                    except ValueError:   # mismatched tree structure
                        ok = False
                    if ok:
                        dst[key] = sub
        return self.variables

    # ------------------------------------------------------------ loss
    def loss_fn(self, variables, images, targets):
        """(cls_loss, box_loss) in fp32; normalization per model.py:186-210.

        images [B, H, W, 3]; targets [B, max_det, 5|6] padded with -1.

        On TPU both loss terms run as ONE fused Pallas kernel
        (ops/pallas/focal_kernel.py detection_loss_sums_fused):
        index-form targets, no dense one-hot in memory — the XLA
        dense-one-hot path materializes ~10 ms/step of [B, N, K]
        buffers at 832 px — and the smooth-L1 diff never leaves VMEM.
        Elsewhere (CPU tests, virtual-device dryruns) the dense jnp
        form below is the reference twin. (A gather-based XLA fusion
        was the measured dead end: take_along_axis differentiates into
        a scatter.)
        """
        # ODTK_FUSED_LOSS=0 drops to the dense jnp twin (diagnostic:
        # compile-bisecting the axon remote backend's HTTP 500 on the
        # full-size rotated train graph)
        use_fused = _tpu_backend() and \
            os.environ.get('ODTK_FUSED_LOSS', '1') != '0'
        cls_heads, box_heads = self.module.apply(variables, images)

        cls_losses, box_losses, fg_counts = [], [], []
        for cls_head, box_head in zip(cls_heads, box_heads):
            h, w = cls_head.shape[1:3]
            stride = images.shape[2] // w
            size_px = (w * stride, h * stride)
            table = self.anchors(stride)

            # flat=True: cls/depth come back [B, HW, A] (the NHWC head's
            # memory order — channels are anchor-major — so no physical
            # transposes between assignment and loss) and box deltas in
            # the PLANAR [nb, B, HW, A] form (free bitcast of the
            # assignment's column-major layout; the fused kernel
            # interleaves in VMEM, the twin below transposes once).
            # one_hot_cls only off the fused path (the kernel builds
            # the one-hot on the fly). out_axes=1 on the box output
            # keeps nb leading across the vmap.
            snap_kw = dict(size=size_px, stride=stride, anchor_table=table,
                           num_classes=self.classes,
                           anchor_ious=self.anchor_ious, flat=True,
                           one_hot_cls=not use_fused)
            if self.rotated_bbox:
                # batched form: real lax.cond skipping of padding slots
                # and out-of-band targets (vmap would select-ify it)
                cls_t, box_t, depth = snap_to_anchors_rotated_batched(
                    targets.astype(jnp.float32), **snap_kw)
            else:
                cls_t, box_t, depth = jax.vmap(
                    partial(snap_to_anchors, **snap_kw),
                    out_axes=(0, 1, 0))(targets.astype(jnp.float32))

            b = cls_head.shape[0]
            fg = depth > 0
            fg_counts.append(jnp.maximum(fg.sum(), 1).astype(jnp.float32))

            if use_fused:
                c_sum, b_sum = detection_loss_sums_fused(
                    cls_head, box_head, cls_t.astype(jnp.float32), box_t,
                    depth, classes=self.classes, mesh=self._loss_mesh)
                cls_losses.append(c_sum)
                box_losses.append(b_sum)
            else:
                # flat form is [B, HW, A*nb]/[B, HW, A]; view as [B, N, ...]
                cls_p = cls_head.reshape(b, -1, self.classes)
                cls_mask = (depth >= 0).reshape(b, -1)[..., None]
                cls_losses.append(
                    (focal_loss(cls_p, cls_t) * cls_mask).sum())
                box_p = box_head.reshape(b, -1, self.box_size)
                box_mask = fg.reshape(b, -1)[..., None]
                # planar [nb, B, HW, A] -> interleaved [B, N, nb]
                box_ti = jnp.transpose(box_t, (1, 2, 3, 0)).reshape(
                    b, -1, self.box_size)
                box_losses.append(
                    (smooth_l1_loss(box_p, box_ti) * box_mask).sum())

        fg_total = jnp.stack(fg_counts).sum()
        cls_loss = jnp.stack(cls_losses).sum() / fg_total
        box_loss = jnp.stack(box_losses).sum() / fg_total
        return cls_loss, box_loss

    # ------------------------------------------------------------ inference
    def inference_fn(self, variables, images):
        """Full post-processed inference: (scores, boxes, classes).

        The whole pipeline — backbone, heads, sigmoid, per-level decode,
        concat, NMS — is one jittable graph (the TPU-native equivalent
        of the reference's TRT engine with spliced Decode/NMS plugins,
        engine.cpp:141-188).
        """
        cls_heads, box_heads = self.module.apply(variables, images)
        strides = [images.shape[2] // ch.shape[2] for ch in cls_heads]
        tables = [self.anchors(s) for s in strides]
        if self.rotated_bbox:
            tables = [t[0] for t in tables]
        if self.decode_fused:
            scores, boxes, classes = decode_fused(
                cls_heads, box_heads, strides, tables,
                threshold=self.threshold, top_n=self.top_n,
                rotated=self.rotated_bbox, from_logits=True,
                total_top_n=self.fused_top_n)
        else:
            decoded = [decode(
                ch, bh.astype(jnp.float32), stride,
                threshold=self.threshold, top_n=self.top_n,
                anchors=table, rotated=self.rotated_bbox, from_logits=True)
                for ch, bh, stride, table in zip(cls_heads, box_heads,
                                                 strides, tables)]
            scores = jnp.concatenate([d[0] for d in decoded], axis=1)
            boxes = jnp.concatenate([d[1] for d in decoded], axis=1)
            classes = jnp.concatenate([d[2] for d in decoded], axis=1)
        nms_fn = nms_rotated if self.rotated_bbox else nms
        return nms_fn(scores, boxes, classes, self.nms, self.detections)

    def heads_fn(self, variables, images):
        """Raw (sigmoid scores, boxes) per level — the export graph
        (model.py:142-144)."""
        cls_heads, box_heads = self.module.apply(variables, images)
        return ([jax.nn.sigmoid(c.astype(jnp.float32)) for c in cls_heads],
                [b.astype(jnp.float32) for b in box_heads])

    def inference_fn_u8(self, variables, images_u8, sizes):
        """inference_fn on the transfer-thin u8 eval feed: raw pixels
        cross the host->device link (4x fewer bytes than f32 — see
        ops/color.py) and the constant ImageNet normalization + pad
        masking run in-graph."""
        from .ops.color import eval_normalize_u8
        return self.inference_fn(variables,
                                 eval_normalize_u8(images_u8, sizes))

    def inference_fn_yuv(self, variables, y_u8, cbcr_u8, sizes):
        """inference_fn on the yuv420 eval feed (1.5 B/px): plane
        assembly + constant normalize with YCbCr->RGB folded, in-graph."""
        from .ops.color import eval_normalize_yuv
        return self.inference_fn(variables,
                                 eval_normalize_yuv(y_u8, cbcr_u8, sizes))

    def jitted_inference_fn(self, mesh=None, u8=False, feed=None):
        """inference_fn jitted once per (dtype, mesh, feed) and cached.

        Periodic validation inside training calls infer() every
        val_iters; without this cache each call would re-trace the
        whole pipeline (jax.jit caches keyed on the function OBJECT,
        and a fresh jit wrapper never hits it).
        """
        from .parallel import batch_sharding, replicated_sharding
        feed = feed or ('u8' if u8 else 'f32')
        fn = {'f32': self.inference_fn, 'u8': self.inference_fn_u8,
              'yuv420': self.inference_fn_yuv}[feed]
        key = (self.dtype, feed,
               tuple(d.id for d in mesh.devices.flat) if mesh else None)
        if key not in self._jitted:
            self.set_spmd_mesh(mesh)
            if mesh is None:
                self._jitted[key] = jax.jit(fn)
            else:
                img_shards = {
                    'f32': (batch_sharding(mesh, 4),),
                    'u8': (batch_sharding(mesh, 4),
                           batch_sharding(mesh, 2)),
                    'yuv420': (batch_sharding(mesh, 3),
                               batch_sharding(mesh, 4),
                               batch_sharding(mesh, 2)),
                }[feed]
                self._jitted[key] = jax.jit(
                    fn,
                    in_shardings=(replicated_sharding(mesh),) + img_shards,
                    out_shardings=batch_sharding(mesh, 1))
        return self._jitted[key]

    # ------------------------------------------------------------ checkpoint
    def save(self, state):
        from .io import checkpoint as ckpt_io
        ckpt_io.save(self, state)

    @classmethod
    def load(cls, filename, rotated_bbox=False, dtype=jnp.float32):
        from .io import checkpoint as ckpt_io
        return ckpt_io.load(filename, rotated_bbox=rotated_bbox, dtype=dtype)

    # ------------------------------------------------------------ export
    def export(self, size, dynamic_batch_opts=None, precision='bf16',
               calibration_files=None, calibration_table=None,
               verbose=False, path=None, calibration_percentile=None,
               calibration_entropy=False):
        """AOT-export (reference surface: model.py:260-305)."""
        from . import export as export_mod
        return export_mod.export_model(
            self, size, precision=precision, path=path,
            dynamic_batch_opts=dynamic_batch_opts,
            calibration_files=calibration_files,
            calibration_table=calibration_table,
            calibration_percentile=calibration_percentile,
            calibration_entropy=calibration_entropy,
            verbose=verbose)
