"""Deployment export: AOT-compiled inference engines + StableHLO interchange.

TPU-native replacement for the reference's ONNX -> TensorRT flow
(odtk/model.py:260-305, csrc/engine.cpp): on TPU the "engine with
spliced Decode/NMS plugins" collapses into ONE jitted function whose
graph already contains decode+NMS (engine.cpp:141-188 becomes
Model.inference_fn), serialized with jax.export. The Engine class
mirrors the odtk::Engine runner surface (csrc/engine.h:39-81):
load/save, fixed input size, batch profiles, __call__ on raw batches.

Interchange parity: a ``.stablehlo`` target emits portable StableHLO
bytecode (the ONNX-equivalent artifact, model.py:274-288); anything
else writes a self-contained engine package (msgpack: metadata +
serialized executables per batch profile).

INT8 PTQ: ``calibrate`` runs a scale-capture pass over calibration
images and persists a reusable table (the Int8EntropyCalibrator
equivalent, csrc/calibrator.h:107-168).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

ENGINE_MAGIC = 'odtk-tpu-engine-v1'


def _aot_export(model, size, batch, platforms=None):
    """jax.export an inference function at fixed [batch, H, W, 3]."""
    from jax import export as jexport

    def fn(variables, images):
        return model.inference_fn(variables, images)

    spec_vars = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype
                                       if hasattr(x, 'dtype') else jnp.float32),
        model.variables)
    spec_img = jax.ShapeDtypeStruct((batch, size[0], size[1], 3),
                                    jnp.float32)
    kwargs = {}
    if platforms:
        kwargs['platforms'] = list(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(spec_vars, spec_img)
    return exported.serialize()


def export_model(model, size, batch=1, precision='bf16', path=None,
                 dynamic_batch_opts=None, calibration_files=None,
                 calibration_table=None, calibration_percentile=None,
                 calibration_entropy=False, platforms=None, verbose=False):
    """Export a Model to an Engine package (or StableHLO).

    size: (H, W) fixed input size. dynamic_batch_opts: (min, opt, max)
    batch profiles — each gets its own compiled executable, mirroring
    the TRT optimization profile (engine.cpp:110-128).
    """
    if isinstance(size, int):
        size = (size, size)
    if len(size) == 1:
        size = (size[0], size[0])
    # engines must take stride-aligned inputs: the model's FPN levels
    # assume H, W divisible by the max stride, and the loader pads every
    # image up to that multiple (coco.py stride padding) — an unaligned
    # engine size would reject its own loader's batches
    aligned = tuple(-(-s // model.stride) * model.stride for s in size)
    if aligned != tuple(size):
        print(f'rounding engine size {tuple(size)} up to stride-aligned '
              f'{aligned} (model stride {model.stride})')
        size = aligned
    # engines are single-device executables: a train-then-export in one
    # process would otherwise bake a shard_map over the (stale) training
    # mesh into the serialized graph
    model.set_spmd_mesh(None)
    if getattr(model, 'wpack_auto', False):
        model.set_wpack_layer1(False)   # auto policy: unpacked for serving
    if precision in ('bf16', 'FP16'):
        model.set_dtype(jnp.bfloat16)
    elif precision in ('fp32', 'FP32'):
        model.set_dtype(jnp.float32)

    scale_table = None
    if precision in ('int8', 'INT8'):
        model.set_dtype(jnp.bfloat16)
        scale_table = calibrate(model, size, calibration_files,
                                calibration_table,
                                percentile=calibration_percentile,
                                entropy=calibration_entropy,
                                verbose=verbose)
        from .quantize import build_quant_variables
        model.variables, qstats = build_quant_variables(
            model.variables, scale_table['act_absmax'])
        if verbose:
            print('int8: {} conv kernels stored as int8 ({:.2f}x smaller '
                  'weights), activations quantized per calibrated layer '
                  'scale'.format(qstats['quantized_tensors'],
                                 qstats['ratio']))

    batches = sorted(set(dynamic_batch_opts or [batch]))

    if path and path.endswith('.stablehlo'):
        lowered = jax.jit(model.inference_fn).lower(
            jax.tree.map(np.asarray, model.variables),
            jnp.zeros((batches[-1], size[0], size[1], 3), jnp.float32))
        text = lowered.as_text()
        with open(path, 'w') as f:
            f.write(text)
        return path

    meta = {
        'magic': ENGINE_MAGIC,
        'input_size': list(size),
        'batches': batches,
        'precision': precision,
        'stride': model.stride,
        'rotated': model.rotated_bbox,
        'detections': model.detections,
        'classes': model.classes,
        'backbones': model.backbones,
        'preprocessing': {'mean': [0.485, 0.456, 0.406],
                          'std': [0.229, 0.224, 0.225],
                          'layout': 'NHWC', 'range': '[0,1]'},
    }
    blobs = {}
    for b in batches:
        if verbose:
            print(f'Compiling batch profile {b}...')
        blobs[str(b)] = _aot_export(model, size, b, platforms)

    engine = Engine(meta, blobs, variables=model.variables,
                    scale_table=scale_table)
    if path:
        engine.save(path)
    return engine


def calibrate(model, size, calibration_files, calibration_table=None,
              batches=2, percentile=None, entropy=False, verbose=False):
    """INT8 PTQ calibration: per-conv-layer input ranges over
    calibration images, persisted as a reusable named table
    (the Int8EntropyCalibrator cache behavior, calibrator.h:130-156).

    Three methods for each layer's clipping threshold:
      * absmax (percentile=None) — exact |input| max, clip-free and
        conservative (one outlier stretches the whole int8 grid);
      * percentile=99.9 — that percentile of |input| per image,
        max-merged across the set: outlier-robust middle ground;
      * entropy=True — TRT's IInt8EntropyCalibrator2 rule
        (calibrator.h:107-168): two passes, first absmax to fix each
        layer's histogram span, then 2048-bin |input| histograms
        accumulated across the whole calibration set, and the KL-
        divergence-minimizing clip point per layer.
    The table body maps each conv layer's module path to its clipping
    threshold; engine build turns these into int8 activation scales
    (quantize.build_quant_variables)."""
    name = '_'.join(model.backbones)
    suffix = '_entropy' if entropy else (
        f'_p{percentile:g}' if percentile is not None else '')
    table_name = (calibration_table or
                  f'Int8CalibrationTable_{name}{size[0]}x{size[1]}'
                  f'_{batches}{suffix}')
    if os.path.isfile(table_name):
        if verbose:
            print(f'Reading calibration table {table_name}')
        with open(table_name) as f:
            return json.load(f)

    from PIL import Image
    from .data.coco import IMAGENET_MEAN, IMAGENET_STD
    from .quantize import (capture_activation_absmax, flatten_absmax,
                           merge_absmax)
    files = list(calibration_files or [])[:batches * 8]
    if not files:
        raise RuntimeError('No calibration images found')
    arrays, absmax = [], {}
    for fp in files:
        im = Image.open(fp).convert('RGB').resize((size[1], size[0]),
                                                  Image.BILINEAR)
        arr = (np.asarray(im, np.float32) / 255.0 - IMAGENET_MEAN) \
            / IMAGENET_STD
        arrays.append(arr)
        tree = capture_activation_absmax(
            model, jnp.asarray(arr[None]),
            percentile=None if entropy else percentile)
        absmax = merge_absmax(absmax, flatten_absmax(tree))
    method = 'absmax' if percentile is None else f'percentile{percentile:g}'
    if entropy:
        from .quantize import (capture_activation_hist, flatten_hist,
                               merge_hist, entropy_thresholds)
        hists = {}
        for arr in arrays:
            tree = capture_activation_hist(model, jnp.asarray(arr[None]),
                                           absmax)
            hists = merge_hist(hists, flatten_hist(tree))
        absmax = entropy_thresholds(hists, absmax)
        method = 'entropy'
    table = {'version': 2, 'net': name, 'size': list(size),
             'method': method,
             'act_absmax': absmax}
    with open(table_name, 'w') as f:
        json.dump(table, f)
    if verbose:
        print(f'Wrote calibration table {table_name} '
              f'({len(absmax)} layers)')
    return table


def export_cpp_engine(model, size, batch=1, path='model.cppengine',
                      precision='bf16', platform='tpu',
                      input_format='f32', verbose=False):
    """Write a self-contained C++ engine (extras/cppapi consumable).

    Unlike the Python Engine package, weights are baked into the
    StableHLO module as constants, so the C++ runtime feeds a single
    image tensor — the same self-containment property as a serialized
    TRT plan (csrc/engine.cpp:190-199). Format documented in
    extras/cppapi/odtk_pjrt.h.

    input_format='u8': the engine takes raw RGB uint8 (letterboxed,
    black-padded) and normalizes in-graph — 4x fewer host->device
    bytes per frame, and the C++ preprocess is a plain byte paste.
    NB the f32 contract pads with normalized zeros (mean gray) while
    u8 pads black (the standard letterbox fill; same as DALI's raw
    zero padding through the reference's normalize).
    """
    from jax import export as jexport
    from jax._src.lib import xla_client

    if isinstance(size, int):
        size = (size, size)
    size = tuple(-(-s // model.stride) * model.stride for s in size)
    model.set_spmd_mesh(None)    # never bake a stale training mesh
    if getattr(model, 'wpack_auto', False):
        model.set_wpack_layer1(False)   # auto policy: unpacked for serving
    if precision in ('bf16', 'FP16'):
        model.set_dtype(jnp.bfloat16)

    const_vars = jax.tree.map(jnp.asarray, model.variables)
    u8_in = input_format == 'u8'

    def fn(images):
        if u8_in:
            from .ops.color import IMAGENET_MEAN, IMAGENET_STD
            images = (images.astype(jnp.float32) / 255.0
                      - IMAGENET_MEAN) / IMAGENET_STD
        scores, boxes, classes = model.inference_fn(const_vars, images)
        # rank-2 outputs transfer dense row-major through every PJRT
        # plugin; rank-3 may come back in device-tiled layout
        return scores, boxes.reshape(boxes.shape[0], -1), classes

    spec = jax.ShapeDtypeStruct((batch, size[0], size[1], 3),
                                jnp.uint8 if u8_in else jnp.float32)
    if verbose:
        print(f'Lowering (platform={platform}, batch={batch}, '
              f'size={size})...')
    exported = jexport.export(jax.jit(fn), platforms=[platform])(spec)
    prog = exported.mlir_module_serialized
    copts = xla_client.CompileOptions().SerializeAsString()

    meta = json.dumps({
        'height': size[0], 'width': size[1], 'batch': batch,
        'detections': model.detections,
        'box_dim': 6 if model.rotated_bbox else 4,
        'stride': model.stride, 'classes': model.classes,
        'backbones': '+'.join(model.backbones), 'precision': precision,
        'input': input_format,
    }).encode()

    import struct
    with open(path + '.tmp', 'wb') as f:
        f.write(b'ODTKCPP1')
        f.write(struct.pack('<I', len(meta)))
        f.write(meta)
        f.write(struct.pack('<Q', len(prog)))
        f.write(prog)
        f.write(struct.pack('<Q', len(copts)))
        f.write(copts)
    os.replace(path + '.tmp', path)
    if verbose:
        print(f'Wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)')
    return path


class Engine:
    """AOT inference engine: the odtk::Engine equivalent.

    __call__(images [B, H, W, 3] float32) -> (scores, boxes, classes)
    numpy arrays. Batches are padded up to the nearest compiled profile
    (extensions.cpp:160-181 pad-and-run behavior).
    """

    def __init__(self, meta, blobs, variables=None, scale_table=None):
        self.meta = meta
        self.blobs = blobs
        self.scale_table = scale_table
        self._variables = (jax.tree.map(np.asarray, variables)
                           if variables is not None else None)
        self._device_variables = None    # device_put once, lazily
        self._fns = {}

    # --------------------------------------------------------------- props
    @property
    def input_size(self):
        return tuple(self.meta['input_size'])

    @property
    def stride(self):
        return self.meta['stride']

    @property
    def max_batch(self):
        return max(self.meta['batches'])

    @property
    def max_detections(self):
        return self.meta['detections']

    # ----------------------------------------------------------------- io
    def save(self, path):
        payload = {
            'meta': json.dumps(self.meta),
            'blobs': {k: np.frombuffer(v, np.uint8)
                      for k, v in self.blobs.items()},
            'variables': serialization.to_state_dict(
                jax.tree.map(np.asarray, self._variables)),
        }
        if self.scale_table is not None:
            payload['scale_table'] = json.dumps(self.scale_table)
        blob = serialization.msgpack_serialize(payload)
        tmp = path + '.tmp'
        with open(tmp, 'wb') as f:
            f.write(blob)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path):
        with open(path, 'rb') as f:
            payload = serialization.msgpack_restore(f.read())
        meta = json.loads(payload['meta'])
        if meta.get('magic') != ENGINE_MAGIC:
            raise ValueError(f'{path} is not an odtk-tpu engine')
        blobs = {k: bytes(bytearray(np.asarray(v)))
                 for k, v in payload['blobs'].items()}
        scale_table = (json.loads(payload['scale_table'])
                       if 'scale_table' in payload else None)
        return cls(meta, blobs, variables=payload.get('variables'),
                   scale_table=scale_table)

    # ---------------------------------------------------------------- run
    def _fn(self, batch):
        key = str(batch)
        if key not in self._fns:
            from jax import export as jexport
            exported = jexport.deserialize(bytearray(self.blobs[key]))
            self._fns[key] = exported.call
        return self._fns[key]

    def __call__(self, images):
        images = np.asarray(images, np.float32)
        b = images.shape[0]
        profiles = sorted(int(x) for x in self.blobs)
        if b > profiles[-1]:
            # batch exceeds the largest compiled profile: run
            # profile-sized sub-batches and concatenate (the reference
            # runner's chunking behavior, csrc/extensions.cpp:160-181)
            step = profiles[-1]
            parts = [self(images[i:i + step]) for i in range(0, b, step)]
            return tuple(np.concatenate(p, axis=0) for p in zip(*parts))
        target = next(p for p in profiles if p >= b)
        th, tw = self.input_size
        padded = np.zeros((target, th, tw, 3), np.float32)
        padded[:b, :images.shape[1], :images.shape[2]] = \
            images[:, :th, :tw]
        if self._device_variables is None:
            # one-time weight upload — passing host numpy arrays would
            # re-transfer every weight on every call
            self._device_variables = jax.device_put(self._variables)
        out = self._fn(target)(self._device_variables, padded)
        scores, boxes, classes = (np.asarray(o)[:b] for o in out)
        return scores, boxes, classes
