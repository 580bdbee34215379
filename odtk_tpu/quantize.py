"""Post-training INT8 quantization: calibration, int8 weights, MXU execution.

The reference's INT8 deployment is TensorRT entropy calibration feeding
an int8 engine (csrc/calibrator.h:107-168, engine.cpp:130-139). The TPU
equivalent here:

  * ``capture_activation_absmax`` — a calibration pass over images that
    records each conv layer's input absmax (flax method interception +
    ``sow``, jit-compatible), aggregated across the calibration set and
    persisted as a reusable table by export.calibrate (the
    Int8CalibrationTable flow).
  * ``build_quant_variables`` — converts a model's variables into the
    int8 engine form: conv kernels stored as int8 with per-output-
    channel scales plus a ``quant`` collection carrying
    ``act_scale``/``w_scale`` per layer. QuantConv
    (backbones/layers.py) then executes real int8 convolutions on the
    MXU with int32 accumulation. The engine payload serializes the int8
    kernels directly — ~4x smaller than fp32 and half the bf16 weight
    HBM traffic.
  * ``quantize_weights``/``dequantize_weights`` — storage-only helpers
    (int8 + scales round trip, no activation quantization), used for
    size accounting and the fake-quant ``quantize_model`` experiment
    path.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _quantize_kernel(arr):
    """Symmetric per-output-channel int8: [kh, kw, I, O] -> (q, scale[O])."""
    arr = np.asarray(arr)
    absmax = np.abs(arr).reshape(-1, arr.shape[-1]).max(0)
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


# ------------------------------------------------------------- calibration

def capture_activation_absmax(model, images, percentile=None):
    """Per-conv-layer input clipping range for one batch: nested dict
    mirroring the module tree with ``in_absmax`` leaves (fp32 scalars).

    Uses flax method interception to sow each QuantConv's INPUT range —
    the quantity the int8 path needs (TRT calibrates the same tensor
    set: every layer input, calibrator.h:120-128).

    percentile=None records the exact absmax (clip-free, conservative —
    one outlier element stretches the whole int8 grid). A percentile
    (e.g. 99.9) records that percentile of |input| instead: the
    outlier-robust middle ground toward TRT's entropy calibration
    (IInt8EntropyCalibrator2, calibrator.h:107-168) — values above the
    threshold saturate, everything else gets a finer grid. Across
    calibration images both variants merge by running max
    (merge_absmax), so a percentile clips within-image outliers while
    still covering the whole calibration set.
    """
    from .backbones.layers import QuantConv

    def stat(x):
        a = jnp.abs(x.astype(jnp.float32))
        if percentile is None:
            return jnp.max(a)
        return jnp.percentile(a.ravel(), percentile)

    def interceptor(next_fun, args, kwargs, context):
        if (context.method_name == '__call__'
                and isinstance(context.module, QuantConv)):
            context.module.sow(
                'calib', 'in_absmax', stat(args[0]),
                reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0))
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(variables, images):
        with nn.intercept_methods(interceptor):
            _, col = model.module.apply(variables, images,
                                        mutable=['calib'])
        return col['calib']

    return jax.device_get(run(model.variables, images))


def _flatten(calib_tree, leaf_name, to=float):
    """Nested calib tree -> {'a/b/c': value} (JSON-friendly table body)."""
    out = {}

    def walk(node, path):
        for k, v in node.items():
            if k == leaf_name:
                out['/'.join(path)] = to(np.asarray(v))
            else:
                walk(v, path + [k])

    walk(calib_tree, [])
    return out


def flatten_absmax(calib_tree):
    return _flatten(calib_tree, 'in_absmax')


def merge_absmax(a, b):
    """Running max of two flat absmax tables."""
    return {k: max(a.get(k, 0.0), b.get(k, 0.0)) for k in set(a) | set(b)}


# --------------------------------------------- entropy (KL) calibration

HIST_BINS = 2048      # raw |input| histogram resolution (calibrator.h
                      # keeps TRT's default 2048-bin legacy histogram)
QUANT_BINS = 128      # int8 positive levels


def capture_activation_hist(model, images, absmax, nbins=HIST_BINS):
    """Histogram of |input| per QuantConv for one batch: nested dict
    with ``in_hist`` leaves ([nbins] fp32 counts over [0, absmax]).

    Second pass of entropy calibration (first pass =
    capture_activation_absmax fixes each layer's histogram span, so
    counts from every calibration image land in comparable bins —
    the same two-phase shape as TRT's histogram calibrators). Counts
    merge across batches by addition (sow reduce_fn), and across
    images by merge_hist."""
    from .backbones.layers import QuantConv

    def interceptor(next_fun, args, kwargs, context):
        if (context.method_name == '__call__'
                and isinstance(context.module, QuantConv)):
            key = '/'.join(context.module.path)
            amax = float(absmax.get(key, 0.0))
            if amax > 0.0:
                a = jnp.abs(args[0].astype(jnp.float32)).ravel()
                idx = jnp.clip((a * (nbins / amax)).astype(jnp.int32),
                               0, nbins - 1)
                counts = jnp.zeros((nbins,), jnp.float32).at[idx].add(1.0)
                context.module.sow(
                    'calib', 'in_hist', counts, reduce_fn=jnp.add,
                    init_fn=lambda: jnp.zeros((nbins,), jnp.float32))
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(variables, images):
        with nn.intercept_methods(interceptor):
            _, col = model.module.apply(variables, images,
                                        mutable=['calib'])
        return col['calib']

    return jax.device_get(run(model.variables, images))


def flatten_hist(calib_tree):
    return _flatten(calib_tree, 'in_hist',
                    to=lambda a: np.asarray(a, np.float64))


def merge_hist(a, b):
    """Elementwise-add two flat histogram tables."""
    out = dict(a)
    for k, v in b.items():
        out[k] = out[k] + v if k in out else v
    return out


def entropy_threshold(hist, bin_width, target_bins=QUANT_BINS):
    """KL-optimal clipping threshold for one layer's |input| histogram —
    the TRT IInt8EntropyCalibrator2 selection rule (calibrator.h:107-168;
    NVIDIA's published 8-bit KL-calibration sweep): for every candidate
    clip point i >= target_bins, fold the outlier mass into the last
    kept bin (P), resample the kept bins to target_bins int8 levels and
    expand back over P's support (Q), and keep the i minimizing
    KL(P||Q). Returns the threshold in input units (i * bin_width)."""
    hist = np.asarray(hist, np.float64)
    n = len(hist)
    total = hist.sum()
    if total <= 0 or n <= target_bins:
        return n * bin_width
    best_kl, best_i = np.inf, n
    nz = hist > 0
    for i in range(target_bins, n + 1):
        p = hist[:i].copy()
        p[i - 1] += hist[i:].sum()          # clip: outliers -> edge bin
        psum = p.sum()
        if psum <= 0:
            continue
        group = np.arange(i) * target_bins // i
        q_counts = np.bincount(group, weights=hist[:i],
                               minlength=target_bins)
        nz_per_group = np.bincount(group, weights=nz[:i].astype(np.float64),
                                   minlength=target_bins)
        # expand each quantized level uniformly over its nonzero support
        expand = np.zeros(i)
        support = nz[:i] & (nz_per_group[group] > 0)
        ratio = np.divide(q_counts[group], nz_per_group[group],
                          out=np.zeros(i), where=nz_per_group[group] > 0)
        expand[support] = ratio[support]
        mask = p > 0
        if (expand[mask] == 0).any():
            # P has mass where Q has none (outliers folded onto an
            # empty edge bin): infinite KL, skip this clip point
            continue
        pm, qm = p[mask] / psum, expand[mask] / expand.sum()
        kl = float(np.sum(pm * np.log(pm / qm)))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return best_i * bin_width


def entropy_thresholds(hist_table, absmax_table, nbins=HIST_BINS):
    """Per-layer KL thresholds: {'path': threshold} in input units."""
    out = {}
    for key, amax in absmax_table.items():
        hist = hist_table.get(key)
        if hist is None or amax <= 0:
            out[key] = amax
        else:
            out[key] = float(entropy_threshold(hist, amax / nbins))
    return out


# ------------------------------------------------------- engine variables

def build_quant_variables(variables, act_absmax, mode='w8a16'):
    """Variables pytree -> int8 engine form.

    Returns (qvariables, stats): ``qvariables`` is a copy of
    ``variables`` where every conv kernel with a calibrated activation
    range becomes int8, plus a ``quant`` collection carrying per-layer
    scales at the same tree path. QuantConv consumes this directly —
    no dequantized fp32 copy of the weights ever exists in the engine.

    mode='w8a16' (default): quant carries only ``w_scale`` ([O],
    per-channel); QuantConv dequantizes the int8 kernel in-graph and
    computes in bf16 — 4x smaller engine and weight HBM traffic at
    bf16 speed. mode='w8a8': also stores ``act_scale`` (scalar fp32,
    absmax/127), switching QuantConv to full int8 convolution —
    measured slower than bf16 through XLA's current TPU conv lowering,
    kept for generations where int8 convs hit the MXU fast path.
    """
    params = variables['params']
    quant = {}
    n_q, fp_bytes, q_bytes = 0, 0, 0

    def walk(node, path):
        nonlocal n_q, fp_bytes, q_bytes
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                sub, qsub = walk(v, path + [k])
                out[k] = sub
                if qsub:
                    _set_nested(quant, path + [k], qsub)
            else:
                arr = np.asarray(v)
                out[k] = arr
        kernel = out.get('kernel')
        key = '/'.join(path)
        if (kernel is not None and np.ndim(kernel) == 4
                and key in act_absmax):
            q, w_scale = _quantize_kernel(kernel)
            fp_bytes += kernel.nbytes
            q_bytes += q.nbytes + w_scale.nbytes
            out['kernel'] = q
            n_q += 1
            scales = {'w_scale': w_scale}
            if mode == 'w8a8':
                scales['act_scale'] = np.float32(
                    max(act_absmax[key], 1e-8) / 127.0)
            return out, scales
        return out, None

    qparams, _ = walk(params, [])
    qvariables = {k: v for k, v in variables.items() if k != 'params'}
    qvariables['params'] = qparams
    qvariables['quant'] = quant
    stats = {'quantized_tensors': n_q, 'fp32_bytes': int(fp_bytes),
             'int8_bytes': int(q_bytes),
             'ratio': fp_bytes / max(q_bytes, 1)}
    return qvariables, stats


def _set_nested(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# ------------------------------------------------- storage-only helpers

def quantize_weights(params, skip_substrings=('bn', 'frozen')):
    """params pytree -> (int8 pytree with scales, meta). Storage form:
    conv kernels [kh, kw, I, O] as int8 with per-O-channel scales;
    biases and 1-D tensors stay fp32."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    n_q = 0
    for path, leaf in flat:
        key = '/'.join(str(p.key) if hasattr(p, 'key') else str(p)
                       for p in path)
        arr = np.asarray(leaf)
        if arr.ndim == 4 and not any(s in key for s in skip_substrings):
            q, scale = _quantize_kernel(arr)
            out[key] = {'q': q, 'scale': scale}
            n_q += 1
        else:
            out[key] = arr
    return out, {'quantized_tensors': n_q, 'treedef': treedef}


def dequantize_weights(qparams, meta, dtype=jnp.bfloat16):
    """Inverse of quantize_weights -> params pytree in compute dtype."""
    leaves = []
    for key in qparams:
        v = qparams[key]
        if isinstance(v, dict) and 'q' in v:
            leaves.append((jnp.asarray(v['q'], dtype)
                           * jnp.asarray(v['scale'], dtype)))
        else:
            leaves.append(jnp.asarray(v))
    return jax.tree_util.tree_unflatten(meta['treedef'], leaves)


def quantize_model(model):
    """FAKE-quant experiment path: in-place weight quantize+dequantize
    round trip on a Model, leaving fp32 weights carrying int8 rounding
    noise — useful to isolate weight-quantization accuracy impact from
    activation quantization. Real int8 engines use
    build_quant_variables instead. Returns size statistics."""
    params = model.variables['params']
    qparams, meta = quantize_weights(params)
    model.variables['params'] = jax.tree.map(
        np.asarray, dequantize_weights(qparams, meta, jnp.float32))
    raw = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
    comp = sum((v['q'].nbytes + v['scale'].nbytes)
               if isinstance(v, dict) and 'q' in v else v.nbytes
               for v in qparams.values())
    return {'fp32_bytes': int(raw), 'int8_bytes': int(comp),
            'ratio': raw / comp, **{k: v for k, v in meta.items()
                                    if k != 'treedef'}}
