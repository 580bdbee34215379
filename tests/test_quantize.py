"""Weight-quantization round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from odtk_tpu.model import Model
from odtk_tpu.quantize import (quantize_weights, dequantize_weights,
                               quantize_model)


def test_quantize_dequantize_close():
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    params = m.variables['params']
    q, meta = quantize_weights(params)
    assert meta['quantized_tensors'] > 20
    deq = dequantize_weights(q, meta, jnp.float32)
    # per-channel int8: max relative error bounded by scale/2 per elem
    k = np.asarray(params['cls_head_0']['kernel'])
    k2 = np.asarray(deq['cls_head_0']['kernel'])
    absmax = np.abs(k).reshape(-1, k.shape[-1]).max(0)
    assert np.all(np.abs(k - k2) <= absmax / 127.0 + 1e-8)


def test_quantized_model_still_infers():
    m = Model(backbones='ResNet18FPN', classes=3)
    m.initialize(rng=0, image_size=(128, 128))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 3) * 0.1,
                    jnp.float32)
    before = m.module.apply(m.variables, x)[0][0]
    stats = quantize_model(m)
    assert stats['ratio'] > 3.5          # ~4x for conv-dominated params
    after = m.module.apply(m.variables, x)[0][0]
    # int8 weight noise perturbs logits slightly, not wildly
    diff = float(jnp.abs(after - before).mean())
    assert diff < 0.2, diff
    s, b, c = m.inference_fn(m.variables, x)
    assert np.isfinite(np.asarray(s)).all()
