#!/usr/bin/env python3
"""Benchmark: ResNet50FPN batch-1 end-to-end inference latency on one chip.

Mirrors the reference's headline inference benchmark conditions
(README.md:26-33, BASELINE.md): batch 1, resize 800, post-processing
(decode+NMS) INCLUDED, half precision. Baseline to beat: 11 ms on
A100 FP16 (ResNet50FPN row). The whole pipeline is one jitted XLA
graph; we time steady-state wall clock with device sync.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_MS = 11.0   # ResNet50FPN A100 FP16 b=1 (BASELINE.md)
SIZE = (800, 800)
WARMUP = 5
ITERS = 30


def main():
    import jax
    import jax.numpy as jnp
    from odtk_tpu.model import Model

    model = Model(backbones='ResNet50FPN', classes=80, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))

    fn = jax.jit(model.inference_fn)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, SIZE[0], SIZE[1], 3), jnp.float32)

    out = fn(model.variables, images)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(fn(model.variables, images))

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(model.variables, images))
        times.append(time.perf_counter() - t0)

    ms = float(np.median(times) * 1e3)
    print(json.dumps({
        'metric': 'resnet50fpn_b1_800_e2e_latency',
        'value': round(ms, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_MS / ms, 3),
    }))


if __name__ == '__main__':
    main()
