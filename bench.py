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
    import os
    import jax
    import jax.numpy as jnp
    from odtk_tpu.model import Model

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

    model = Model(backbones='ResNet50FPN', classes=80, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))

    fn = jax.jit(model.inference_fn)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, SIZE[0], SIZE[1], 3), jnp.float32)

    # NOTE: block_until_ready does not synchronize over the axon tunnel,
    # so we measure amortized latency of ITERS chained dispatches with a
    # single host fetch at the end, subtracting the fetch cost (measured
    # separately). Back-to-back dispatches serialize on the device
    # stream, so this is true per-frame device latency.
    out = fn(model.variables, images)
    np.asarray(out[0])
    for _ in range(WARMUP):
        out = fn(model.variables, images)
    np.asarray(out[0])

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn(model.variables, images)
        np.asarray(o[0])
        return time.perf_counter() - t0

    k1, k2 = ITERS // 4, ITERS
    t1 = min(run(k1) for _ in range(3))
    t2 = min(run(k2) for _ in range(3))
    ms = float((t2 - t1) / (k2 - k1) * 1e3)   # fetch cost cancels
    print(json.dumps({
        'metric': 'resnet50fpn_b1_800_e2e_latency',
        'value': round(ms, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_MS / ms, 3),
    }))


if __name__ == '__main__':
    main()
