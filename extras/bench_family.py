#!/usr/bin/env python3
"""Sweep e2e inference latency across the backbone family + batch sizes.

Usage: python extras/bench_family.py [--backbones A B ...]
       [--batches 1] [--size 800]

Produces the README "Performance" table rows: b=1 per-backbone latency
and ResNet50FPN batched serving throughput, all with decode+NMS in the
graph. Chained-dispatch timing (see bench.py for why).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_infer_breakdown import measure  # noqa: E402

FAMILY = ['ResNet18FPN', 'MobileNetV2FPN', 'ResNet34FPN', 'ResNet50FPN',
          'ResNet101FPN', 'ResNet152FPN']


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--backbones', nargs='+', default=FAMILY)
    ap.add_argument('--batches', type=int, nargs='+', default=[1])
    ap.add_argument('--size', type=int, default=800)
    ap.add_argument('--rotated', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from odtk_tpu.model import Model

    rng = np.random.RandomState(0)
    for name in args.backbones:
        model = Model(backbones=name, classes=80, dtype=jnp.bfloat16,
                      rotated_bbox=args.rotated)
        model.initialize(rng=0, image_size=(256, 256))
        variables = jax.device_put(model.variables)
        fn = jax.jit(model.inference_fn)
        for b in args.batches:
            images = jnp.asarray(
                rng.randn(b, args.size, args.size, 3), jnp.float32)
            ms = measure(lambda: fn(variables, images),
                         lambda o: np.asarray(o[0]))
            print(f'{name:16s} b={b:<3d} @{args.size}: {ms:8.3f} ms '
                  f'({b / ms * 1e3:7.1f} im/s)', flush=True)


if __name__ == '__main__':
    main()
