#!/usr/bin/env python3
"""b=1 @800 end-to-end latency sweep over the reference's model family.

The reference publishes per-backbone batch-1 latency (README.md:30-35,
TensorRT FP16/INT8 on V100/T4/A100); bench.py tracks only the
ResNet50FPN headline row. This sweep produces the full comparison
table on one v5e chip: jitted forward + decode + NMS (same contract as
the reference's "inference including box post-processing").

Usage: python extras/bench_backbones.py [--out BENCH_BACKBONES.json]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# reference A100 numbers: (fp16_ms, int8_ms) from BASELINE.md
A100 = {
    'ResNet18FPN': (9.0, 7.0),
    'MobileNetV2FPN': (9.0, 7.0),
    'ResNet34FPN': (10.0, 7.0),
    'ResNet50FPN': (11.0, 8.0),
    'ResNet101FPN': (13.0, 9.0),
    'ResNet152FPN': (15.0, 10.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=os.path.join(ROOT,
                                                  'BENCH_BACKBONES.json'))
    ap.add_argument('--size', type=int, default=800)
    ap.add_argument('--backbones', nargs='+', default=list(A100))
    args = ap.parse_args()

    import numpy as np
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(ROOT, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import bench
    from odtk_tpu.model import Model

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, args.size, args.size, 3)
                      .astype(np.float32))
    results = {}
    for name in args.backbones:
        t0 = time.time()
        model = Model(backbones=name, classes=80, dtype=jnp.bfloat16)
        model.initialize(rng=0, image_size=(256, 256))
        fn = jax.jit(model.inference_fn)
        variables = jax.device_put(model.variables)
        try:
            ms = bench._retry(bench.measure, fn, variables, img,
                              label=name)
        except Exception as e:  # noqa: BLE001 — record and continue
            results[name] = {'error': str(e)[:200]}
            print(f'{name}: ERROR {str(e)[:120]}', flush=True)
            continue
        ref_fp16, ref_int8 = A100.get(name, (None, None))
        row = {'b1_e2e_ms': round(ms, 3),
               'a100_fp16_ms': ref_fp16,
               'vs_a100_fp16': round(ref_fp16 / ms, 2) if ref_fp16 else None}
        results[name] = row
        print(f'{name}: {ms:.3f} ms b=1 @{args.size} '
              f'({row["vs_a100_fp16"]}x vs A100 FP16 {ref_fp16} ms) '
              f'[{time.time() - t0:.0f}s incl. compile]', flush=True)

    with open(args.out, 'w') as f:
        json.dump({'size': args.size, 'batch': 1, 'results': results}, f,
                  indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
