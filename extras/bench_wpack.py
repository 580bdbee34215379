#!/usr/bin/env python3
"""A/B the wpack_layer1 knob on the real chip under bench.py train
conditions (ResNet50FPN bf16, b=8 @832, same measurement protocol).

layer1's 3x3 64-ch convs fill half a 128-lane MXU tile; wpack packs
adjacent width pairs into channels (see backbones/layers.py wpack_kernel).
This script measures whether the 2x FLOPs / 4x lane-utilization trade
wins on the v5e. Prints one JSON line per variant.

Usage: python extras/bench_wpack.py [--batch 8] [--size 832] [--steps 24]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_variant(wpack, batch, size, steps):
    import jax
    import jax.numpy as jnp
    from odtk_tpu.model import Model
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh, shard_batch

    model = Model(backbones='ResNet50FPN', classes=80, dtype=jnp.bfloat16,
                  config={'wpack_layer1': wpack})
    model.initialize(rng=0, image_size=(256, 256))
    mesh = make_mesh(jax.devices()[:1])
    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1)
    params = model.variables['params']
    frozen = model.variables['frozen']
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh)

    rng = np.random.RandomState(0)
    data = rng.randn(batch, size, size, 3).astype(np.float32) * 0.5
    targets = np.full((batch, 32, 5), -1.0, np.float32)
    targets[:, :4, :2] = rng.uniform(100, 600, (batch, 4, 2))
    targets[:, :4, 2:4] = rng.uniform(40, 300, (batch, 4, 2))
    targets[:, :4, 4] = rng.randint(0, 80, (batch, 4))
    images, tgts = shard_batch(mesh, data, targets)

    def run(k, params, opt_state):
        t0 = time.perf_counter()
        for _ in range(k):
            params, opt_state, cl, bl = step(params, opt_state, frozen,
                                             images, tgts)
        float(cl)          # sync
        return time.perf_counter() - t0, params, opt_state

    _, params, opt_state = run(4, params, opt_state)       # warm
    k1, k2 = steps // 4, steps
    t1, params, opt_state = run(k1, params, opt_state)
    t2, params, opt_state = run(k2, params, opt_state)
    sec = (t2 - t1) / (k2 - k1)
    return {'wpack_layer1': wpack,
            'train_step_ms': round(sec * 1e3, 2),
            'train_im_s_per_chip': round(batch / sec, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=832)
    ap.add_argument('--steps', type=int, default=24)
    ap.add_argument('--order', default='off,on',
                    help='comma list of off/on; second run is cache-warm')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))

    for name in args.order.split(','):
        wpack = name.strip() == 'on'
        r = bench_variant(wpack, args.batch, args.size, args.steps)
        print(json.dumps(r), flush=True)


if __name__ == '__main__':
    main()
