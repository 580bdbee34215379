#!/usr/bin/env python3
"""Decompose train-step cost on the real chip: fwd, assignment, loss, full.

Usage: python extras/bench_breakdown.py [--rotated] [--batch 8] [--size 832]

Times each stage as its own jitted graph with the chained-dispatch
protocol from bench.py (block_until_ready does not sync over the axon
tunnel). Numbers are per-step milliseconds; the full train step is also
reported as im/s/chip. This is the profiling tool behind the train-
throughput work (VERDICT round-1 item 4).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, sync, warm=3, iters=12, reps=3):
    out = fn()
    sync(out)
    for _ in range(warm):
        out = fn()
    sync(out)

    def run(k):
        t0 = time.perf_counter()
        for _ in range(k):
            o = fn()
        sync(o)
        return time.perf_counter() - t0

    k1, k2 = max(1, iters // 4), iters
    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rotated', action='store_true')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=832)
    ap.add_argument('--max-det', type=int, default=32)
    ap.add_argument('--backbone', default='ResNet50FPN')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from odtk_tpu.model import Model
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh, shard_batch
    from odtk_tpu.ops import snap_to_anchors, snap_to_anchors_rotated

    model = Model(backbones=args.backbone, classes=80,
                  rotated_bbox=args.rotated, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))
    mesh = make_mesh(jax.devices()[:1])

    b, size, md = args.batch, args.size, args.max_det
    nb = 6 if args.rotated else 5
    rng = np.random.RandomState(0)
    data = rng.randn(b, size, size, 3).astype(np.float32) * 0.5
    targets = np.full((b, md, nb), -1.0, np.float32)
    targets[:, :4, :2] = rng.uniform(100, 600, (b, 4, 2))
    targets[:, :4, 2:4] = rng.uniform(40, 300, (b, 4, 2))
    if args.rotated:
        targets[:, :4, 4] = rng.uniform(-0.5, 0.5, (b, 4))
    targets[:, :4, nb - 1] = rng.randint(0, 80, (b, 4))
    images, tgts = shard_batch(mesh, data, targets)
    variables = jax.device_put(model.variables)
    params, frozen = variables['params'], variables['frozen']

    def sync_tree(out):
        np.asarray(jax.tree.leaves(out)[0])

    print(f'backbone={args.backbone} rotated={args.rotated} '
          f'b={b} size={size}')

    # 1. forward only (heads)
    fwd = jax.jit(lambda v, x: model.module.apply(v, x))
    ms = measure(lambda: fwd(variables, images), sync_tree)
    print(f'  forward (heads):       {ms:8.2f} ms')

    # 2. assignment only, all levels
    snap = snap_to_anchors_rotated if args.rotated else snap_to_anchors

    def assign_all(t):
        outs = []
        for stride in [8, 16, 32, 64, 128]:
            table = model.anchors(stride)
            outs.append(jax.vmap(partial(
                snap, size=(size, size), stride=stride, anchor_table=table,
                num_classes=80, anchor_ious=model.anchor_ious))(t))
        return outs

    asn = jax.jit(assign_all)
    ms = measure(lambda: asn(tgts.astype(jnp.float32)), sync_tree)
    print(f'  assignment (5 levels): {ms:8.2f} ms')

    for stride in [8, 16]:
        table = model.anchors(stride)
        one = jax.jit(jax.vmap(partial(
            snap, size=(size, size), stride=stride, anchor_table=table,
            num_classes=80, anchor_ious=model.anchor_ious)))
        ms = measure(lambda: one(tgts.astype(jnp.float32)), sync_tree)
        print(f'    stride {stride:3d} alone:    {ms:8.2f} ms')

    # 3. loss fwd (model.loss_fn, includes forward + assignment + loss)
    lf = jax.jit(model.loss_fn)
    ms = measure(lambda: lf(variables, images, tgts), sync_tree)
    print(f'  loss fwd (all):        {ms:8.2f} ms')

    # 4. loss fwd+bwd
    grad = jax.jit(jax.grad(
        lambda p, x, t: sum(model.loss_fn({'params': p, 'frozen': frozen},
                                          x, t))))
    ms = measure(lambda: grad(params, images, tgts), sync_tree)
    print(f'  loss fwd+bwd:          {ms:8.2f} ms')

    # 5. full train step
    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, mesh)
    state = {'p': params, 'o': opt_state}

    def full():
        state['p'], state['o'], cl, bl = step(state['p'], state['o'],
                                              frozen, images, tgts)
        return cl

    ms = measure(full, lambda o: float(o))
    print(f'  full train step:       {ms:8.2f} ms  '
          f'({b / ms * 1e3:.1f} im/s/chip)')


if __name__ == '__main__':
    main()
