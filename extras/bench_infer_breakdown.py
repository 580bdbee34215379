#!/usr/bin/env python3
"""Decompose b=1 inference latency on the real chip: heads, decode, NMS.

Usage: python extras/bench_infer_breakdown.py [--batch 1] [--size 800]
       [--backbone ResNet50FPN] [--rotated]

Each stage is timed as its own jitted graph with the chained-dispatch
protocol from bench.py (block_until_ready does not sync over the axon
tunnel). Stage inputs are materialized on device first, so each number
isolates that stage's compute. The sum of stages slightly exceeds the
fused e2e number because the full graph overlaps/fuses across stage
boundaries.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, sync, warm=5, iters=30, reps=3):
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
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--size', type=int, default=800)
    ap.add_argument('--backbone', default='ResNet50FPN')
    ap.add_argument('--rotated', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from odtk_tpu.model import Model
    from odtk_tpu.ops import decode, nms, nms_rotated

    model = Model(backbones=args.backbone, classes=80,
                  rotated_bbox=args.rotated, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))
    variables = jax.device_put(model.variables)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randn(args.batch, args.size, args.size, 3), jnp.float32)

    def sync_tree(out):
        np.asarray(jax.tree.leaves(out)[0])

    print(f'backbone={args.backbone} b={args.batch} size={args.size} '
          f'rotated={args.rotated}')

    # 1. backbone + heads (raw logits)
    fwd = jax.jit(lambda v, x: model.module.apply(v, x))
    ms = measure(lambda: fwd(variables, images), sync_tree)
    print(f'  backbone+heads:        {ms:8.3f} ms')

    heads = jax.device_put(jax.tree.map(np.asarray, fwd(variables, images)))
    cls_heads, box_heads = heads

    # 2. decode, all levels (from on-device logits)
    def decode_all(cls_hs, box_hs):
        outs = []
        for ch, bh in zip(cls_hs, box_hs):
            stride = args.size // ch.shape[2]
            table = model.anchors(stride)
            anchor_table = table[0] if args.rotated else table
            outs.append(decode(ch, bh.astype(jnp.float32), stride,
                               threshold=model.threshold, top_n=model.top_n,
                               anchors=anchor_table, rotated=args.rotated,
                               from_logits=True))
        return (jnp.concatenate([o[0] for o in outs], axis=1),
                jnp.concatenate([o[1] for o in outs], axis=1),
                jnp.concatenate([o[2] for o in outs], axis=1))

    dec = jax.jit(decode_all)
    ms = measure(lambda: dec(cls_heads, box_heads), sync_tree)
    print(f'  decode (all levels):   {ms:8.3f} ms')

    # 2b. each level alone
    for ch, bh in zip(cls_heads, box_heads):
        stride = args.size // ch.shape[2]
        table = model.anchors(stride)
        anchor_table = table[0] if args.rotated else table
        one = jax.jit(lambda c, b, s=stride, t=anchor_table: decode(
            c, b.astype(jnp.float32), s, threshold=model.threshold,
            top_n=model.top_n, anchors=t, rotated=args.rotated,
            from_logits=True))
        ms = measure(lambda: one(ch, bh), sync_tree)
        print(f'    stride {stride:3d} alone:    {ms:8.3f} ms  '
              f'({ch.shape[1]}x{ch.shape[2]}x{ch.shape[3]})')

    # 2c. fused all-levels decode (one global top-k)
    from odtk_tpu.ops import decode_fused
    strides = [args.size // ch.shape[2] for ch in cls_heads]
    tables = [model.anchors(s) for s in strides]
    if args.rotated:
        tables = [t[0] for t in tables]
    fused = jax.jit(lambda c, b: decode_fused(
        c, b, strides, tables, threshold=model.threshold,
        top_n=model.top_n, rotated=args.rotated, from_logits=True))
    ms = measure(lambda: fused(cls_heads, box_heads), sync_tree)
    print(f'  decode (fused global): {ms:8.3f} ms')

    # 3. NMS (from on-device decoded candidates)
    scores, boxes, classes = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), dec(cls_heads, box_heads))
    nms_fn = nms_rotated if args.rotated else nms
    nj = jax.jit(lambda s, b, c: nms_fn(s, b, c, model.nms,
                                        model.detections))
    ms = measure(lambda: nj(scores, boxes, classes), sync_tree)
    print(f'  NMS ({scores.shape[1]} cands):     {ms:8.3f} ms')

    # 4. fused end-to-end
    full = jax.jit(model.inference_fn)
    ms = measure(lambda: full(variables, images), sync_tree)
    print(f'  e2e (fused):           {ms:8.3f} ms  '
          f'({args.batch / ms * 1e3:.1f} im/s)')


if __name__ == '__main__':
    main()
