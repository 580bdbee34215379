#!/usr/bin/env python3
"""Capture a jax.profiler trace of the train step and print the top ops.

Usage: python extras/profile_step.py [--rotated] [--batch 8] [--size 832]
       [--what step|infer|assign]

Parses the chrome-trace JSON the profiler writes (no TensorBoard
needed) and aggregates device-track op durations — the tool behind the
train-throughput work (VERDICT round-1 item 4).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(logdir, steps):
    files = glob.glob(os.path.join(logdir, 'plugins/profile/*/*.trace.json.gz'))
    if not files:
        raise RuntimeError(f'no trace under {logdir}')
    with gzip.open(sorted(files)[-1], 'rt') as f:
        trace = json.load(f)
    events = trace['traceEvents']
    # device tracks are the PIDs whose process_name mentions TPU/device
    names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            names[e['pid']] = e['args'].get('name', '')
    device_pids = {pid for pid, n in names.items()
                   if 'TPU' in n or 'device' in n.lower()}
    def is_parent(name):
        # module/run spans, not leaf HLO ops
        return name.startswith('jit_') or name.isdigit()

    totals = defaultdict(float)
    counts = defaultdict(int)
    args_of = {}
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in device_pids:
            continue
        name = e.get('name', '?')
        if is_parent(name):
            continue
        dur = e.get('dur', 0) / 1e3  # us -> ms
        totals[name] += dur
        counts[name] += 1
        args_of[name] = e.get('args', {})
        total += dur
    print(f'\nleaf device op time: {total:.1f} ms over {steps} steps '
          f'({total / steps:.2f} ms/step)')

    # category rollup: strip trailing .N and digits
    cats = defaultdict(float)
    for name, ms in totals.items():
        cats[name.rstrip('0123456789.')] += ms
    print(f'\n{"ms/step":>9}  {"%":>5}  category')
    for name, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:25]:
        print(f'{ms / steps:9.3f}  {100 * ms / max(total, 1e-9):5.1f}  '
              f'{name[:90]}')

    print(f'\n{"ms/step":>9}  {"%":>5}  {"count":>6}  top single ops')
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        a = args_of.get(name, {})
        detail = str(a.get('long_name', a.get('tf_op', a)))[:160]
        print(f'{ms / steps:9.3f}  {100 * ms / max(total, 1e-9):5.1f}  '
              f'{counts[name]:6d}  {name[:60]}\n{"":>24}{detail}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rotated', action='store_true')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=832)
    ap.add_argument('--max-det', type=int, default=32)
    ap.add_argument('--steps', type=int, default=5)
    ap.add_argument('--what', default='step',
                    choices=['step', 'infer', 'assign'])
    ap.add_argument('--keep', default=None,
                    help='keep the trace under this dir')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from odtk_tpu.model import Model
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh, shard_batch
    from odtk_tpu.ops import snap_to_anchors, snap_to_anchors_rotated

    model = Model(backbones='ResNet50FPN', classes=80,
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

    if args.what == 'step':
        tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000],
                            gamma=0.1)
        opt_state = tx.init(params)
        step = make_train_step(model, tx, mesh)
        state = {'p': params, 'o': opt_state}

        def run_once():
            state['p'], state['o'], cl, bl = step(
                state['p'], state['o'], frozen, images, tgts)
            return cl
    elif args.what == 'infer':
        fn = jax.jit(model.inference_fn)

        def run_once():
            return fn(variables, images)[0]
    else:
        snap = snap_to_anchors_rotated if args.rotated else snap_to_anchors

        def assign_all(t):
            outs = []
            for stride in [8, 16, 32, 64, 128]:
                table = model.anchors(stride)
                outs.append(jax.vmap(partial(
                    snap, size=(size, size), stride=stride,
                    anchor_table=table, num_classes=80,
                    anchor_ious=model.anchor_ious))(t))
            return outs

        asn = jax.jit(assign_all)

        def run_once():
            return asn(tgts.astype(jnp.float32))[0][2]

    for _ in range(4):          # compile + warm
        out = run_once()
    np.asarray(out)

    logdir = args.keep or tempfile.mkdtemp(prefix='odtk_trace_')
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        out = run_once()
    np.asarray(out)
    jax.profiler.stop_trace()
    parse_trace(logdir, args.steps)


if __name__ == '__main__':
    main()
