#!/usr/bin/env python3
"""Ablate the train step on the real chip: attribute optimizer / loss /
assignment cost by timing step variants.

Variants:
  full      — the real train step (baseline, bench.py conditions)
  noopt     — fwd+bwd only (grads computed, no optimizer update)
  flat      — the single-ravel SGD (make_optimizer(flat=True))
  headsum   — fwd+bwd+opt with loss = plain sum of head outputs
              (no assignment, no focal/smooth-L1)

Usage: python extras/bench_step_ablate.py [--batch 8] [--size 832]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, sync, warm=3, iters=16, reps=3):
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
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--size', type=int, default=832)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    jax.config.update('jax_compilation_cache_dir', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.jax_cache'))
    from odtk_tpu.model import Model
    from odtk_tpu.train import make_optimizer, make_train_step
    from odtk_tpu.parallel import make_mesh, shard_batch, \
        replicated_sharding, batch_sharding

    model = Model(backbones='ResNet50FPN', classes=80, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))
    mesh = make_mesh(jax.devices()[:1])
    b, size = args.batch, args.size

    rng = np.random.RandomState(0)
    data = rng.randn(b, size, size, 3).astype(np.float32) * 0.5
    targets = np.full((b, 32, 5), -1.0, np.float32)
    targets[:, :4, :2] = rng.uniform(100, 600, (b, 4, 2))
    targets[:, :4, 2:4] = rng.uniform(40, 300, (b, 4, 2))
    targets[:, :4, 4] = rng.randint(0, 80, (b, 4))
    images, tgts = shard_batch(mesh, data, targets)
    frozen = model.variables['frozen']
    # host copy: each variant device_puts fresh (donation deletes buffers)
    params_host = jax.tree.map(np.asarray, model.variables['params'])

    rep = replicated_sharding(mesh)
    img_shard = batch_sharding(mesh, 4)
    tgt_shard = batch_sharding(mesh, 3)

    results = {}

    def timed(name, step, has_opt=True):
        params = jax.device_put(params_host, rep)
        if has_opt:
            opt_state = jax.device_put(tx.init(params), rep)
            state = {'p': params, 'o': opt_state}

            def once():
                state['p'], state['o'], cl, bl = step(
                    state['p'], state['o'], frozen, images, tgts)
                return cl
        else:
            state = {'p': params}

            def once():
                state['p'], cl, bl = step(state['p'], frozen, images, tgts)
                return cl
        ms = measure(once, lambda o: float(o))
        results[name] = ms
        print(f'{name:10s} {ms:8.2f} ms  ({b / ms * 1e3:6.1f} im/s)',
              flush=True)

    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1)
    timed('full', make_train_step(model, tx, mesh))

    # fwd+bwd only — no optimizer
    def noopt_step(params, frozen, images, targets):
        def loss_fn(p):
            cl, bl = model.loss_fn({'params': p, 'frozen': frozen},
                                   images, targets)
            return cl + bl, (cl, bl)
        (_, (cl, bl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # consume grads so they aren't DCE'd, without an optimizer
        params = jax.tree.map(lambda p, g: p - 0.0 * g, params, grads)
        return params, cl, bl

    timed('noopt', jax.jit(noopt_step,
                           in_shardings=(rep, rep, img_shard, tgt_shard),
                           out_shardings=(rep, rep, rep),
                           donate_argnums=(0,)), has_opt=False)

    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1,
                        flat=True)
    timed('flat', make_train_step(model, tx, mesh))

    # loss = sum of raw heads (no assignment / focal / smooth-L1)
    tx = make_optimizer(lr=0.01, warmup=100, milestones=[1000], gamma=0.1)

    def headsum_step(params, opt_state, frozen, images, targets):
        def loss_fn(p):
            cls_heads, box_heads = model.module.apply(
                {'params': p, 'frozen': frozen}, images)
            s = sum(jnp.sum(h.astype(jnp.float32)) for h in cls_heads)
            s = s + sum(jnp.sum(h.astype(jnp.float32)) for h in box_heads)
            return s * 1e-9, (s, s)
        (_, (cl, bl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, cl, bl

    timed('headsum', jax.jit(
        headsum_step,
        in_shardings=(rep, rep, rep, img_shard, tgt_shard),
        out_shardings=(rep, rep, rep, rep),
        donate_argnums=(0, 1)))

    print({k: round(v, 2) for k, v in results.items()})
    print('optimizer cost (full - noopt): '
          f'{results["full"] - results["noopt"]:.2f} ms')
    print('assignment+loss cost (full - headsum): '
          f'{results["full"] - results["headsum"]:.2f} ms')


if __name__ == '__main__':
    main()
