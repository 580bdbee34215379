#!/usr/bin/env python3
"""A/B decode selection strategies on the real chip.

Variants: per-level (current default-off path), fused-global at several
k budgets, and hybrid (per-level for the two big levels + one fused
call over the three small ones). Decides the decode_fused default.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_infer_breakdown import measure  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from odtk_tpu.model import Model
    from odtk_tpu.ops import decode, decode_fused

    size = 800
    model = Model(backbones='ResNet50FPN', classes=80, dtype=jnp.bfloat16)
    model.initialize(rng=0, image_size=(256, 256))
    variables = jax.device_put(model.variables)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, size, size, 3), jnp.float32)
    fwd = jax.jit(lambda v, x: model.module.apply(v, x))
    heads = jax.device_put(jax.tree.map(np.asarray, fwd(variables, images)))
    cls_heads, box_heads = heads
    strides = [size // ch.shape[2] for ch in cls_heads]
    tables = [model.anchors(s) for s in strides]

    def sync_tree(out):
        np.asarray(jax.tree.leaves(out)[0])

    def per_level(c, b):
        outs = [decode(ch, bh.astype(jnp.float32), s,
                       threshold=model.threshold, top_n=model.top_n,
                       anchors=t, from_logits=True)
                for ch, bh, s, t in zip(c, b, strides, tables)]
        return (jnp.concatenate([o[0] for o in outs], 1),
                jnp.concatenate([o[1] for o in outs], 1),
                jnp.concatenate([o[2] for o in outs], 1))

    fn = jax.jit(per_level)
    ms = measure(lambda: fn(cls_heads, box_heads), sync_tree)
    print(f'  per-level x5 (k=1000 each): {ms:8.3f} ms')

    for k in (1000, 2000, 5000):
        fn = jax.jit(lambda c, b, k=k: decode_fused(
            c, b, strides, tables, threshold=model.threshold,
            top_n=model.top_n, total_top_n=k, from_logits=True))
        ms = measure(lambda: fn(cls_heads, box_heads), sync_tree)
        print(f'  fused global k={k}:         {ms:8.3f} ms')

    def hybrid(c, b):
        outs = [decode(ch, bh.astype(jnp.float32), s,
                       threshold=model.threshold, top_n=model.top_n,
                       anchors=t, from_logits=True)
                for ch, bh, s, t in zip(c[:2], b[:2], strides[:2],
                                        tables[:2])]
        fs, fb, fc = decode_fused(
            c[2:], b[2:], strides[2:], tables[2:],
            threshold=model.threshold, top_n=model.top_n,
            from_logits=True)
        return (jnp.concatenate([o[0] for o in outs] + [fs], 1),
                jnp.concatenate([o[1] for o in outs] + [fb], 1),
                jnp.concatenate([o[2] for o in outs] + [fc], 1))

    fn = jax.jit(hybrid)
    ms = measure(lambda: fn(cls_heads, box_heads), sync_tree)
    print(f'  hybrid (2 big + fused small k=3000): {ms:8.3f} ms')


if __name__ == '__main__':
    main()
