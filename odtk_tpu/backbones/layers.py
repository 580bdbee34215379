"""Shared layers: fixed (buffers-only) batch norm.

The reference converts every BN to a non-updating, non-trainable
``FixedBatchNorm2d`` for detection fine-tuning (odtk/backbones/layers.py:5-32,
applied at odtk/train.py:29). In JAX this is the natural default: the
statistics live in a separate ``frozen`` variable collection that the
optimizer never sees, and the affine transform folds into a single
scale+shift at apply time (which XLA then fuses into the preceding conv).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class FixedBatchNorm(nn.Module):
    """Inference-only batch norm: y = (x - mean) / sqrt(var + eps) * g + b.

    All four tensors are non-trainable (collection ``frozen``); values
    come from pretrained-weight import or stay at identity init.
    """
    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.features
        scale = self.variable('frozen', 'scale',
                              lambda: jnp.ones((f,), jnp.float32)).value
        bias = self.variable('frozen', 'bias',
                             lambda: jnp.zeros((f,), jnp.float32)).value
        mean = self.variable('frozen', 'mean',
                             lambda: jnp.zeros((f,), jnp.float32)).value
        var = self.variable('frozen', 'var',
                            lambda: jnp.ones((f,), jnp.float32)).value
        w = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)
