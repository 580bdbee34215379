"""Focal loss and smooth-L1, elementwise (normalization happens in the model).

Contract per the reference (odtk/loss.py:5-31; normalization by #fg
anchors at odtk/model.py:207-209). Computed in fp32 regardless of the
network compute dtype — losses are tiny tensors and fp32 keeps the
gradient scale exact.
"""

import jax
import jax.numpy as jnp


def focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Elementwise sigmoid focal loss (https://arxiv.org/abs/1708.02002).

    Matches odtk/loss.py:5-18: BCE-with-logits weighted by
    alpha_t * (1 - p_t)^gamma where p_t = p if target==1 else 1-p.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    # Numerically stable BCE with logits:
    #   max(x, 0) - x*t + log(1 + exp(-|x|))
    ce = (jnp.maximum(logits, 0) - logits * targets
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    alpha_t = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    p_t = jnp.where(targets == 1, p, 1.0 - p)
    return alpha_t * (1.0 - p_t) ** gamma * ce


def smooth_l1_loss(pred, target, beta=0.11):
    """Elementwise smooth-L1 (Huber) with threshold beta (odtk/loss.py:20-31)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    x = jnp.abs(pred - target)
    return jnp.where(x >= beta, x - 0.5 * beta, 0.5 * x * x / beta)
