"""Focal / smooth-L1 loss tests against independent numpy math."""

import jax.numpy as jnp
import numpy as np

from odtk_tpu.ops import focal_loss, smooth_l1_loss


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_focal_matches_definition():
    rng = np.random.RandomState(0)
    logits = rng.randn(256).astype(np.float32) * 3
    targets = (rng.rand(256) > 0.8).astype(np.float32)
    got = np.asarray(focal_loss(jnp.asarray(logits), jnp.asarray(targets)))

    x = logits.astype(np.float64)
    p = np_sigmoid(x)
    ce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    alpha_t = targets * 0.25 + (1 - targets) * 0.75
    p_t = np.where(targets == 1, p, 1 - p)
    want = alpha_t * (1 - p_t) ** 2 * ce
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_focal_prior_init_magnitude():
    """With the pi=0.01 prior bias and zero targets, focal loss per
    anchor is tiny — the property the prior init exists for."""
    b = -np.log((1 - 0.01) / 0.01)
    loss = float(focal_loss(jnp.full((1000,), b), jnp.zeros(1000)).sum())
    assert loss < 10.0


def test_smooth_l1_regions():
    x = jnp.asarray([0.0, 0.05, 0.11, 0.5, -0.5])
    got = np.asarray(smooth_l1_loss(x, jnp.zeros_like(x), beta=0.11))
    want = np.asarray([0.0,
                       0.5 * 0.05 ** 2 / 0.11,
                       0.11 - 0.5 * 0.11,
                       0.5 - 0.055,
                       0.5 - 0.055])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_losses_fp32_under_bf16_inputs():
    out = focal_loss(jnp.zeros((4,), jnp.bfloat16), jnp.zeros((4,), jnp.bfloat16))
    assert out.dtype == jnp.float32
    out = smooth_l1_loss(jnp.zeros((4,), jnp.bfloat16), jnp.zeros((4,), jnp.bfloat16))
    assert out.dtype == jnp.float32
