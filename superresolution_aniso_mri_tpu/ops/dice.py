"""Soft Dice loss for the multi-channel (image+labels) model.

Reference: kwatsch/dice_loss.py:4-30. Classes live on the LAST axis here
(NHWC), not axis 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def soft_dice_score(probs: Array, one_hot: Array, eps: float = 1.0e-6) -> Array:
    """Negative mean per-(batch, class) soft dice
    (reference: dice_loss.py:4-23). Inputs are [B, H, W, C]."""
    nominator = 2.0 * jnp.sum(one_hot * probs, axis=(1, 2))
    denominator = jnp.sum(one_hot, axis=(1, 2)) + jnp.sum(probs, axis=(1, 2)) + eps
    return -jnp.mean(nominator / denominator)


def dice_loss(probs: Array, labels: Array, n_classes: int) -> Array:
    """``labels`` are integer maps [B, H, W]; one-hot over last axis
    (reference: dice_loss.py:26-30)."""
    one_hot = jax.nn.one_hot(labels, n_classes, dtype=probs.dtype)
    return soft_dice_score(probs, one_hot)
