"""Elementary loss functions (pure JAX, fused under jit).

These replace the reference's per-loss torch modules and the scattered
F.mse_loss / F.binary_cross_entropy calls
(reference: kwatsch/base_trainer.py:164-210, kwatsch/trainer_vae.py:86-98).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mse(pred: Array, target: Array, mask: Array | None = None) -> Array:
    """Mean squared error; with optional elementwise loss mask
    (reference: cardiac/trainer_ae.py:118-123 mask semantics)."""
    d = (pred - target) ** 2
    if mask is not None:
        d = d * mask
    return jnp.mean(d)


def l1(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def bce_sum_over_batch(pred: Array, target: Array, eps: float = 1e-7) -> Array:
    """Binary cross entropy summed over elements, divided by batch size —
    the VAE recon loss (reference: trainer_vae.py:12-13,
    ``F.binary_cross_entropy(..., size_average=False).div(B)``)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    ce = -(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))
    return jnp.sum(ce) / pred.shape[0]


def kl_standard_normal(mu: Array, logvar: Array) -> Array:
    """Mean KL(N(mu, sigma) || N(0, 1)) with sigma = exp(logvar/2).

    Matches torch.distributions kl_divergence for Normal pairs
    (reference: trainer_vae.py:95-98): elementwise
    ``log(1/sigma) + (sigma^2 + mu^2 - 1)/2`` averaged over all elements.
    """
    var = jnp.exp(logvar)
    return jnp.mean(-0.5 * logvar + 0.5 * (var + mu ** 2) - 0.5)


def latent_mix(z: Array, alpha_from: Array, alpha_to: Array) -> Array:
    """The framework's core op: mix the two batch halves of ``z``.

    ``z`` is [2B, h, w, c] (or [2B, d]); alphas are [B] or [B, 1].
    ``z_mix = alpha_from * z[:B] + alpha_to * z[B:]``
    (reference: kwatsch/brain/trainer_ae.py:20-32; cardiac fixes both
    alphas at 0.5, kwatsch/cardiac/trainer_ae.py:173).
    """
    b = z.shape[0] // 2
    a_f = jnp.reshape(alpha_from, (b,) + (1,) * (z.ndim - 1))
    a_t = jnp.reshape(alpha_to, (b,) + (1,) * (z.ndim - 1))
    return a_f * z[:b] + a_t * z[b:]


def catmull_rom_weights(t: Array) -> Array:
    """[...] fractional positions → [..., 4] Catmull-Rom weights over
    taps (z[i-1], z[i], z[i+1], z[i+2]) for a sample at t between z[i]
    (t=0) and z[i+1] (t=1). Rows sum to 1, linear precision, endpoint
    interpolation (pinned by tests/test_latent_interp.py). Shared by
    inference (infer.super_volume cubic z-mixing) and the cubic-aligned
    training loss so the two cannot drift."""
    t = jnp.asarray(t)
    t2, t3 = t * t, t * t * t
    return 0.5 * jnp.stack(
        [-t3 + 2.0 * t2 - t,
         3.0 * t3 - 5.0 * t2 + 2.0,
         -3.0 * t3 + 4.0 * t2 + t,
         t3 - t2], axis=-1)


# Tap offsets of the 6-tap lanczos3 latent scheme, relative to the
# kept-slice pair (z[i + o] for a sample between z[i] and z[i+1]).
# Single source: both the weight kernel below AND the serving-side
# latent gather (infer.super_volume._LATENT_TAP_OFFSETS) read this —
# weights and gathered taps cannot drift apart.
LANCZOS3_OFFSETS = (-2, -1, 0, 1, 2, 3)


def lanczos3_weights(alphas: Array) -> Array:
    """[...] fractional positions → [..., 6] normalized lanczos(radius=3)
    weights over taps at LANCZOS3_OFFSETS. At integer t the kernel is a
    delta, so t=0/t=1 reproduce z[i]/z[i+1] exactly; rows sum to 1.
    Shared by inference (infer.super_volume ``latent_interp='lanczos3'``)
    and the lanczos3-aligned training loss so the two cannot drift."""
    t = jnp.asarray(alphas)[..., None]
    x = jnp.asarray(LANCZOS3_OFFSETS, t.dtype) - t
    r = 3.0
    px = jnp.pi * jnp.where(x == 0, 1e-12, x)
    w = jnp.where(jnp.abs(x) < r,
                  r * jnp.sin(px) * jnp.sin(px / r) / (px * px), 0.0)
    # x==0 → weight exactly 1 (the 1e-12 guard leaves it ~1 already)
    w = jnp.where(x == 0, 1.0, w)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def latent_mix_lanczos3(z: Array, z_outer: Array, z_outer2: Array,
                        alpha_to: Array) -> Array:
    """6-tap lanczos3 latent mix — the training twin of inference's
    ``latent_interp='lanczos3'`` (infer.super_volume).

    ``z`` is [2B, ...] (from ∥ to), ``z_outer`` [2B, ...] the outward
    z-neighbours one pair step beyond each end, ``z_outer2`` [2B, ...]
    two pair steps beyond (both edge-clamped by the sampler — the same
    index clamping as the inference taps); ``alpha_to`` [B] is the
    in-between slice's fractional position from 'from' toward 'to'.
    Tap order matches LANCZOS3_OFFSETS (-2,-1,0,1,2,3) =
    (outer2_from, outer_from, from, to, outer_to, outer2_to)."""
    b = z.shape[0] // 2
    w = lanczos3_weights(jnp.reshape(alpha_to, (b,)))      # [B, 6]
    w = jnp.reshape(w, (b, 6) + (1,) * (z.ndim - 1))
    return (w[:, 0] * z_outer2[:b] + w[:, 1] * z_outer[:b]
            + w[:, 2] * z[:b] + w[:, 3] * z[b:]
            + w[:, 4] * z_outer[b:] + w[:, 5] * z_outer2[b:])


def latent_mix_cubic(z: Array, z_outer: Array, alpha_to: Array) -> Array:
    """4-tap Catmull-Rom latent mix — the training twin of inference's
    ``latent_interp='cubic'`` (infer.super_volume).

    ``z`` is [2B, ...] (from ∥ to), ``z_outer`` is [2B, ...] with the
    outward z-neighbours (outer_from ∥ outer_to — one pair step beyond
    from/to, edge-clamped by the sampler), ``alpha_to`` [B] is the
    in-between slice's fractional position from 'from' toward 'to'
    (exactly linear_mix's parameterization: t=alpha_to reproduces the
    lerp when the four latents are collinear)."""
    b = z.shape[0] // 2
    w = catmull_rom_weights(jnp.reshape(alpha_to, (b,)))   # [B, 4]
    w = jnp.reshape(w, (b, 4) + (1,) * (z.ndim - 1))
    return (w[:, 0] * z_outer[:b] + w[:, 1] * z[:b]
            + w[:, 2] * z[b:] + w[:, 3] * z_outer[b:])
