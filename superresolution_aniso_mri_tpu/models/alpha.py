"""Alpha-probe networks: small heads predicting mixing coefficients.

Reference: networks/alpha/alpha_network.py:12-204. All probes take the
channel-concat of two latents ``[B, lw, lw, 2*latent]`` plus a small
vector of scalar features (slice ids, spacing, frame id) and output
mixing coefficients (2, 2*latent, latent, or lw**2 of them).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .acai import Decoder, _leaky
from .config import AEConfig

Array = jax.Array


class _CompressZ(nn.Module):
    """1x1 conv compression of concat latents + flatten
    (reference: alpha_network.py:17-23)."""

    out_channels: int = 1
    use_batchnorm: bool = False

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        x = _leaky(nn.Conv(self.out_channels, (1, 1), padding="VALID",
                           param_dtype=jnp.float32)(z))
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, param_dtype=jnp.float32)(x)
        return x.reshape(x.shape[0], -1)


class _MLPProbe(nn.Module):
    """Generic probe: compress → concat(add_features) → MLP head.

    ``hidden_act=False`` reproduces ExBN's activation-free stack
    (alpha_network.py:157-158); ``hidden_bias=False`` reproduces
    AlphaProbe256v1's all-bias-free pred_alpha (alpha_network.py:133-135).
    """

    hidden: Sequence[int]
    num_out: int
    compress_channels: int = 1
    use_batchnorm: bool = False
    final_bias: bool = False
    hidden_act: bool = True
    hidden_bias: bool = True

    @nn.compact
    def __call__(self, z: Array, add_features: Array, train: bool = False) -> Array:
        x = _CompressZ(self.compress_channels, self.use_batchnorm)(z, train=train)
        x = jnp.concatenate([x, add_features], axis=1)
        for h in self.hidden:
            x = nn.Dense(h, use_bias=self.hidden_bias,
                         param_dtype=jnp.float32)(x)
            if self.hidden_act:
                x = nn.relu(x)
        return nn.Dense(self.num_out, use_bias=self.final_bias,
                        param_dtype=jnp.float32)(x)


def make_alpha_probe(name: str, config: AEConfig, additional_dims: int = 0,
                     use_batchnorm: bool = False) -> nn.Module:
    """Factory matching the reference's probe classes by name.

    Output sizes per class (reference: alpha_network.py):
      AlphaProbe/AlphaProbev2 → 2; AlphaProbe16v1/v2/ExBN → 2*latent;
      AlphaProbe16Convex → latent; AlphaProbe256v1 → latent_width**2.
    """
    latent = config.latent
    lw = config.latent_width
    if name == "AlphaProbe":
        return _MLPProbe(hidden=(), num_out=2, use_batchnorm=use_batchnorm)
    if name == "AlphaProbev2":
        return _MLPProbe(hidden=(512,), num_out=2, use_batchnorm=use_batchnorm)
    if name == "AlphaProbe16v1":
        return _MLPProbe(hidden=(512,), num_out=2 * latent, use_batchnorm=use_batchnorm)
    if name == "AlphaProbe16v2":
        return _MLPProbe(hidden=(512, 1024), num_out=2 * latent, use_batchnorm=use_batchnorm)
    if name == "AlphaProbe16Convex":
        return _MLPProbe(hidden=(512, 1024), num_out=latent, use_batchnorm=use_batchnorm)
    if name == "AlphaProbe16ExBN":
        # NO activation between the two head Linears
        # (alpha_network.py:157-158)
        return _MLPProbe(hidden=(512,), num_out=2 * latent,
                         use_batchnorm=use_batchnorm, hidden_act=False)
    if name == "AlphaProbe256v1":
        # all three pred_alpha Linears are bias-free
        # (alpha_network.py:133-135)
        return _MLPProbe(hidden=((lw * lw * (lw // 2) + additional_dims) // 32,
                                 lw * lw * (lw // 2) + additional_dims),
                         num_out=lw * lw,
                         compress_channels=lw // 2,
                         use_batchnorm=use_batchnorm,
                         hidden_bias=False)
    raise ValueError(f"unknown alpha probe class: {name}")


class SELayer(nn.Module):
    """Squeeze-excitation (reference: alpha_network.py:190-204)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.relu(nn.Dense(c // self.reduction, use_bias=False)(y))
        y = nn.sigmoid(nn.Dense(c, use_bias=False)(y))
        return x * y[:, None, None, :]


class AlphaDecoder(nn.Module):
    """Standalone decoder used by AlphaTrainerCombined
    (reference: alpha_network.py:167-187)."""

    config: AEConfig

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        return Decoder(self.config)(z, train=train)
