"""Alternative `ae_class` variants: LargerAE and VanillaACAIStrided.

Reference: networks/acai_vanilla_modified.py:22-105 (LargerAE — half-width
stem encoder + decoder with a 1x1 latent expansion) and
networks/acai_vanilla_strided.py:9-54 (strided-conv downsampling encoder
with the standard decoder).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .acai import Decoder, _conv, _leaky, acai_kernel_init
from .config import AEConfig
from .multi_channel import _HalfStemEncoder, trunk_decoder_body

Array = jax.Array


# the half-stem encoder is byte-identical between the LargerAE
# (acai_vanilla_modified.py:22-41) and ACDCLBL (acai_multi_channel.py:
# 22-41) references — one implementation serves both (flat layer names
# come from the module internals, so the alias preserves param trees)
_LargerEncoder = _HalfStemEncoder


class _LargerDecoder(nn.Module):
    """Decoder with a 1x1 latent expansion first
    (reference: acai_vanilla_modified.py:44-70): the shared decoder
    trunk plus an image head."""

    config: AEConfig

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        cfg = self.config
        x = trunk_decoder_body(cfg, z, train)
        x = _conv(cfg.colors, 3, cfg.dtype, name="out")(x)
        if cfg.use_sigmoid:
            x = nn.sigmoid(x)
        return x.astype(jnp.float32)


class LargerAE(nn.Module):
    """Reference: networks/acai_vanilla_modified.py:79-105."""

    config: AEConfig

    def setup(self):
        self.enc = _LargerEncoder(self.config)
        self.dec = _LargerDecoder(self.config)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.dec(z, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.decode(self.encode(x, train=train), train=train)


class _StridedEncoder(nn.Module):
    """Strided 2x2 conv downsampling instead of avg-pool
    (reference: acai_vanilla_strided.py:9-27)."""

    config: AEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        x = _conv(cfg.depth, 1, dt, name="stem")(x)
        for scale in range(cfg.scales):
            k = cfg.depth << scale
            x = _leaky(_conv(k, 3, dt)(x))
            x = _leaky(_conv(k, 3, dt)(x))
            if cfg.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt, param_dtype=jnp.float32)(x)
            # same author init as every other conv in the ACAI family —
            # the strided conv REPLACES AvgPool, it must not be the one
            # layer starting from flax's default distribution
            x = nn.Conv(k, (2, 2), strides=(2, 2), padding="VALID",
                        dtype=dt, param_dtype=jnp.float32,
                        kernel_init=acai_kernel_init)(x)
        k = cfg.depth << cfg.scales
        x = _leaky(_conv(k, 3, dt)(x))
        z = _conv(cfg.latent, 3, dt, name="head")(x)
        return z.astype(jnp.float32)


class VanillaACAIStrided(nn.Module):
    """Reference: networks/acai_vanilla_strided.py:30-54."""

    config: AEConfig

    def setup(self):
        self.enc = _StridedEncoder(self.config)
        self.dec = Decoder(self.config)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.dec(z, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.decode(self.encode(x, train=train), train=train)
