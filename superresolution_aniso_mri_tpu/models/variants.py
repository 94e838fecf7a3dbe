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

from .acai import Decoder, _conv, _leaky, _upsample2x
from .config import AEConfig

Array = jax.Array


class _LargerEncoder(nn.Module):
    """Half-width stem encoder (reference: acai_vanilla_modified.py:22-41)."""

    config: AEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        x = _conv(cfg.depth // 2, 1, dt, name="stem")(x)
        for scale in range(cfg.scales):
            k = cfg.depth << scale
            x = _leaky(_conv(k, 3, dt)(x))
            x = _leaky(_conv(k, 3, dt)(x))
            if cfg.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt, param_dtype=jnp.float32)(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        k = cfg.depth << cfg.scales
        x = _leaky(_conv(k, 3, dt)(x))
        z = _conv(cfg.latent, 3, dt, name="head")(x)
        return z.astype(jnp.float32)


class _LargerDecoder(nn.Module):
    """Decoder with a 1x1 latent expansion first
    (reference: acai_vanilla_modified.py:44-70)."""

    config: AEConfig

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        cfg = self.config
        dt = cfg.dtype
        x = z.astype(dt)
        x = _leaky(_conv(cfg.depth << cfg.scales, 1, dt)(x))
        if cfg.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dt, param_dtype=jnp.float32)(x)
        for scale in range(cfg.scales - 1, -1, -1):
            k = cfg.depth << scale
            x = _leaky(_conv(k, 3, dt)(x))
            x = _leaky(_conv(k, 3, dt)(x))
            if cfg.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=dt, param_dtype=jnp.float32)(x)
            x = _upsample2x(x)
        x = _leaky(_conv(cfg.depth, 3, dt)(x))
        x = _conv(cfg.colors, 3, dt, name="out")(x)
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
            x = nn.Conv(k, (2, 2), strides=(2, 2), padding="VALID",
                        dtype=dt, param_dtype=jnp.float32)(x)
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
