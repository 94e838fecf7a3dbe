"""beta-VAE variants on top of the shared Encoder/Decoder.

Reference: networks/beta_vae.py:48-156 (VAE, VAE2). The reference keeps
mu/logvar as separate Linear heads applied to the flattened conv latent;
``VAE`` keeps the full flattened latent dimensionality, ``VAE2``
compresses to ``latent`` dims and decodes through a dense expansion.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .acai import Decoder, Encoder
from .config import AEConfig

Array = jax.Array


class VAE(nn.Module):
    """Full-width latent VAE (reference: networks/beta_vae.py:48-101)."""

    config: AEConfig

    def setup(self):
        cfg = self.config
        self.enc = Encoder(cfg)
        self.dec = Decoder(cfg)
        self.latent_flat = cfg.latent * cfg.latent_width * cfg.latent_width
        self.encoder_mu = nn.Dense(self.latent_flat, param_dtype=jnp.float32)
        self.encoder_logvar = nn.Dense(self.latent_flat, param_dtype=jnp.float32)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def heads(self, z_conv: Array) -> Tuple[Array, Array]:
        flat = z_conv.reshape(z_conv.shape[0], -1)
        return self.encoder_mu(flat), self.encoder_logvar(flat)

    def unflatten(self, z_flat: Array) -> Array:
        cfg = self.config
        return z_flat.reshape(-1, cfg.latent_width, cfg.latent_width, cfg.latent)

    def decode(self, z: Array, train: bool = False) -> Array:
        if z.ndim == 2:
            z = self.unflatten(z)
        return self.dec(z, train=train)

    def reparametrize(self, rng: Array, mu: Array, logvar: Array) -> Array:
        std = jnp.exp(0.5 * logvar)
        return mu + std * jax.random.normal(rng, std.shape, std.dtype)

    def __call__(self, x: Array, train: bool = False) -> Array:
        z = self.encode(x, train=train)
        mu, _ = self.heads(z)
        return self.decode(mu, train=train)


class VAE2(nn.Module):
    """Compressed-latent VAE (reference: networks/beta_vae.py:104-156)."""

    config: AEConfig

    def setup(self):
        cfg = self.config
        self.enc = Encoder(cfg)
        self.dec = Decoder(cfg)
        self.latent_flat = cfg.latent * cfg.latent_width * cfg.latent_width
        self.encoder_mu = nn.Dense(cfg.latent, param_dtype=jnp.float32)
        self.encoder_logvar = nn.Dense(cfg.latent, param_dtype=jnp.float32)
        self.decoder_dense = nn.Dense(self.latent_flat, param_dtype=jnp.float32)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def heads(self, z_conv: Array) -> Tuple[Array, Array]:
        flat = z_conv.reshape(z_conv.shape[0], -1)
        return self.encoder_mu(flat), self.encoder_logvar(flat)

    def unflatten(self, z_flat: Array) -> Array:
        return z_flat  # dense decode head performs the reshape

    def decode(self, z: Array, train: bool = False) -> Array:
        cfg = self.config
        h = self.decoder_dense(z)
        h = h.reshape(-1, cfg.latent_width, cfg.latent_width, cfg.latent)
        return self.dec(h, train=train)

    def reparametrize(self, rng: Array, mu: Array, logvar: Array) -> Array:
        std = jnp.exp(0.5 * logvar)
        return mu + std * jax.random.normal(rng, std.shape, std.dtype)

    def __call__(self, x: Array, train: bool = False) -> Array:
        z = self.encode(x, train=train)
        mu, _ = self.heads(z)
        return self.decode(mu, train=train)
