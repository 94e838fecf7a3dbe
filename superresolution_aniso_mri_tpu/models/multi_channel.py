"""Image+segmentation multi-channel AE (ACDCLBL model).

Reference: networks/acai_multi_channel.py:22-103. A shared trunk decoder
feeds two heads: head1 produces the image (sigmoid), head2 per-class
soft probabilities (softmax over classes).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from .acai import _conv, _leaky, _upsample2x
from .config import AEConfig

Array = jax.Array


class _HalfStemEncoder(nn.Module):
    """Encoder variant whose stem maps to depth // 2 channels
    (reference: acai_multi_channel.py:22-41)."""

    config: AEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        if cfg.stem_pad_parity:
            # reference-faithful stem padding (acai_multi_channel.py:25,
            # acai_vanilla_modified.py:24 — see AEConfig.stem_pad_parity)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
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


def trunk_decoder_body(cfg: AEConfig, z: Array, train: bool) -> Array:
    """Shared decoder-trunk layer sequence (1x1 latent expansion,
    per-scale conv pairs + upsample, final conv to ``depth`` channels).
    Called INSIDE a parent module's @nn.compact so the flat layer names
    (Conv_0.., BatchNorm_i) are identical for every user — one
    implementation for _TrunkDecoder (ACDCLBL) and variants._LargerDecoder
    instead of two hand-synchronized copies."""
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
    return x


class _TrunkDecoder(nn.Module):
    """Decoder trunk ending at ``depth`` feature channels
    (reference: acai_multi_channel.py:44-66)."""

    config: AEConfig

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        return trunk_decoder_body(self.config, z, train)


class MultiChannelAE(nn.Module):
    """Reference: networks/acai_multi_channel.py:69-103.

    ``decode`` returns ``{'image', 'soft_probs'}``; ``soft_probs`` has
    ``nclasses`` channels (softmax over the channel axis).
    """

    config: AEConfig

    def setup(self):
        cfg = self.config
        self.enc = _HalfStemEncoder(cfg)
        self.trunk = _TrunkDecoder(cfg)
        self.head_image = _conv(1, 3, cfg.dtype, name="head_image")
        self.head_cls_a = _conv(cfg.depth, 3, cfg.dtype, name="head_cls_a")
        self.head_cls_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                        dtype=cfg.dtype, param_dtype=jnp.float32)
        self.head_cls_b = _conv(cfg.nclasses, 1, cfg.dtype, name="head_cls_b")

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def decode(self, z: Array, train: bool = False) -> Dict[str, Array]:
        h = self.trunk(z, train=train)
        img = nn.sigmoid(self.head_image(h)).astype(jnp.float32)
        c = _leaky(self.head_cls_a(h))
        c = self.head_cls_bn(c, use_running_average=not train)
        c = self.head_cls_b(c)
        soft_probs = nn.softmax(c, axis=-1).astype(jnp.float32)
        return {"image": img, "soft_probs": soft_probs}

    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        return self.decode(self.encode(x, train=train), train=train)


__all__ = ["MultiChannelAE"]
