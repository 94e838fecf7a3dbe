"""ACAI-style convolutional autoencoder, TPU-first.

Re-design of the reference's primary model family
(reference: networks/acai_vanilla.py:49-171 — Encoder/Decoder generators,
VanillaACAI, Discriminator). Differences, chosen for XLA/TPU:

  * NHWC layout (feeds the MXU's native conv layout on TPU).
  * shape-exact encoder: the reference stem is ``Conv2d(colors, depth, 1,
    padding=1)`` which *grows* H/W by 2 and relies on AvgPool flooring to
    land on ``latent_width``; we use a plain 1x1 stem so every
    intermediate shape is static and exactly ``width >> scale``.
  * nearest-neighbour upsampling is a reshape+broadcast (no gather),
    which XLA fuses into the following conv.
  * params are float32; activations can run in bfloat16
    (``AEConfig.compute_dtype``) with float32 conv accumulation.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .config import AEConfig

Array = jax.Array

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU() default used by the reference


def acai_kernel_init(key, shape, dtype=jnp.float32):
    """ACAI author initialisation (reference: networks/acai_vanilla.py:39-46).

    The reference draws conv weights from N(0, std) with
    ``std = 1/sqrt((1 + slope^2) * prod(w.shape[:-1]))`` (slope=0.2).
    Flax kernels are (kh, kw, in, out); we use fan_in = kh*kw*in which is
    the same scale family (the torch variant uses out*in*kh, an
    idiosyncrasy of their layout; the network is insensitive to this).
    """
    fan_in = float(np.prod(shape[:-1]))
    std = 1.0 / np.sqrt((1.0 + 0.2 ** 2) * fan_in)
    return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)


def _conv(features: int, kernel: int, dtype, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(
        features,
        (kernel, kernel),
        padding="SAME" if kernel > 1 else "VALID",
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=acai_kernel_init,
        bias_init=nn.initializers.zeros,
        name=name,
    )


def _leaky(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def _upsample2x(x: Array) -> Array:
    """Nearest-neighbour 2x upsample, NHWC, as reshape+broadcast."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


class ResBlock(nn.Module):
    """Optional residual block (reference: networks/acai_vanilla.py:20-35)."""

    channel: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.relu(x)
        h = _conv(self.channel, 3, self.dtype)(h)
        h = nn.relu(h)
        h = _conv(x.shape[-1], 1, self.dtype)(h)
        return x + h


class Encoder(nn.Module):
    """Per-scale [3x3 conv, LeakyReLU] x2 (+opt BN) + 2x2 avg-pool; 3x3 head.

    Reference: networks/acai_vanilla.py:49-72.
    """

    config: AEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 return_features: bool = False):
        """Encode; with ``return_features=True`` also return the
        per-scale post-LeakyReLU activations (pre-BN/pool) plus the
        pre-head activation — the multi-scale feature stack the
        encoder-backbone perceptual metric (ops/perceptual.py) taps.
        The flag changes only the return arity, never the parameter
        tree or the computed latent."""
        cfg = self.config
        dt = cfg.dtype
        feats = []
        x = x.astype(dt)
        if cfg.stem_pad_parity:
            # reference-faithful: the 1x1 stem carries padding=1
            # (acai_vanilla.py:51), growing H/W by 2; the floor-pooling
            # below absorbs it by scale 2 (see AEConfig.stem_pad_parity)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = _conv(cfg.depth, 1, dt, name="stem")(x)
        for scale in range(cfg.scales):
            k = cfg.depth << scale
            x = _leaky(_conv(k, 3, dt)(x))
            feats.append(x)
            x = _leaky(_conv(k, 3, dt)(x))
            feats.append(x)
            if cfg.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=dt,
                    param_dtype=jnp.float32,
                )(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if cfg.n_res_block:
            for _ in range(cfg.n_res_block):
                x = ResBlock(dtype=dt)(x)
            x = nn.relu(x)
        k = cfg.depth << cfg.scales
        x = _leaky(_conv(k, 3, dt)(x))
        feats.append(x)
        z = _conv(cfg.latent, 3, dt, name="head")(x)
        if return_features:
            return z.astype(jnp.float32), feats
        return z.astype(jnp.float32)


class Decoder(nn.Module):
    """Mirror of Encoder with nearest 2x upsampling.

    Reference: networks/acai_vanilla.py:75-102. ``use_upsample=False``
    (ConvTranspose) is supported for parity with the reference flag.
    """

    config: AEConfig
    # None → follow config.use_upsample, so EVERY model family that
    # embeds a Decoder(config) honors the recorded architecture flag
    # (an explicit bool still overrides, for tests)
    use_upsample: bool | None = None

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        cfg = self.config
        up = (cfg.use_upsample if self.use_upsample is None
              else self.use_upsample)
        dt = cfg.dtype
        x = z.astype(dt)
        if cfg.n_res_block:
            for _ in range(cfg.n_res_block):
                x = ResBlock(dtype=dt)(x)
            x = nn.relu(x)
        for scale in range(cfg.scales - 1, -1, -1):
            k = cfg.depth << scale
            x = _leaky(_conv(k, 3, dt)(x))
            x = _leaky(_conv(k, 3, dt)(x))
            if cfg.use_batchnorm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=dt,
                    param_dtype=jnp.float32,
                )(x)
            if up:
                x = _upsample2x(x)
            else:
                # padding ((2,2),(2,2)) is the flax equivalent of torch
                # ConvTranspose2d(k=4, s=2, p=1)'s OUTPUT shape 2n:
                # flax pads the stride-dilated input directly, so the
                # torch-style (1,1) yielded 2n-2 and the decoder never
                # reproduced the input resolution (verified 16->30 vs
                # 16->32)
                x = nn.ConvTranspose(
                    k,
                    (4, 4),
                    strides=(2, 2),
                    padding=((2, 2), (2, 2)),
                    dtype=dt,
                    param_dtype=jnp.float32,
                    kernel_init=acai_kernel_init,
                )(x)
        x = _leaky(_conv(cfg.depth, 3, dt)(x))
        x = _conv(cfg.colors, 3, dt, name="out")(x)
        if cfg.use_sigmoid:
            x = nn.sigmoid(x)
        return x.astype(jnp.float32)


class VanillaACAI(nn.Module):
    """encode/decode/__call__ AE facade (reference: acai_vanilla.py:112-138)."""

    config: AEConfig

    def setup(self):
        self.enc = Encoder(self.config)
        self.dec = Decoder(self.config,
                           use_upsample=self.config.use_upsample)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def encode_features(self, x: Array, train: bool = False):
        """(latent, [per-scale features]) — the perceptual-backbone tap
        (ops/perceptual.py); same params/latent as :meth:`encode`."""
        return self.enc(x, train=train, return_features=True)

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.dec(z, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.decode(self.encode(x, train=train), train=train)


class Discriminator(nn.Module):
    """ACAI critic: Encoder reused, mean over flattened latent → scalar.

    Reference: networks/acai_vanilla.py:141-157.
    """

    config: AEConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        z = Encoder(self.config)(x, train=train)
        return jnp.mean(z.reshape(z.shape[0], -1), axis=-1)


def lerp(start: Array, end: Array, weight) -> Array:
    """Elementwise lerp (reference: networks/acai_vanilla.py:165-167)."""
    return start + weight * (end - start)


def swap_halves(x: Array) -> Array:
    """Concatenate the two batch halves in swapped order
    (reference: networks/acai_vanilla.py:160-162)."""
    b = x.shape[0] // 2
    return jnp.concatenate([x[b:], x[:b]], axis=0)
