"""Legacy block-based AE family (unused by the main AESR path, kept for
capability parity).

Reference: networks/ae_standard.py:34-287 (BasicEncoderBlock/
BasicDecoderBlock, block-list-configured Encoder/Decoder, AE, AEAdv with
a 1x1 latent bottleneck pair, DiscriminatorSpatial) and
networks/ae_common.py:51-227 (similar blocks + DiscriminatorFakeReal).
Note: networks/alpha/alpha_hc_network.py is an EMPTY file in the
reference — there is nothing to port for the "hierarchical alpha" entry.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .acai import _leaky

Array = jax.Array


def _lconv(features: int, kernel: int, name=None) -> nn.Conv:
    """Legacy-family conv: the reference applies kaiming_normal_ to every
    Conv2d via weights_init (ae_standard.py:6-10) — NOT the ACAI author
    init the main family uses."""
    return nn.Conv(features, (kernel, kernel),
                   padding="SAME" if kernel > 1 else "VALID",
                   kernel_init=nn.initializers.kaiming_normal(),
                   bias_init=nn.initializers.zeros, name=name)


class BasicEncoderBlock(nn.Module):
    """conv→lrelu ×2 (+opt BN, dropout) + 2x2 avg-pool
    (reference: ae_standard.py:34-58)."""

    channels_out: int
    downsample: bool = True
    use_batchnorm: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cin = x.shape[-1]
        x = _leaky(_lconv(cin, 3)(x))
        x = _leaky(_lconv(self.channels_out, 3)(x))
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(x)
        if self.dropout:
            # reference uses Dropout2d: whole-channel dropout, i.e.
            # the mask broadcasts over the spatial dims
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                           deterministic=not train)(x)
        if self.downsample:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


def _up2_bilinear_axis(x: Array, axis: int) -> Array:
    """2x bilinear upsample along one axis (align_corners=False):
    out[2i] = 0.75*x[i] + 0.25*x[i-1], out[2i+1] = 0.75*x[i] + 0.25*x[i+1]
    with edge clamping — pure slicing, no gather (jax.image.resize builds
    an order-of-magnitude slower compile)."""
    n = x.shape[axis]
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    xm = jnp.concatenate([first, jax.lax.slice_in_dim(x, 0, n - 1,
                                                      axis=axis)], axis)
    xp = jnp.concatenate([jax.lax.slice_in_dim(x, 1, n, axis=axis),
                          last], axis)
    even = 0.75 * x + 0.25 * xm
    odd = 0.75 * x + 0.25 * xp
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape)


def bilinear_upsample2x(x: Array) -> Array:
    """NHWC 2x bilinear upsampling via two separable passes."""
    return _up2_bilinear_axis(_up2_bilinear_axis(x, 1), 2)


class BasicDecoderBlock(nn.Module):
    """conv→lrelu ×2 + bilinear 2x upsample
    (reference: ae_standard.py:60-80)."""

    channels_out: int
    do_upsample: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cin = x.shape[-1]
        x = _leaky(_lconv(cin, 3)(x))
        x = _leaky(_lconv(self.channels_out, 3)(x))
        if self.do_upsample:
            x = bilinear_upsample2x(x)
        return x


class BlockEncoder(nn.Module):
    """Block-list-configured encoder + 3x3 bottleneck pair
    (reference: ae_standard.py:83-103)."""

    channel_list: Sequence[int]
    downsample_list: Sequence[bool]
    latent_dim: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for cout, down in zip(self.channel_list, self.downsample_list):
            x = BasicEncoderBlock(cout, downsample=down)(x, train=train)
        x = _leaky(_lconv(x.shape[-1], 3)(x))
        x = _leaky(_lconv(self.latent_dim, 3)(x))
        return x


class BlockDecoder(nn.Module):
    """Mirror decoder (reference: ae_standard.py:124-160):
    reversed_channels = channel_list[::-1][1:] + [colors], upsample
    flags taken UN-reversed (downsample_list[block_id]), then a final
    3x3 conv to ``colors``. The reference creates a Sigmoid module but
    never applies it in forward — ``use_sigmoid`` stays opt-in."""

    channel_list: Sequence[int]
    downsample_list: Sequence[bool]
    colors: int = 1
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        x = z
        rev_channels = list(self.channel_list)[::-1][1:] + [self.colors]
        for cout, up in zip(rev_channels, self.downsample_list):
            x = BasicDecoderBlock(cout, do_upsample=up)(x, train=train)
        x = _lconv(self.colors, 3)(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x


class LegacyAE(nn.Module):
    """Plain block AE (reference: ae_standard.py AE:180-200)."""

    channel_list: Sequence[int] = (32, 64, 128)
    downsample_list: Sequence[bool] = (True, True, True)
    latent_dim: int = 64
    colors: int = 1

    def setup(self):
        self.enc = BlockEncoder(self.channel_list, self.downsample_list,
                                self.latent_dim)
        self.dec = BlockDecoder(self.channel_list, self.downsample_list,
                                self.colors)

    def encode(self, x: Array, train: bool = False) -> Array:
        return self.enc(x, train=train)

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.dec(z, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.decode(self.encode(x, train=train), train=train)


class LegacyAEAdv(nn.Module):
    """AE with a 1x1 conv latent compression pair
    (reference: ae_standard.py AEAdv:201-237)."""

    channel_list: Sequence[int] = (32, 64, 128)
    downsample_list: Sequence[bool] = (True, True, True)
    latent_dim: int = 64
    latent_dim_chan: int = 16
    colors: int = 1

    def setup(self):
        self.enc = BlockEncoder(self.channel_list, self.downsample_list,
                                self.latent_dim)
        self.dec = BlockDecoder(self.channel_list, self.downsample_list,
                                self.colors)
        # the reference wraps BOTH bottleneck projections in
        # Conv1x1 + BatchNorm + LeakyReLU (ae_standard.py:212-227)
        self.to_latent = nn.Conv(self.latent_dim_chan, (1, 1),
                                 padding="VALID")
        self.to_latent_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.from_latent = nn.Conv(self.channel_list[-1], (1, 1),
                                   padding="VALID")
        self.from_latent_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)

    def encode(self, x: Array, train: bool = False) -> Array:
        h = self.to_latent(self.enc(x, train=train))
        return _leaky(self.to_latent_bn(h, use_running_average=not train))

    def decode(self, z: Array, train: bool = False) -> Array:
        h = _leaky(self.from_latent_bn(self.from_latent(z),
                                       use_running_average=not train))
        return self.dec(h, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        return self.decode(self.encode(x, train=train), train=train)


class DiscriminatorSpatial(nn.Module):
    """Spatial critic: the full block-encoder stack, then 1x1 conv →
    flatten → linear → scalar, with NO extra activation in the head
    (reference: ae_standard.py:238-266)."""

    channel_list: Sequence[int] = (32, 64, 128)
    downsample_list: Sequence[bool] = (True, True, True)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for cout, down in zip(self.channel_list, self.downsample_list):
            x = BasicEncoderBlock(cout, downsample=down)(x, train=train)
        x = nn.Conv(x.shape[-1], (1, 1), padding="VALID")(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1)(x)[:, 0]


class DiscriminatorFakeReal(nn.Module):
    """Image-space real/fake critic (reference: ae_common.py:205-227):
    the VQ-VAE-style stride-16 Encoder (4 strided 4x4 convs alternating
    channel//2 / channel with ReLU, a 3x3 conv, n_res_block ResBlocks,
    final ReLU — ae_common.py:70-117), then a BIAS-FREE 1x1 conv to
    latent_dim_chan and sigmoid over the mean of all flattened features
    (a parameter-free head, not a learned Dense)."""

    channel: int = 128
    latent_dim_chan: int = 64
    n_res_block: int = 2
    n_res_channel: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        ch = self.channel
        x = x.astype(jnp.float32)
        for cout in (ch // 2, ch, ch // 2, ch):
            x = nn.relu(nn.Conv(cout, (4, 4), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                kernel_init=nn.initializers.kaiming_normal(),
                                bias_init=nn.initializers.zeros)(x))
        x = nn.Conv(ch, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.kaiming_normal(),
                    bias_init=nn.initializers.zeros)(x)
        for _ in range(self.n_res_block):
            h = nn.relu(x)
            h = nn.Conv(self.n_res_channel, (3, 3), padding="SAME",
                        kernel_init=nn.initializers.kaiming_normal(),
                        bias_init=nn.initializers.zeros)(h)
            h = nn.relu(h)
            h = nn.Conv(ch, (1, 1), padding="VALID",
                        kernel_init=nn.initializers.kaiming_normal(),
                        bias_init=nn.initializers.zeros)(h)
            x = x + h
        x = nn.relu(x)
        x = nn.Conv(self.latent_dim_chan, (1, 1), padding="VALID",
                    use_bias=False,
                    kernel_init=nn.initializers.kaiming_normal())(x)
        return nn.sigmoid(jnp.mean(x.reshape(x.shape[0], -1), axis=1))
