"""Space-to-depth packed decoder for inference.

The decoder's hot convolutions run at full resolution with only
``depth`` (32) channels — occupying 32 of the MXU's 128 output lanes
(~25 TFLOP/s measured on v5e vs ~108 TFLOP/s for 128-channel convs at
half resolution). Because every upsample in the decoder is a NEAREST 2x
(reference: networks/acai_vanilla.py:92 nn.Upsample), the pattern

    u --nearest 2x--> x --conv3x3(W), SAME, zero pad--> y

is EXACTLY equal to one conv3x3 on ``u`` whose 4*cout output channels
are the 2x2 phases of ``y``:

    y(2p+a, 2q+b) = sum_{di,dj} W[di,dj] * u(floor((2p+a+di)/2),
                                             floor((2q+b+dj)/2))

i.e. per phase a the three taps di=-1,0,1 collapse onto u-offsets
{-1,0} (a=0) or {0,+1} (a=1): tap(-1)=W[0], tap(0)=W[1]+W[2] for a=0 and
tap(0)=W[0]+W[1], tap(+1)=W[2] for a=1. Same FLOPs, 4x the output
lanes. The packed result converts back to spatial layout with a free
depth-to-space reshape before the next unpacked conv.

Exactness is asserted against ``model.decode`` in tests; the packed
path requires even spatial dims at each packing point and the standard
decoder shape (nearest upsampling, no residual blocks).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.config import AEConfig

Array = jax.Array

LEAKY_SLOPE = 0.01


def pack_after_upsample_kernel(w: Array) -> Array:
    """[3, 3, cin, cout] HWIO → [3, 3, cin, 4*cout] whose output channel
    layout is (a, b, cout): phase-major 2x2 blocks."""
    cin, cout = w.shape[2], w.shape[3]
    p = jnp.zeros((3, 3, cin, 2, 2, cout), w.dtype)
    for a in (0, 1):
        for di in (-1, 0, 1):
            ti = (a + di) // 2 + 1
            for b in (0, 1):
                for dj in (-1, 0, 1):
                    tj = (b + dj) // 2 + 1
                    p = p.at[ti, tj, :, a, b, :].add(w[di + 1, dj + 1])
    return p.reshape(3, 3, cin, 4 * cout)


def depth_to_space2(x: Array) -> Array:
    """[N, H, W, 4*c] (phase-major (a, b, c) layout) → [N, 2H, 2W, c]."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, 2 * h, 2 * w, c)


def _conv(x: Array, kernel: Array, bias: Array) -> Array:
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return y + bias


def _leaky(x: Array) -> Array:
    return jax.nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def _bn_eval(x: Array, params: Dict, stats: Dict, dt,
             eps: float = 1e-5) -> Array:
    """Eval-mode batch norm mirroring flax nn.BatchNorm(dtype=dt)
    EXACTLY: promote every operand to the compute dtype first and use
    flax's operation order (mul = rsqrt(var+eps)*scale; y = (x-mean)*mul
    + bias) — computing in f32 would round differently for bf16 models
    and break the packed path's bit-identical contract."""
    mean = stats["mean"].astype(dt)
    var = stats["var"].astype(dt)
    scale = params["scale"].astype(dt)
    bias = params["bias"].astype(dt)
    mul = jax.lax.rsqrt(var + jnp.asarray(eps, dt)) * scale
    return (x.astype(dt) - mean) * mul + bias


def make_packed_decoder(cfg: AEConfig):
    """Eval-mode decode with every upsample folded into the following
    conv (packed lanes). Falls back to ``model.decode`` semantics
    exactly; caller guarantees nearest upsampling and n_res_block == 0.
    Returns decode(variables, z) -> x̂."""
    assert not cfg.n_res_block, "packed decoder: no residual blocks"
    scales = cfg.scales
    dt = cfg.dtype

    def decode(variables: Dict[str, Any], z: Array) -> Array:
        dec = variables["params"]["dec"]
        bstats = variables.get("batch_stats", {}).get("dec", {})
        x = z.astype(dt)
        for i, scale in enumerate(range(scales - 1, -1, -1)):
            b1 = dec[f"Conv_{2 * i}"]["bias"].astype(dt)
            if i == 0:
                w1 = dec[f"Conv_{2 * i}"]["kernel"].astype(dt)
                x = _leaky(_conv(x, w1, b1))
            else:
                # conv1 consumes the previous scale's (virtual) 2x
                # nearest upsample — packed: 4x the output lanes
                # pack tap sums in float32 BEFORE the compute-dtype
                # cast: summing pre-cast bf16 taps would round
                # differently than the plain decoder's f32-accumulating
                # conv and break the bit-exactness contract
                pk = pack_after_upsample_kernel(
                    dec[f"Conv_{2 * i}"]["kernel"].astype(jnp.float32)
                ).astype(dt)
                pb = jnp.tile(b1, 4)
                x = depth_to_space2(_leaky(_conv(x, pk, pb)))
            w2 = dec[f"Conv_{2 * i + 1}"]["kernel"].astype(dt)
            b2 = dec[f"Conv_{2 * i + 1}"]["bias"].astype(dt)
            x = _leaky(_conv(x, w2, b2))
            if cfg.use_batchnorm:
                x = _bn_eval(x, dec[f"BatchNorm_{i}"],
                             bstats[f"BatchNorm_{i}"], dt)
        # final conv after the last upsample — packed
        bf = dec[f"Conv_{2 * scales}"]["bias"].astype(dt)
        pkf = pack_after_upsample_kernel(
            dec[f"Conv_{2 * scales}"]["kernel"].astype(jnp.float32)
        ).astype(dt)
        x = _leaky(_conv(x, pkf, jnp.tile(bf, 4)))
        x = depth_to_space2(x)
        wo = dec["out"]["kernel"].astype(dt)
        bo = dec["out"]["bias"].astype(dt)
        x = _conv(x, wo, bo)
        if cfg.use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x.astype(jnp.float32)

    return decode


def packable(cfg: AEConfig, variables: Dict[str, Any]) -> bool:
    """True when the packed decoder applies: VanillaACAI-shaped decoder
    with nearest upsampling (no ConvTranspose params), no res blocks."""
    try:
        dec = variables["params"]["dec"]
    except (KeyError, TypeError):
        return False
    if cfg.n_res_block:
        return False
    if any(k.startswith("ConvTranspose") for k in dec):
        return False
    needed = [f"Conv_{i}" for i in range(2 * cfg.scales + 1)] + ["out"]
    return all(k in dec for k in needed)
