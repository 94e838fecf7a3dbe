"""Pallas TPU kernels for bandwidth-bound metric hot loops.

The XLA SSIM path (ops/metrics.py) issues 5 separable convolutions per
image pair — each re-streams the slices through VMEM. This fused kernel
loads each slice pair into VMEM ONCE and computes all five windowed
moments with separable shifted-add box filters on the VPU (win static
slice-adds per axis — cumulative sums do not lower on TPU pallas, see
_window_sum_2d), the SSIM map, and the scalar reduction, in a single
pass. One grid step per slice; the driver vmap-equivalent is the
pallas grid.

Used by evaluate.metrics_driver via ``ssim_volume_fused`` (falls back to
the XLA implementation off-TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _window_sum_2d(x: Array, win: int) -> Array:
    """Sum over win x win windows, VALID: win shifted adds per axis
    (separable box filter; cumsum isn't lowerable on TPU pallas).

    x: [H, W] → [H-win+1, W-win+1], all static slices + VPU adds.
    """
    h, w = x.shape
    sh = x[0:h - win + 1, :]
    for k in range(1, win):
        sh = sh + x[k:k + h - win + 1, :]
    sw = sh[:, 0:w - win + 1]
    for k in range(1, win):
        sw = sw + sh[:, k:k + w - win + 1]
    return sw


def _ssim_slice_kernel(a_ref, b_ref, out_ref, *, win: int,
                       data_range: float):
    i = pl.program_id(0)
    a = a_ref[0]
    b = b_ref[0]
    np_ = float(win * win)
    inv_np = 1.0 / np_
    cov_norm = np_ / (np_ - 1.0)

    ux = _window_sum_2d(a, win) * inv_np
    uy = _window_sum_2d(b, win) * inv_np
    uxx = _window_sum_2d(a * a, win) * inv_np
    uyy = _window_sum_2d(b * b, win) * inv_np
    uxy = _window_sum_2d(a * b, win) * inv_np

    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / \
        ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    # vector-width store (scalar VMEM stores aren't lowerable)
    out_ref[pl.ds(i, 1), :] = jnp.full((1, 128), jnp.mean(s), jnp.float32)


@partial(jax.jit,
         static_argnames=("data_range", "win_size", "interpret"))
def ssim_volume_pallas(ref: Array, dist: Array, data_range: float = 1.0,
                       win_size: int = 7, interpret: bool = False) -> Array:
    """Per-slice SSIM over [S, H, W] volumes — fused pallas kernel."""
    s, h, w = ref.shape
    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    kernel = partial(_ssim_slice_kernel, win=win_size,
                     data_range=float(data_range))
    # per-slice scalars land in one small VMEM-resident [S_pad, 128]
    # buffer (whole-array block; each grid step writes its own row)
    s_pad = -(-s // 8) * 8
    out = pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s_pad, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, 128), jnp.float32),
        interpret=interpret,
    )(ref, dist)
    return out[:s, 0]


def ssim_volume_fused(ref: Array, dist: Array, data_range: float = 1.0,
                      win_size: int = 7) -> Array:
    """SSIM per slice: pallas on TPU, XLA convolution path elsewhere.

    The pallas kernel bakes ``data_range`` in as a compile-time constant
    (one compile per distinct value); a TRACED data_range (a caller
    jitting over it) routes to the XLA path on every backend instead of
    crashing at the float() concretization only on TPU."""
    if (jax.default_backend() == "tpu"
            and not isinstance(data_range, jax.core.Tracer)):
        return ssim_volume_pallas(ref, dist, data_range=float(data_range),
                                  win_size=win_size)
    from .metrics import ssim_volume
    return ssim_volume(jnp.asarray(ref), jnp.asarray(dist), data_range,
                       win_size)
