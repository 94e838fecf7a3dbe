"""Perceptual path length over latent interpolations.

Reference: evaluate/perceptual_path_length.py:58-120 — sample pairs of
slices, lerp latents at t and t+eps, LPIPS distance / eps^2, 1-99
percentile filter, mean.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import lpips_distance

_PPL_LPIPS = None


def compute_ppl(trainer, images: np.ndarray, num_pairs: int = 64,
                epsilon: float = 1e-4, seed: int = 0) -> float:
    """``images``: [N, H, W] pool of slices in [0,1]."""
    if trainer.lpips_params is None:
        from ..ops import get_lpips_params

        # resolve once per process (device-committed weights) and warn
        # loudly on the fallback modes; cache on the module so sweeps
        # don't reload ~59MB from disk per checkpoint
        global _PPL_LPIPS
        if _PPL_LPIPS is None:
            _PPL_LPIPS = get_lpips_params()
        lpips_params = _PPL_LPIPS
    else:
        lpips_params = trainer.lpips_params
    rs = np.random.RandomState(seed)
    n = images.shape[0]
    idx1 = rs.randint(0, n, num_pairs)
    idx2 = rs.randint(0, n, num_pairs)
    t = rs.uniform(0, 1, num_pairs).astype(np.float32)

    x1 = jnp.asarray(images[idx1], jnp.float32)[..., None]
    x2 = jnp.asarray(images[idx2], jnp.float32)[..., None]
    # route through the SR model when one is loaded — the reference PPL
    # decodes with use_sr_model=True (perceptual_path_length.py:102);
    # _sr_params falls back to the AE when no SR checkpoint is loaded
    z1 = trainer.encode(x1, use_sr_model=True)
    z2 = trainer.encode(x2, use_sr_model=True)
    tt = jnp.asarray(t).reshape((-1,) + (1,) * (z1.ndim - 1))
    z_a = tt * z2 + (1 - tt) * z1
    z_b = (tt + epsilon) * z2 + (1 - (tt + epsilon)) * z1
    img_a = trainer.decode(z_a, use_sr_model=True)
    img_b = trainer.decode(z_b, use_sr_model=True)
    d = np.asarray(lpips_distance(lpips_params, img_a, img_b,
                                  normalize=True)) / (epsilon ** 2)
    lo, hi = np.percentile(d, [1, 99])
    d = d[(d >= lo) & (d <= hi)]
    return float(np.mean(d))
