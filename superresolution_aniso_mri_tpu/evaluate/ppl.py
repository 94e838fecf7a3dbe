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

    # bound pairs-in-flight by the same decoder-activation budget the
    # synthesis/reconstruction paths use (two decodes + a VGG forward
    # per chunk), instead of one num_pairs-sized program
    from ..infer.patches import _image_plane, _widen_tiles
    from ..infer.super_volume import _auto_decode_batch

    h, w = images.shape[1], images.shape[2]
    depth = getattr(getattr(trainer, "model_config", None), "depth", 32)
    cap = _auto_decode_batch(num_pairs, h, w, depth) or num_pairs
    d_parts = []
    for i in range(0, num_pairs, cap):
        j1, j2 = idx1[i:i + cap], idx2[i:i + cap]
        # colors>=2 stems (ACDCLBL) take an [image, label] channel pair;
        # PPL measures the image manifold — labels ride as zeros
        x1 = _widen_tiles(trainer,
                          jnp.asarray(images[j1], jnp.float32)[..., None])
        x2 = _widen_tiles(trainer,
                          jnp.asarray(images[j2], jnp.float32)[..., None])
        # route through the SR model when one is loaded — the reference
        # PPL decodes with use_sr_model=True
        # (perceptual_path_length.py:102); _sr_params falls back to the
        # AE when no SR checkpoint is loaded
        z1 = trainer.encode(x1, use_sr_model=True)
        z2 = trainer.encode(x2, use_sr_model=True)
        tt = jnp.asarray(t[i:i + cap]).reshape(
            (-1,) + (1,) * (z1.ndim - 1))
        z_a = tt * z2 + (1 - tt) * z1
        z_b = (tt + epsilon) * z2 + (1 - (tt + epsilon)) * z1
        img_a = _image_plane(trainer.decode(z_a, use_sr_model=True))
        img_b = _image_plane(trainer.decode(z_b, use_sr_model=True))
        d_parts.append(np.asarray(lpips_distance(
            lpips_params, img_a[..., :1], img_b[..., :1],
            normalize=True)) / (epsilon ** 2))
    d = np.concatenate(d_parts)
    lo, hi = np.percentile(d, [1, 99])
    d = d[(d >= lo) & (d <= hi)]
    return float(np.mean(d))
