"""Patch-tiled reconstruction/interpolation.

Reference: evaluate/common.py:44-68 (eval_on_different_patch_size /
create_recon_from_diff_psize — unfold into patches, reconstruct, re-grid)
and kwatsch/img_interpolation.py:20-55 (patch-tiled interpolation).
TPU-shape: the unfold is a reshape/transpose, ALL patches of ALL slices
reconstruct in one batched call, and the re-assembly is the inverse
reshape — no per-slice Python loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def extract_patches(volume: Array, patch: int) -> Array:
    """[S, H, W] → [S * (H//p) * (W//p), p, p, 1] (non-overlapping).
    H and W must divide ``patch`` — a silent crop here would make the
    round trip return a smaller volume than the input."""
    s, h, w = volume.shape
    if h % patch or w % patch:
        raise ValueError(
            f"spatial dims ({h}, {w}) must be multiples of patch "
            f"{patch} — pad the volume first (data.pad_to_size)")
    gh, gw = h // patch, w // patch
    x = volume.reshape(s, gh, patch, gw, patch)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(s * gh * gw, patch, patch, 1)


def assemble_patches(patches: Array, s: int, h: int, w: int,
                     patch: int) -> Array:
    """Inverse of extract_patches → [S, gh*p, gw*p]."""
    gh, gw = h // patch, w // patch
    x = patches.reshape(s, gh, gw, patch, patch)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(s, gh * patch, gw * patch)


def _widen_tiles(trainer, tiles: Array) -> Array:
    """Pad single-channel tiles to the model's input-channel count
    (colors>=2 stems — ACDCLBL families — reject 1-channel input): the
    label channel rides as zeros, the same convention (and warning) as
    the volume pipeline when no labels are available."""
    colors = int(getattr(getattr(trainer, "model_config", None),
                         "colors", 1) or 1)
    if colors <= tiles.shape[-1]:
        return tiles
    import warnings
    warnings.warn(
        f"patch helpers: model expects {colors} input channels but only "
        f"the image plane is available — feeding zeros for the rest "
        f"(same fallback as create_super_volume without labels)")
    pad = jnp.zeros(tiles.shape[:-1] + (colors - tiles.shape[-1],),
                    tiles.dtype)
    return jnp.concatenate([tiles, pad], axis=-1)


def _image_plane(out) -> Array:
    """Decode output → image tensor (MultiChannelAE decodes to a
    {'image', 'soft_probs'} dict; plain models return an array)."""
    return jnp.asarray(out["image"] if isinstance(out, dict) else out)


def reconstruct_in_patches(trainer, volume, patch: int = 32) -> np.ndarray:
    """Reconstruct a [S, H, W] volume through the AE at a smaller patch
    size than trained (reference: evaluate/common.py:44-68)."""
    volume = jnp.asarray(volume, jnp.float32)
    s, h, w = volume.shape
    tiles = _widen_tiles(trainer, extract_patches(volume, patch))
    recon = _image_plane(trainer.predict(tiles))
    out = assemble_patches(recon[..., 0], s, h, w, patch)
    return np.asarray(out)


def interpolate_in_patches(trainer, img1, img2, alpha: float,
                           patch: int = 32) -> np.ndarray:
    """Latent interpolation of one slice pair, patch-tiled
    (reference: kwatsch/img_interpolation.py:20-55
    latent_space_interp_diff_patch_size, which routes through the SR
    model when one is loaded).

    Alpha convention: ``alpha`` weights ``img1`` — same orientation as
    this package's latent_space_interp, and the MIRROR of the
    reference helper (whose alpha weights img2); sweep 1-alpha to
    reproduce reference notebooks verbatim."""
    a = jnp.asarray(img1, jnp.float32)[None]
    b = jnp.asarray(img2, jnp.float32)[None]
    h, w = a.shape[1:3]
    pa = _widen_tiles(trainer, extract_patches(a, patch))
    pb = _widen_tiles(trainer, extract_patches(b, patch))
    z = (alpha * trainer.encode(pa, use_sr_model=True)
         + (1.0 - alpha) * trainer.encode(pb, use_sr_model=True))
    dec = _image_plane(trainer.decode(z, use_sr_model=True))
    return np.asarray(assemble_patches(dec[..., 0], 1, h, w, patch)[0])
