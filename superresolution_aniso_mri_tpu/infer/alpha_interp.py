"""Alpha-probe driven latent interpolation at inference time.

Reference: kwatsch/alpha/img_interpolation.py — build per-pair scalar
features (normalized slice ids, frame id, spacing, slice count), run the
trained probe on the concatenated latents + features, and mix with the
predicted coefficients instead of fixed alphas.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..train.steps import alpha_mix


def synthesize_cardiac_features(normalized_frame_id: float,
                                orig_num_slices: int, spacing: float,
                                downsample_steps: int = 2) -> np.ndarray:
    """Per-adjacent-pair feature rows [K-1, 5]:
    (norm slice_id_from, norm slice_id_to, norm frame_id, z spacing,
    orig slice count) — reference:
    kwatsch/alpha/img_interpolation.py:5-22."""
    slice_range = np.arange(0, orig_num_slices)[::downsample_steps]
    id_from = (slice_range[:-1] + 1) / orig_num_slices
    id_to = (slice_range[1:] + 1) / orig_num_slices
    n = id_from.shape[0]
    return np.concatenate([
        id_from[:, None], id_to[:, None],
        np.full((n, 1), normalized_frame_id),
        np.full((n, 1), spacing),
        np.full((n, 1), orig_num_slices),
    ], axis=1).astype(np.float32)


def create_features(feature_dict: Dict,
                    downsample_steps: int = 2) -> np.ndarray:
    """Reference: kwatsch/alpha/img_interpolation.py:24-41 (cardiac is
    the only anatomy the reference implements)."""
    if feature_dict.get("anatomy") == "cardiac":
        return synthesize_cardiac_features(
            feature_dict["norm_frame_id"], feature_dict["orig_num_slices"],
            feature_dict["spacing"], downsample_steps=downsample_steps)
    raise NotImplementedError(
        f"anatomy {feature_dict.get('anatomy')!r} not supported")


def get_alpha_probe_features(feature_dict: Dict, batch_item: Dict
                             ) -> np.ndarray:
    """Train-time feature rows from a batch's metadata
    (reference: kwatsch/alpha/common.py:3 get_alpha_probe_features).

    Batches from TripletSampler already carry the assembled
    'alpha_features' [B, 5] (data/pairs.py) — that is returned verbatim.
    Raw metadata keys are accepted as a fallback for hand-built batches;
    a batch carrying neither is an error (silent zero features would
    train/evaluate the probe on garbage)."""
    if "alpha_features" in batch_item:
        return np.asarray(batch_item["alpha_features"], np.float32)
    meta_keys = ("slice_id_from", "slice_id_to", "num_slices")
    if not any(k in batch_item for k in meta_keys):
        raise KeyError(
            "batch carries neither 'alpha_features' nor raw slice "
            "metadata (slice_id_from/slice_id_to/num_slices) — probe "
            "features cannot be constructed")
    # derive the batch size from whatever is present — the raw-metadata
    # fallback must not require 'alpha_from'
    size_src = next(k for k in ("alpha_from",) + meta_keys
                    if k in batch_item)
    b = np.asarray(batch_item[size_src]).shape[0]
    n = np.asarray(batch_item.get("num_slices", np.full(
        b, feature_dict.get("orig_num_slices", 0))), np.float64)
    n_safe = np.where(n > 0, n, 1.0)
    # normalize EXACTLY like the training rows (data/pairs.py:128-132,
    # reference base_alpha_trainer.py:178-189: (id+1)/num_slices) — raw
    # slice ids here would hand the probe out-of-distribution features,
    # the very garbage this function's error guard exists to prevent
    s_from = np.asarray(batch_item.get("slice_id_from", np.zeros(b)),
                        np.float64)
    s_to = np.asarray(batch_item.get("slice_id_to", np.zeros(b)),
                      np.float64)
    return np.concatenate([
        ((s_from + 1.0) / n_safe)[:, None],
        ((s_to + 1.0) / n_safe)[:, None],
        np.asarray(batch_item.get("frame_id", np.full(
            b, feature_dict.get("norm_frame_id", 0.0))))[:, None],
        np.asarray(batch_item.get("spacing", np.full(
            b, feature_dict.get("spacing", 1.0))))[:, None],
        n[:, None],
    ], axis=1).astype(np.float32)


def latent_space_interp_pred_alpha(trainer, img1, img2,
                                   downsample_steps: int,
                                   feature_dict: Optional[Dict] = None):
    """Mix adjacent-slice latents with PROBE-PREDICTED coefficients and
    decode (reference: kwatsch/alpha/img_interpolation.py:44-92
    latent_space_interp_pred_alpha). ``img1``/``img2``: [K-1, H, W, C]
    adjacent-slice stacks. Returns (decoded [K-1, H, W, C],
    alphas [K-1, num_out])."""
    if feature_dict is None:
        raise ValueError(
            "latent_space_interp_pred_alpha requires a feature_dict "
            "({'anatomy': 'cardiac', 'norm_frame_id', 'orig_num_slices', "
            "'spacing'}) — the probe's coefficients depend on slice "
            "geometry")
    z1 = trainer.encode(img1)
    z2 = trainer.encode(img2)
    features = jnp.asarray(create_features(feature_dict, downsample_steps))
    z_cat = jnp.concatenate([z1, z2], axis=-1)
    alphas = trainer.predict_alpha(z_cat, features)
    z_mix = alpha_mix(alphas, z1, z2, trainer.num_alphas,
                      int(trainer.args["latent"]),
                      getattr(trainer.loss_config, "alpha_scheme", ""))
    return trainer.decode(z_mix), np.asarray(alphas)
