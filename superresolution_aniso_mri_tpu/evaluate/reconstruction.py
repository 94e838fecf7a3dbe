"""Reconstruction-only model evaluation (no synthesis).

Reference: evaluate/evaluate_reconstruction.py:7-34.
"""
from __future__ import annotations

from typing import Dict, Iterable

import numpy as np
import jax.numpy as jnp

from ..data import Volume
from .metrics_driver import (IdUniquifier, aggregate_metrics,
                             compute_volume_metrics)


def _image_of(pred) -> np.ndarray:
    """predict() output → image array (MultiChannelAE returns a
    {'image','soft_probs'} dict, plain models an array)."""
    return np.asarray(pred["image"] if isinstance(pred, dict) else pred)


def evaluate_model_reconstruction(trainer, volumes: Iterable[Volume]
                                  ) -> Dict:
    from ..infer.super_volume import (_auto_decode_batch, bucket_size,
                                      model_label_semantics)

    # colors>=2 stems (ACDCLBL families) need an [image, label] input
    # pair — ride the volume's labels when they sit on the image grid,
    # zeros otherwise (the same convention as the synthesis path)
    needs_label_channel, _ = model_label_semantics(trainer)
    uniq = IdUniquifier()
    per_volume, ids = [], []
    for vol in volumes:
        img = np.asarray(vol.image, np.float32)
        s, h, w = img.shape
        # pad the slice count to a bucket (bounds recompiles over
        # ragged datasets) and chunk the forward like the synthesis
        # path's HBM budget — one 500-slice 256² call would OOM
        depth = getattr(getattr(trainer, "model_config", None), "depth", 32)
        chunk = _auto_decode_batch(bucket_size(s), h, w, depth)
        s_pad = bucket_size(s)
        if chunk is not None:
            # round the chunk down to a divisor of s_pad so every slice
            # x[i:i+chunk] has the same shape — a ragged tail would
            # compile one extra program per distinct remainder (~20 s
            # each on the axon backend)
            while s_pad % chunk:
                chunk -= 1
        c = 2 if needs_label_channel else 1
        x = np.zeros((s_pad, h, w, c), np.float32)
        x[:s, ..., 0] = img
        if needs_label_channel:
            lbl = getattr(vol, "labels", None)
            if lbl is not None and np.asarray(lbl).shape == img.shape:
                x[:s, ..., 1] = np.asarray(lbl, np.float32)
        if chunk is None:
            recon = _image_of(trainer.predict(jnp.asarray(x)))[..., 0]
        else:
            parts = [_image_of(trainer.predict(
                jnp.asarray(x[i:i + chunk])))[..., 0]
                for i in range(0, s_pad, chunk)]
            recon = np.concatenate(parts, axis=0)
        per_volume.append(compute_volume_metrics(img, recon[:s]))
        ids.append(uniq.take(vol.patient_id))
    if not per_volume:
        raise ValueError("evaluate_model_reconstruction: no volumes to "
                         "evaluate (empty dataset/split?)")
    return {"per_volume": dict(zip(ids, per_volume)),
            "aggregate": aggregate_metrics(per_volume)}
