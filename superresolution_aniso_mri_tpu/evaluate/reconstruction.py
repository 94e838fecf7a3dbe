"""Reconstruction-only model evaluation (no synthesis).

Reference: evaluate/evaluate_reconstruction.py:7-34.
"""
from __future__ import annotations

from typing import Dict, Iterable

import numpy as np
import jax.numpy as jnp

from ..data import Volume
from .metrics_driver import aggregate_metrics, compute_volume_metrics


def evaluate_model_reconstruction(trainer, volumes: Iterable[Volume]
                                  ) -> Dict:
    from ..infer.super_volume import _auto_decode_batch, bucket_size

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
        x = np.zeros((s_pad, h, w, 1), np.float32)
        x[:s, ..., 0] = img
        if chunk is None:
            recon = np.asarray(trainer.predict(jnp.asarray(x)))[..., 0]
        else:
            parts = [np.asarray(trainer.predict(
                jnp.asarray(x[i:i + chunk])))[..., 0]
                for i in range(0, s_pad, chunk)]
            recon = np.concatenate(parts, axis=0)
        per_volume.append(compute_volume_metrics(img, recon[:s]))
        ids.append(vol.patient_id)
    if not per_volume:
        raise ValueError("evaluate_model_reconstruction: no volumes to "
                         "evaluate (empty dataset/split?)")
    return {"per_volume": dict(zip(ids, per_volume)),
            "aggregate": aggregate_metrics(per_volume)}
