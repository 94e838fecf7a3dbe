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
    per_volume, ids = [], []
    for vol in volumes:
        x = jnp.asarray(vol.image, jnp.float32)[..., None]
        recon = np.asarray(trainer.predict(x))[..., 0]
        per_volume.append(compute_volume_metrics(vol.image, recon))
        ids.append(vol.patient_id)
    return {"per_volume": dict(zip(ids, per_volume)),
            "aggregate": aggregate_metrics(per_volume)}
