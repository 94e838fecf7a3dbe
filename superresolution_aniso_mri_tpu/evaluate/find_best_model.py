"""Epoch-checkpoint sweep for model selection.

Reference: evaluate/find_best_model.py:43-135 — evaluate each saved epoch
checkpoint on validation volumes, track best SSIM/PSNR/VIF overall and on
synthesized-only slices, dump npz.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict, Iterable, List, Optional

import numpy as np

from ..data import Volume
from .create_hr_images import create_hr_images

METRICS_TRACKED = ("ssim", "psnr", "vif", "ssim_synth", "psnr_synth",
                   "vif_synth")


def list_epoch_checkpoints(exper_dir: str) -> List[int]:
    files = glob.glob(os.path.join(exper_dir, "models", "*.models"))
    epochs = []
    for f in files:
        m = re.fullmatch(r"(\d+)\.models", os.path.basename(f))
        if m:
            epochs.append(int(m.group(1)))
    return sorted(epochs)


def find_best_val_model(exper_dir: str, volumes: Iterable[Volume],
                        downsample_steps: int,
                        epoch_range: Optional[Iterable[int]] = None,
                        batched: bool = False,
                        verbose: bool = False,
                        latent_interp: str = "linear") -> Dict:
    """Sweep checkpoints; returns per-epoch aggregates and the argmax per
    tracked metric. Saves model_perf_*.npz into the experiment dir
    (reference: find_best_model.py:99-108).

    ``batched=True`` runs synthesis + per-slice metrics for all volumes
    of a shape-group in ONE device program per epoch (evaluate/sweep.py)
    — the fast path for long sweeps; scores only the model-generated
    region (verbatim tail slices excluded). ``latent_interp`` selects
    the latent z-mixing scheme ('linear' | 'cubic') so selection can
    match the serving configuration."""
    from ..train import get_trainer

    volumes = list(volumes)
    if epoch_range is None:
        epoch_range = list_epoch_checkpoints(exper_dir)
    epoch_range = list(epoch_range)
    if not epoch_range:
        raise ValueError(f"no epoch checkpoints in {exper_dir}/models")

    history: Dict[str, List[float]] = {k: [] for k in METRICS_TRACKED}
    # build (and compile) the trainer once; swap checkpoints in-place —
    # the reference re-instantiates per epoch (find_best_model.py:68-69)
    trainer = get_trainer(exper_dir, model_nbr=None, eval_mode=True)
    prep = None
    if batched:
        # group/pad/stack the validation set ONCE — only the params
        # change across the sweep, so per-epoch restacking is waste
        from .sweep import evaluate_prepared, prepare_sweep_batches
        prep = prepare_sweep_batches(trainer, volumes, downsample_steps)
    for epoch in epoch_range:
        trainer.load(os.path.join(exper_dir, "models", f"{epoch}.models"))
        if batched:
            # per-frame entries so multi-frame patients weigh like the
            # reference's global per-frame lists (and like the
            # non-batched path); nanmean drops NaN entries (e.g. VIF on
            # an all-uniform volume) instead of poisoning the epoch
            per_vol = evaluate_prepared(trainer, prep, latent_interp)
            for k in METRICS_TRACKED:
                history[k].append(float(np.nanmean(
                    [m[k] for m in per_vol.values()])))
        else:
            res = create_hr_images(trainer, volumes, downsample_steps,
                                   save_volumes=False,
                                   latent_interp=latent_interp)
            for k in METRICS_TRACKED:
                history[k].append(res["aggregate"][k][0])
        if verbose:
            print(f"epoch {epoch}: " + " ".join(
                f"{k}={history[k][-1]:.4f}" for k in METRICS_TRACKED))

    # NaN-robust argmax: an epoch whose metric is NaN must never be
    # selected as "best"; a metric that is NaN at EVERY epoch reports
    # epoch=None/value=nan instead of confidently naming the first
    # epoch, and legitimate +inf values (exact reconstruction → PSNR)
    # survive as inf instead of being clipped to finfo.max
    best = {}
    for k, v in history.items():
        vals = np.asarray(v, np.float64)
        usable = ~np.isnan(vals)
        if not usable.any():
            best[k] = {"epoch": None, "value": float("nan")}
            continue
        cmp = np.where(usable, vals, -np.inf)
        idx = int(np.argmax(cmp))
        best[k] = {"epoch": int(epoch_range[idx]),
                   "value": float(vals[idx])}
    out_file = os.path.join(exper_dir,
                            f"model_perf_ds{downsample_steps}.npz")
    np.savez(out_file, epochs=np.array(epoch_range),
             **{k: np.array(v) for k, v in history.items()})
    return {"epochs": epoch_range, "history": history, "best": best}
