"""Dataset-level evaluation driver: synthesize HR volumes, score, save.

Reference: evaluate/create_HR_images.py:239-424 create_hr_images — loop
over patient volumes, super-resolve (model or conventional interp),
compute SSIM/PSNR/VIF on all/synth slices, NIfTI save with the new
z-spacing, aggregate mean±std, npz metric dump.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np

from ..data import Volume
from ..infer import create_simple_interpolation, create_super_volume
from ..utils import write_image
from .metrics_driver import aggregate_metrics, compute_volume_metrics

FILTER_BENCH = ("linear", "bspline", "lanczos", "nearest")


def create_hr_images(trainer, volumes: Iterable[Volume],
                     downsample_steps: int,
                     output_dir: Optional[str] = None,
                     interpol_method: str = "model",
                     save_volumes: bool = False,
                     use_original: bool = False,
                     eval_axis: int = 0,
                     compute_percept_metrics: bool = False,
                     verbose: bool = False) -> Dict:
    """Evaluate SR quality over a dataset of HR volumes.

    ``interpol_method``: 'model' → latent-interpolation synthesis;
    any of FILTER_BENCH → conventional z interpolation baseline.
    Returns {'per_volume': {...}, 'aggregate': {...}}.
    """
    alpha_range = np.linspace(0, 1, downsample_steps + 1)[1:-1]
    per_volume: List[Dict] = []
    per_volume_ids = []
    lpips_params = trainer.lpips_params if (
        trainer is not None and compute_percept_metrics) else None

    for vol in volumes:
        hr = vol.image_hr if vol.image_hr is not None else vol.image
        hr = np.asarray(hr, np.float32)
        if interpol_method == "model":
            result = create_super_volume(
                trainer, vol.image, alpha_range=alpha_range,
                downsample_steps=downsample_steps,
                generate_inbetween_slices=True,
                use_original=use_original)
            upsampled = result["upsampled_image"]
            conv = False
        else:
            upsampled = create_simple_interpolation(
                vol.image, downsample_steps, method=interpol_method,
                generate_inbetween_slices=True)
            conv = True
        n = min(len(hr), len(upsampled))
        metrics = compute_volume_metrics(
            hr[:n], upsampled[:n], downsample_steps=downsample_steps,
            conv_interpol=conv, eval_axis=eval_axis,
            lpips_params=lpips_params)
        per_volume.append(metrics)
        per_volume_ids.append(vol.patient_id)
        if verbose:
            print(f"{vol.patient_id}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
        if save_volumes and output_dir:
            os.makedirs(output_dir, exist_ok=True)
            new_spacing = np.array(vol.spacing, np.float64).copy()
            new_spacing[0] = new_spacing[0] / downsample_steps
            fname = os.path.join(
                output_dir, f"{vol.patient_id}_{interpol_method}"
                            f"_{downsample_steps}x.nii.gz")
            write_image(fname, upsampled.astype(np.float32),
                        spacing=new_spacing)

    agg = aggregate_metrics(per_volume)
    if verbose:
        for k, (m, s) in agg.items():
            print(f"  {k}: {m:.4f} ({s:.4f})")
    result = {"per_volume": dict(zip(per_volume_ids, per_volume)),
              "aggregate": agg}
    if lpips_params is not None:
        from ..ops.lpips import lpips_weights_info
        result["lpips_mode"] = lpips_weights_info()["mode"]
    if output_dir:
        save_metrics(output_dir, None, result, downsample_steps,
                     interpol_method, eval_axis)
    return result


def save_metrics(output_dir: str, eval_dataset, metrics_dict: Dict,
                 downsample_steps: int, interpol_method: str,
                 eval_axis: int) -> None:
    """npz metric dump naming scheme (reference: evaluate/common.py:11-27)."""
    results_dir = os.path.join(output_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    if eval_axis == 0:
        fname = f"{interpol_method}_{downsample_steps}x.npz"
    else:
        fname = f"{interpol_method}_{downsample_steps}x_axis{eval_axis}.npz"
    if eval_dataset is not None:
        fname = f"{eval_dataset}_" + fname
    flat = {}
    for pid, m in metrics_dict["per_volume"].items():
        for k, v in m.items():
            flat.setdefault(k, []).append(v)
    extra = {}
    if metrics_dict.get("lpips_mode"):
        extra["lpips_mode"] = np.array(metrics_dict["lpips_mode"])
    np.savez(os.path.join(results_dir, fname),
             patient_ids=np.array(list(metrics_dict["per_volume"].keys())),
             **{k: np.array(v) for k, v in flat.items()}, **extra)
