"""Per-volume metric aggregation (all-slices + synthesized-only).

Reference: evaluate/create_HR_images.py:121-178 compute_metrics and the
per-slice loops of evaluate/metrics.py:65-243 — here one device call per
metric per volume (vmapped over slices, masked aggregation on device).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import (lpips_distance, masked_mean, psnr_volume,
                   synth_slice_mask, vif_volume)
from ..ops.pallas_kernels import ssim_volume_fused


def compute_volume_metrics(reference: np.ndarray, upsampled: np.ndarray,
                           downsample_steps: Optional[int] = None,
                           conv_interpol: bool = False,
                           eval_axis: int = 0,
                           lpips_params=None,
                           data_range: float = 1.0) -> Dict[str, float]:
    """SSIM/PSNR/VIF (+optional LPIPS) over a [S, H, W] volume pair.

    Returns '<metric>' (all slices) and '<metric>_synth' (synthesized
    slices only, original grid slices excluded — reference
    metrics.py:29-45 determine_original_sliceids). For ``eval_axis != 0``
    the volume is re-sliced along that axis and all-black slices skipped
    (reference: metrics.py:127-145); there is no synthesized-only notion
    on a long-axis view (every re-sliced plane mixes original and
    synthesized rows), so the '_synth' entries equal the all-slice
    values there — same semantics as the reference's long-axis calls
    (which pass downsample_steps=None, making orig_slice_ids empty).
    """
    ref = np.asarray(reference, np.float32)
    up = np.asarray(upsampled, np.float32)
    if ref.ndim == 4:
        ref = ref[:, 0] if ref.shape[1] == 1 else ref.squeeze()
    if up.ndim == 4:
        up = up[:, 0] if up.shape[1] == 1 else up.squeeze()
    if ref.ndim != 3 or up.ndim != 3:
        raise ValueError(
            f"compute_volume_metrics expects [S, H, W] volumes (got "
            f"{ref.shape} vs {up.shape}); score true 4D cine volumes "
            f"frame by frame (create_hr_images/compare_quantitative do)")

    if eval_axis != 0:
        ref = np.swapaxes(ref, 0, eval_axis)
        up = np.swapaxes(up, 0, eval_axis)

    s = ref.shape[0]
    all_mask = np.ones(s, bool)
    if eval_axis != 0:
        all_mask &= ref.reshape(s, -1).sum(axis=1) > 0
    if downsample_steps is not None and eval_axis == 0:
        synth = synth_slice_mask(s, downsample_steps, conv_interpol)
    else:
        synth = all_mask.copy()
    synth = synth & all_mask  # black-slice skip applies to synth too

    ref_j = jnp.asarray(ref)
    up_j = jnp.asarray(up)
    # long-axis views can be thinner than the 7x7 window → shrink to an
    # odd window that fits (reference: metrics.py:146-152 win_size=5
    # fallback; re-sliced stacks can be thinner than 5 too)
    m = min(ref.shape[1], ref.shape[2])
    win = 7 if m >= 8 else min(5, m)
    if win % 2 == 0:
        win -= 1
    if win >= 3:
        ssim_s = ssim_volume_fused(ref_j, up_j, data_range,
                                   win)  # pallas on TPU
    else:
        # SSIM is undefined below a 3x3 window (cov_norm divides by
        # n-1); NaN per-slice values drop out at aggregation
        ssim_s = jnp.full((s,), jnp.nan, jnp.float32)
    psnr_s = psnr_volume(ref_j, up_j, data_range)
    vif_s = vif_volume(ref_j, up_j, data_range=data_range)
    # per-slice mse so the black-slice mask applies like every other
    # metric in this dict (a plain global mean averaged black-vs-black
    # planes in on long-axis views, deflating MSE inconsistently)
    mse_s = np.mean((ref - up) ** 2, axis=(1, 2))

    out = {
        "ssim": float(masked_mean(ssim_s, all_mask)),
        "psnr": float(masked_mean(psnr_s, all_mask)),
        "vif": float(masked_mean(vif_s, all_mask)),
        "ssim_synth": float(masked_mean(ssim_s, synth)),
        "psnr_synth": float(masked_mean(psnr_s, synth)),
        "vif_synth": float(masked_mean(vif_s, synth)),
        "mse": float(np.mean(mse_s[all_mask])) if all_mask.any()
               else float("nan"),
    }
    if lpips_params is not None:
        # LPIPS expects [0,1] inputs (normalize=True maps to [-1,1]);
        # scale other data ranges down first
        sc = 1.0 / data_range if data_range != 1.0 else 1.0
        d = lpips_distance(lpips_params, (up_j * sc)[..., None],
                           (ref_j * sc)[..., None], normalize=True)
        out["lpips"] = float(masked_mean(d, all_mask))
        out["lpips_synth"] = float(masked_mean(d, synth))
    return out


def aggregate_metrics(per_volume: list) -> Dict[str, tuple]:
    """mean ± std across volumes, non-finite entries dropped like the
    per-slice layer (reference skips nan/inf values,
    metrics.py:101-105; one all-uniform volume's NaN VIF must not NaN
    the whole cohort row)."""
    keys = per_volume[0].keys()
    out = {}
    for k in keys:
        vals = np.asarray([m[k] for m in per_volume], np.float64)
        finite = vals[np.isfinite(vals)]
        if finite.size:
            out[k] = (float(np.mean(finite)), float(np.std(finite)))
        else:
            out[k] = (float("nan"), float("nan"))
    return out


class IdUniquifier:
    """'pid', 'pid#2', 'pid#3'... key naming for duplicate patient ids
    (e.g. ED/ES frames loaded as separate volumes). THE shared
    convention for create_hr_images per-volume keys and the batched
    sweep (evaluate/sweep.py) — one implementation so the two result
    dictionaries can never drift apart."""

    def __init__(self):
        self._seen: dict = {}

    def take(self, pid: str) -> str:
        pid = str(pid)
        self._seen[pid] = self._seen.get(pid, 0) + 1
        n = self._seen[pid]
        return pid if n == 1 else f"{pid}#{n}"
