"""Compare saved SR volumes of any method against HR references.

Reference: evaluate/quantitative_comparison.py:10-258 — same four metrics
(+MSE), all/synth split, latex table formatting, npz load/save.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional

import numpy as np

from ..utils import read_image
from .metrics_driver import aggregate_metrics, compute_volume_metrics


def generate_synth_slices_mask(num_slices: int, downsample_steps: int
                               ) -> np.ndarray:
    """Boolean synth-slice mask (reference:
    quantitative_comparison.py:10-17)."""
    from ..ops import synth_slice_mask
    return synth_slice_mask(num_slices, downsample_steps)


def compare_quantitative(reference_files: Iterable[str],
                         method_files: Iterable[str],
                         downsample_steps: int,
                         conv_interpol: bool = False,
                         output_file: Optional[str] = None,
                         normalize: bool = False) -> Dict:
    """Score one method's saved volumes vs matching HR volumes
    (reference: quantitative_comparison.py:20-195)."""
    per_volume: List[Dict] = []
    ids = []
    for ref_path, m_path in zip(reference_files, method_files):
        ref, _, _ = read_image(ref_path)
        up, _, _ = read_image(m_path)
        ref = np.asarray(ref, np.float32)
        up = np.asarray(up, np.float32)
        if normalize:
            from ..data import rescale_intensities
            up = rescale_intensities(up, percs=(0, 100))
        n = min(len(ref), len(up))
        per_volume.append(compute_volume_metrics(
            ref[:n], up[:n], downsample_steps=downsample_steps,
            conv_interpol=conv_interpol))
        ids.append(os.path.basename(ref_path))
    agg = aggregate_metrics(per_volume)
    result = {"per_volume": dict(zip(ids, per_volume)), "aggregate": agg}
    if output_file:
        flat = {}
        for m in per_volume:
            for k, v in m.items():
                flat.setdefault(k, []).append(v)
        np.savez(output_file, **{k: np.array(v) for k, v in flat.items()})
    return result


def load_results(npz_file: str) -> Dict[str, np.ndarray]:
    data = np.load(npz_file, allow_pickle=True)
    return {k: data[k] for k in data.files}


def format_latex_string(agg: Dict[str, tuple],
                        keys=("ssim_synth", "psnr_synth", "vif_synth")) -> str:
    """mean (std) latex row (reference:
    quantitative_comparison.py:237-258)."""
    cells = [f"{agg[k][0]:.3f} ({agg[k][1]:.2f})" for k in keys]
    return " & ".join(cells) + r" \\"
