"""Publication-style result plots.

Reference: evaluate/plots/** (12 scripts, ~1900 LoC of paper figures for
SPIE2021 / the journal paper). Condensed into a reusable API: metric
boxplots across methods, qualitative slice-comparison grids, long-axis
view strips and Bland-Altman scatter.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _plt(save_path):
    import matplotlib
    if save_path:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def metric_boxplots(results_per_method: Dict[str, Dict[str, Sequence[float]]],
                    metrics=("ssim_synth", "psnr_synth", "vif_synth"),
                    save_path: Optional[str] = None):
    """Side-by-side boxplots per metric; one box per method.

    ``results_per_method``: {method: {metric: per-volume values}}.
    """
    plt = _plt(save_path)
    methods = list(results_per_method)
    fig, axes = plt.subplots(1, len(metrics),
                             figsize=(4 * len(metrics), 4))
    for ax, metric in zip(np.atleast_1d(axes), metrics):
        data = [np.asarray(results_per_method[m][metric]) for m in methods]
        ax.boxplot(data, tick_labels=methods)
        ax.set_title(metric)
        ax.tick_params(axis="x", rotation=30)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def qualitative_comparison_figure(reference_vol: np.ndarray,
                                  method_vols: Dict[str, np.ndarray],
                                  slice_ids: Optional[Sequence[int]] = None,
                                  save_path: Optional[str] = None):
    """Rows = methods (+ reference), columns = selected slices."""
    plt = _plt(save_path)
    s = reference_vol.shape[0]
    if slice_ids is None:
        slice_ids = np.linspace(1, s - 2, 4).astype(int)
    rows = {"reference": reference_vol, **method_vols}
    fig, axes = plt.subplots(len(rows), len(slice_ids),
                             figsize=(2.2 * len(slice_ids),
                                      2.2 * len(rows)))
    axes = np.atleast_2d(axes)
    for r, (name, vol) in enumerate(rows.items()):
        for c, sid in enumerate(slice_ids):
            axes[r, c].imshow(vol[sid], cmap="gray", vmin=0, vmax=1)
            axes[r, c].axis("off")
            if c == 0:
                axes[r, c].set_ylabel(name)
                axes[r, c].axis("on")
                axes[r, c].set_xticks([])
                axes[r, c].set_yticks([])
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def long_axis_strip(volume: np.ndarray, axis: int = 1,
                    positions: Optional[Sequence[int]] = None,
                    save_path: Optional[str] = None):
    """Cross-sectional (long-axis) views of a [z, y, x] volume — the
    through-plane quality view used throughout the reference's figures."""
    plt = _plt(save_path)
    vol = np.swapaxes(volume, 0, axis)
    if positions is None:
        positions = np.linspace(vol.shape[0] * 0.3, vol.shape[0] * 0.7,
                                4).astype(int)
    fig, axes = plt.subplots(1, len(positions),
                             figsize=(3 * len(positions), 3))
    for ax, p in zip(np.atleast_1d(axes), positions):
        ax.imshow(vol[p], cmap="gray", vmin=0, vmax=1, aspect="auto")
        ax.axis("off")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def bland_altman_plot(values_a, values_b, label_a="method A",
                      label_b="method B", save_path: Optional[str] = None):
    """Bland-Altman agreement plot (clinical-metric comparisons,
    reference: evaluate/cardiac/compute_clinical_metrics.py figures)."""
    from .clinical import bland_altman_arrays

    plt = _plt(save_path)
    ba = bland_altman_arrays(values_a, values_b)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(ba["mean"], ba["diff"], s=18)
    for y, style in ((ba["bias"], "-"), (ba["loa_low"], "--"),
                     (ba["loa_high"], "--")):
        ax.axhline(y, color="r", linestyle=style, linewidth=1)
    ax.set_xlabel(f"mean of {label_a} and {label_b}")
    ax.set_ylabel(f"{label_a} − {label_b}")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig
