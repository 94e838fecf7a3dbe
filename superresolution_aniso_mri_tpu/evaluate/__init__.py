"""Evaluation pipeline: HR-image generation + metric drivers + sweeps."""
from .metrics_driver import compute_volume_metrics, aggregate_metrics
from .create_hr_images import create_hr_images, save_metrics, FILTER_BENCH
from .find_best_model import find_best_val_model, list_epoch_checkpoints
from .evaluate_image import evaluate_image, generate_val_volume_grids
from .quantitative_comparison import (
    compare_quantitative, load_results, format_latex_string,
    generate_synth_slices_mask,
)
from .ppl import compute_ppl
from .reconstruction import evaluate_model_reconstruction

__all__ = [
    "compute_volume_metrics", "aggregate_metrics", "create_hr_images",
    "save_metrics", "FILTER_BENCH", "find_best_val_model",
    "list_epoch_checkpoints", "evaluate_image", "generate_val_volume_grids",
    "compare_quantitative", "load_results", "format_latex_string",
    "generate_synth_slices_mask", "compute_ppl",
    "evaluate_model_reconstruction",
]
