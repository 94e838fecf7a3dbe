"""Evaluation pipeline: HR-image generation + metric drivers + sweeps."""
from .metrics_driver import compute_volume_metrics, aggregate_metrics
from .create_hr_images import (create_hr_images, save_metrics,
                               save_3d_volume, save_4d_volume, FILTER_BENCH)
from .find_best_model import find_best_val_model, list_epoch_checkpoints
from .evaluate_image import evaluate_image, generate_val_volume_grids
from .quantitative_comparison import (
    compare_quantitative, load_results, format_latex_string,
    generate_synth_slices_mask,
)
from .ppl import compute_ppl
from .sweep import evaluate_volumes_batched, make_sweep_evaluator
from .sr_seg_eval import evaluate_sr_segmentation, score_segmentation
from .reconstruction import evaluate_model_reconstruction
from . import seg_metrics
from .clinical import (
    volumes_over_time, compute_phase_volumes, peak_rates,
    exchange_base_apex, bland_altman_arrays, structure_volume,
)
from .sax_to_lax import (
    resample_sax_to_lax, make_transform, make_identity_grid,
    make_lax_identity_grid, grid_sample_3d,
)
from .combine_ae_caisr import combine_volumes, create_combined_images
from .drivers import (
    evaluate_interpolation_performance,
    test_interpolation_with_rigid_transformations,
    create_brain_volumes, create_cardiac_volumes,
)
from .model_registry import (
    CARDIAC_MODEL_SPECS, BRAIN_MODEL_SPECS, load_model_specs,
    register_model, get_trainer_for_spec,
)
from .journal2 import (
    upsample_factor_page, lambda_page, methods_comparison_page,
    interpol_sequence_page, reconstruction_page, boxplot_page,
    cardiac_lax_page,
)
from .spie2021 import (
    spie_boxplot_page, lax_view_pages, methods_grid_page,
    interpol_example_page, presentation_slice_pages,
    two_method_slice_compare,
)

__all__ = [
    "compute_volume_metrics", "aggregate_metrics", "create_hr_images",
    "save_metrics", "save_3d_volume", "save_4d_volume",
    "evaluate_volumes_batched", "make_sweep_evaluator",
    "evaluate_sr_segmentation", "score_segmentation",
    "FILTER_BENCH", "find_best_val_model",
    "list_epoch_checkpoints", "evaluate_image", "generate_val_volume_grids",
    "compare_quantitative", "load_results", "format_latex_string",
    "generate_synth_slices_mask", "compute_ppl",
    "evaluate_model_reconstruction", "seg_metrics",
    "volumes_over_time", "compute_phase_volumes", "peak_rates",
    "exchange_base_apex", "bland_altman_arrays", "structure_volume",
    "resample_sax_to_lax", "make_transform", "make_identity_grid",
    "make_lax_identity_grid", "grid_sample_3d", "combine_volumes",
    "create_combined_images", "evaluate_interpolation_performance",
    "test_interpolation_with_rigid_transformations",
    "create_brain_volumes", "create_cardiac_volumes",
    "CARDIAC_MODEL_SPECS", "BRAIN_MODEL_SPECS", "load_model_specs",
    "register_model", "get_trainer_for_spec",
    "upsample_factor_page", "lambda_page", "methods_comparison_page",
    "interpol_sequence_page", "reconstruction_page", "boxplot_page",
    "cardiac_lax_page",
    "spie_boxplot_page", "lax_view_pages", "methods_grid_page",
    "interpol_example_page", "presentation_slice_pages",
    "two_method_slice_compare",
]
