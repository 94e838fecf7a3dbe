"""Inference: whole-volume super-resolution kernels + baselines."""
from .super_volume import (
    apply_blur_filter, rescale_volume,
    create_super_volume, create_super_volumes,
    create_simple_interpolation, simple_interpolation,
    latent_space_interp, make_volume_synthesizer,
    make_batched_synthesizer, interleave_volume,
)

__all__ = [
    "create_super_volume", "create_super_volumes",
    "make_batched_synthesizer", "create_simple_interpolation",
    "simple_interpolation", "latent_space_interp",
    "make_volume_synthesizer", "interleave_volume",
]

from .patches import (extract_patches, assemble_patches,
                      reconstruct_in_patches, interpolate_in_patches)
__all__ += ["apply_blur_filter", "rescale_volume", "extract_patches",
            "assemble_patches", "reconstruct_in_patches",
            "interpolate_in_patches"]

from .alpha_interp import (  # noqa: E402
    latent_space_interp_pred_alpha, create_features,
    synthesize_cardiac_features, get_alpha_probe_features,
)

__all__ += ["latent_space_interp_pred_alpha", "create_features",
            "synthesize_cardiac_features", "get_alpha_probe_features"]

from .latent_taps import (  # noqa: E402
    fit_latent_taps, fitted_tap_weights, load_latent_taps,
    resolve_latent_interp, save_latent_taps,
)

__all__ += ["fit_latent_taps", "fitted_tap_weights", "load_latent_taps",
            "resolve_latent_interp", "save_latent_taps"]
