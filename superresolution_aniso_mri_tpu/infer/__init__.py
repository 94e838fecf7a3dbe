"""Inference: whole-volume super-resolution kernels + baselines."""
from .super_volume import (
    create_super_volume, create_simple_interpolation, simple_interpolation,
    latent_space_interp, make_volume_synthesizer, interleave_volume,
)

__all__ = [
    "create_super_volume", "create_simple_interpolation",
    "simple_interpolation", "latent_space_interp",
    "make_volume_synthesizer", "interleave_volume",
]
