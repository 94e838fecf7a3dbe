"""Data layer: volumes, triplet sampling, device-side transforms,
synthetic fixtures, dataset builders."""
from .volume import (
    Volume, rescale_intensities, simulate_thick_slices, create_lr_volume,
    apply_2d_zoom_3d, apply_2d_zoom_4d, get_random_adjacent_slice,
    determine_interpol_coefficients,
)
from .transforms import (
    AugmentConfig, augment_batch, prepare_batch_pairs, pad_to_size,
    center_crop,
)
from .pairs import TripletSampler
from .synthetic import make_toy_dataset, make_rotated_volume

__all__ = [
    "Volume", "rescale_intensities", "simulate_thick_slices",
    "create_lr_volume", "apply_2d_zoom_3d", "apply_2d_zoom_4d",
    "get_random_adjacent_slice", "determine_interpol_coefficients",
    "AugmentConfig", "augment_batch", "prepare_batch_pairs", "pad_to_size",
    "center_crop", "TripletSampler", "make_toy_dataset",
    "make_rotated_volume",
]
