"""Data layer: volumes, triplet sampling, device-side transforms,
synthetic fixtures, dataset builders."""
from .volume import (
    Volume, rescale_intensities, simulate_thick_slices, create_lr_volume,
    apply_2d_zoom_3d, apply_2d_zoom_4d, get_random_adjacent_slice,
    determine_interpol_coefficients, get_paired_frames, get_paired_slices,
)
from .transforms import (
    AugmentConfig, augment_batch, prepare_batch_pairs,
    prepare_batch_quintets, prepare_batch_septets, pad_to_size,
    center_crop,
)
from .pairs import TripletSampler
from .synthetic import make_toy_dataset, make_rotated_volume

__all__ = [
    "Volume", "rescale_intensities", "simulate_thick_slices",
    "create_lr_volume", "apply_2d_zoom_3d", "apply_2d_zoom_4d",
    "get_random_adjacent_slice", "determine_interpol_coefficients",
    "AugmentConfig", "augment_batch", "prepare_batch_pairs",
    "prepare_batch_quintets", "prepare_batch_septets", "pad_to_size",
    "center_crop", "TripletSampler", "make_toy_dataset",
    "make_rotated_volume",
]

from .acdc_aux import (  # noqa: E402
    get_acdc_fold_patient_ids, acdc_sr_seg_fold, load_acdc_sr_seg_slices,
    ACDCSRSegImage, load_uncertainty_data, create_centered_dataset,
    center_4d_volume, load_acdc_label_volumes, normalize_cardiac_label,
)

__all__ += [
    "get_acdc_fold_patient_ids", "acdc_sr_seg_fold",
    "load_acdc_sr_seg_slices", "ACDCSRSegImage", "load_uncertainty_data",
    "create_centered_dataset", "center_4d_volume",
    "load_acdc_label_volumes", "normalize_cardiac_label",
]

from .masi import (  # noqa: E402
    find_bbox, crop_to_brain, create_masi_cropped_dataset,
    create_masi_lr_dataset, masi_train_test_split,
)

__all__ += [
    "find_bbox", "crop_to_brain", "create_masi_cropped_dataset",
    "create_masi_lr_dataset", "masi_train_test_split",
]
