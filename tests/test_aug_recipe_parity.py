"""Per-dataset augmentation recipe parity with what the reference CLIs
actually compose (NOT the dataset-module defaults they override):
train_cardiac_aesr.py:83-105 get_transforms,
datasets/common_brains.py:47-100 get_transforms_brain. Also pins the
finding that the reference's elastic transform
(shared_transforms.py:15-45 SpatialTransformToHalfBatch) has zero call
sites in any training entry point — elastic stays opt-in-only here."""
from superresolution_aniso_mri_tpu.cli.train_loop import (
    build_augment_config,
)


def _cfg(dataset, **over):
    args = {"dataset": dataset, "width": 32, "aug_patch_size": None}
    args.update(over)
    return build_augment_config(args)


def test_cardiac_recipe_is_rot90_not_any_angle():
    for dataset in ("ACDC", "ACDCC"):
        cfg = _cfg(dataset)
        assert cfg.rot90 and cfg.random_crop and cfg.intensity
        assert not cfg.rotate_any, \
            f"{dataset}: reference CLI composes RandomRotation (rot90), " \
            f"not RandomAnyRotation"
        assert not cfg.elastic


def test_brain_recipes():
    # OASIS: RandomCrop + RandomRotation + RandomIntensity (no
    # center-crop-near-brain); dHCP/ADNI add RandomCropNextToCenter
    oasis = _cfg("OASIS")
    assert oasis.rot90 and oasis.random_crop and oasis.intensity
    assert not oasis.crop_next_to_center and not oasis.elastic
    for dataset in ("dHCP", "ADNI", "brainMASI"):
        cfg = _cfg(dataset)
        assert cfg.crop_next_to_center and cfg.max_translation == 35
        assert not cfg.elastic


def test_exact_channel_datasets_disable_intensity():
    assert not _cfg("ACDCLBL").intensity
    assert not _cfg("ACDC", get_masks=True).intensity


def test_mnist_recipe_is_plain():
    cfg = _cfg("MNIST3D")
    assert not cfg.random_crop and not cfg.rot90 and not cfg.intensity


def test_elastic_defaults_off_everywhere():
    from superresolution_aniso_mri_tpu.data import AugmentConfig
    assert AugmentConfig(patch_size=32).elastic is False
    for dataset in ("ACDC", "ACDCC", "ACDCLBL", "OASIS", "dHCP", "ADNI",
                    "brainMASI", "MNIST3D"):
        assert not _cfg(dataset).elastic
