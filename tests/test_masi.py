"""brainMASI preparation tools (synthetic fixtures)."""
import os

import numpy as np

from superresolution_aniso_mri_tpu.data import (
    create_masi_cropped_dataset, create_masi_lr_dataset, crop_to_brain,
    find_bbox, masi_train_test_split,
)
from superresolution_aniso_mri_tpu.utils import write_image


def test_find_bbox():
    m = np.zeros((20, 20))
    m[5:9, 7:15] = 1
    b = find_bbox(m)
    assert (b["slice_y"].start, b["slice_y"].stop) == (5, 9)
    assert (b["slice_x"].start, b["slice_x"].stop) == (7, 15)
    assert not b["empty"]
    assert find_bbox(np.zeros((8, 8)))["empty"]


def test_crop_to_brain_shapes():
    rng = np.random.RandomState(0)
    img = rng.rand(40, 50, 44).astype(np.float32)
    ref = np.zeros_like(img, np.int32)
    ref[10:30, 15:40, 12:32] = 2
    out = crop_to_brain(img, ref, patch_size=64)
    # axial-first reorientation + in-plane pad to 64
    assert out.shape[1:] == (64, 64)
    assert out.shape[0] <= 50
    assert np.isfinite(out).all()


def test_split_is_deterministic():
    a1, b1 = masi_train_test_split(range(1, 21))
    a2, b2 = masi_train_test_split(range(1, 21))
    np.testing.assert_array_equal(a1, a2)
    assert len(a1) == 15 and len(b1) == 5 and not set(a1) & set(b1)


def test_cropped_and_lr_dataset_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    src = tmp_path / "raw"
    (src / "images").mkdir(parents=True)
    (src / "manual_references" / "6classes").mkdir(parents=True)
    for pid in (1, 2):
        img = rng.rand(24, 32, 28).astype(np.float32)
        ref = np.zeros_like(img, np.int32)
        ref[6:18, 8:26, 7:22] = 3
        write_image(str(src / "images" / f"{pid}.nii"), img,
                    spacing=[1.0, 1.0, 1.0])
        write_image(str(src / "manual_references" / "6classes" /
                        f"{pid}.mha"), ref, spacing=[1.0, 1.0, 1.0])
    cropped = create_masi_cropped_dataset(str(src), str(tmp_path / "c"),
                                          patch_size=32)
    assert len(cropped) == 2 and all(os.path.isfile(f) for f in cropped)
    lr = create_masi_lr_dataset(str(tmp_path / "c"),
                                str(tmp_path / "lr"), new_spacing_z=3.0)
    assert lr and all(os.path.isfile(f) for f in lr)
    from superresolution_aniso_mri_tpu.utils import read_image
    arr, spacing, _ = read_image(lr[0])
    np.testing.assert_allclose(spacing[0], 3.0)
    assert arr.shape[0] < 32  # z thinned


def test_crop_to_brain_keeps_last_labeled_plane():
    """Inclusive extents → exclusive stops need +1 (review fix)."""
    img = np.zeros((10, 40, 40), np.float32)
    ref = np.zeros_like(img, np.int32)
    ref[2:8, 10:30, 12:28] = 1
    img[:] = 0.0
    img[7, 29, :] = 1.0  # content exactly on the last labeled planes
    out = crop_to_brain(img, ref, patch_size=40)
    assert out.max() == 1.0  # the last plane survived the crop


def test_masi_lr_dataset_preserves_inplane_grid(tmp_path):
    """LR simulation resamples z only (review fix: in-plane zoom factors
    were the spacing values)."""
    from superresolution_aniso_mri_tpu.utils import read_image, write_image

    src = tmp_path / "c" / "training" / "images"
    src.mkdir(parents=True)
    img = np.random.RandomState(0).rand(20, 30, 28).astype(np.float32)
    write_image(str(src / "1.nii"), img, spacing=[1.0, 0.8, 0.8])
    lr = create_masi_lr_dataset(str(tmp_path / "c"), str(tmp_path / "lr"),
                                new_spacing_z=5.0)
    arr, sp, _ = read_image(lr[0])
    assert arr.shape[1:] == (30, 28)          # in-plane untouched
    assert arr.shape[0] == 4                  # 20 * (1/5)
    np.testing.assert_allclose(sp, [5.0, 0.8, 0.8], atol=1e-6)
