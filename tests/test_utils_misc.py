"""Tests for misc utils (mosaic/pixelate), extra augmentations, the
pallas SSIM kernel (interpret mode) and loss-curve plotting."""
import os

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_aniso_mri_tpu.utils.image_misc import (
    make_mosaic, unmake_mosaic, pixelate, find_rectangle,
)
from superresolution_aniso_mri_tpu.data.transforms import (
    AugmentConfig, augment_batch,
)
from superresolution_aniso_mri_tpu.ops.pallas_kernels import (
    ssim_volume_pallas, ssim_volume_fused,
)
from superresolution_aniso_mri_tpu.ops.metrics import ssim_volume
from superresolution_aniso_mri_tpu.utils.loss_curves import show_loss_curves


def test_mosaic_roundtrip():
    imgs = np.random.RandomState(0).rand(6, 8, 8).astype(np.float32)
    m = make_mosaic(imgs)
    assert m.shape == (2 * 8, 3 * 8)
    back = unmake_mosaic(m, 8, 8)
    np.testing.assert_allclose(back[:6], imgs)
    assert find_rectangle(10) == (3, 4)


def test_pixelate():
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    out = pixelate(img, block=4)
    assert out.shape == img.shape
    # each 4x4 block is constant at its mean
    assert np.allclose(out[:4, :4], img[:4, :4].mean())


def test_extra_augmentations():
    rng = np.random.RandomState(0)
    triplet = jnp.asarray(rng.rand(3, 16, 16, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=16, random_crop=False, rot90=False,
                        intensity=False, noise=True, blur=True, mirror=True)
    out = augment_batch(jax.random.PRNGKey(0), triplet, cfg)
    assert out.shape == triplet.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # the augmentations must actually DO something — a silent no-op
    # (wrong config gate) would pass every other check here
    assert not np.allclose(np.asarray(out), np.asarray(triplet))
    out2 = augment_batch(jax.random.PRNGKey(0), triplet, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_pallas_ssim_matches_xla_interpret():
    rng = np.random.RandomState(1)
    import scipy.ndimage
    a = scipy.ndimage.gaussian_filter(rng.rand(3, 40, 40), 1.5)
    a = ((a - a.min()) / (a.max() - a.min())).astype(np.float32)
    b = np.clip(a + 0.02 * rng.rand(3, 40, 40).astype(np.float32), 0, 1)
    got = np.asarray(ssim_volume_pallas(jnp.asarray(a), jnp.asarray(b),
                                        interpret=True))
    expect = np.asarray(ssim_volume(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expect, atol=1e-5)
    # fused dispatcher falls back to XLA on CPU
    got2 = np.asarray(ssim_volume_fused(a, b))
    np.testing.assert_allclose(got2, expect, atol=1e-6)


def test_loss_curve_plot(tmp_path):
    iters = np.arange(10)
    tr = {"loss_ae_dist": np.linspace(1, 0.1, 10),
          "loss_ae_dist_extra": np.linspace(0.5, 0.05, 10),
          "loss_latent_1": np.linspace(0.2, 0.02, 10)}
    te = {k: v * 1.1 for k, v in tr.items()}
    out = str(tmp_path / "curves.png")
    show_loss_curves(iters, tr, te, save_path=out)
    assert os.path.isfile(out)


def test_generate_batch_compare_grid_layout():
    """Row layout: from, to (SAME items), true between, synthesized,
    reconstruction — pinned so the (2B || B) alignment can't rot."""
    from superresolution_aniso_mri_tpu.utils.grids import (
        generate_batch_compare_grid,
    )

    b = 3
    image = np.zeros((2 * 4, 8, 8), np.float32)
    for i in range(4):
        image[i] = 0.1 * (i + 1)          # from-slices
        image[4 + i] = 0.5 + 0.1 * i      # to-slices
    between = np.full((4, 8, 8), 0.25, np.float32)
    synth = np.full((4, 8, 8), 0.35, np.float32)
    recon = np.full((4, 8, 8), 0.45, np.float32)
    grid = generate_batch_compare_grid(image, between, synth, recon,
                                       max_items=b)
    # 5 rows of b columns, 8x8 tiles with pad 2
    assert grid.shape == (5 * 10 + 2, b * 10 + 2)
    # row 1 column 0 must be the FIRST item's to-slice (0.5), not the
    # last item's
    np.testing.assert_allclose(grid[12:20, 2:10], 0.5)


def test_make_grid_empty_raises():
    from superresolution_aniso_mri_tpu.utils.grids import make_grid

    with pytest.raises(ValueError, match="empty"):
        make_grid(np.zeros((0, 4, 4), np.float32))


def test_save_image_grid_integer_input_not_rescaled(tmp_path):
    """A near-black uint8 grid must stay near-black (the [0,1] range
    heuristic only applies to float inputs)."""
    from PIL import Image
    from superresolution_aniso_mri_tpu.utils.grids import save_image_grid

    g = np.full((8, 8), 2, np.uint8)
    p = str(tmp_path / "g.png")
    save_image_grid(g, p)
    out = np.asarray(Image.open(p))
    assert out.max() == 2


def test_masks_exclude_only_labels_get_all_ones(tmp_path):
    """A slice carrying ONLY excluded labels must get the all-ones
    fallback, not an all-zero loss mask."""
    from superresolution_aniso_mri_tpu.data.masks import masks_for_volume

    labels = np.zeros((2, 8, 8), np.int32)
    labels[0, 2:4, 2:4] = 4      # excluded label only
    labels[1, 2:4, 2:4] = 1      # included structure
    masks = masks_for_volume(labels, dilation_iters=1)
    np.testing.assert_allclose(masks[0], 1.0)
    assert 0.0 < masks[1].mean() < 1.0
