"""Regression tests for the augmentation-pipeline review fixes:
non-square/undersized inputs, intensity-before-warp ordering, guarded
center_crop / prepare_batch_pairs / rotate_any edge cases."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data import (
    AugmentConfig, augment_batch, prepare_batch_pairs,
)
from superresolution_aniso_mri_tpu.data.transforms import center_crop


def test_augment_handles_non_square_inputs():
    """Crop gates must consider BOTH spatial dims: a [B, 128, 216, 3]
    batch with patch 128 previously skipped every crop (H gate only) and
    crashed in rot90 or leaked a non-square batch."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 128, 216, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=128, rot90=True, intensity=False)
    out = augment_batch(jax.random.PRNGKey(0), x, cfg)
    assert out.shape == (2, 128, 128, 3)

    # one dim larger, one smaller than the patch: pad then crop
    y = jnp.asarray(rng.rand(2, 100, 140, 3), jnp.float32)
    out2 = augment_batch(jax.random.PRNGKey(1), y, cfg)
    assert out2.shape == (2, 128, 128, 3)


def test_augment_pads_undersized_inputs():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 24, 20, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=32, rot90=False, intensity=False,
                        random_crop=False)
    out = augment_batch(jax.random.PRNGKey(0), x, cfg)
    assert out.shape == (2, 32, 32, 3)
    # centered zero pad: the original content survives
    np.testing.assert_allclose(np.asarray(out)[:, 4:28, 6:26], np.asarray(x))


def test_intensity_before_warp_keeps_borders_black():
    """Reference applies RandomIntensity before rotation
    (train_cardiac_aesr.py:94-97): rotated-in zero borders must stay
    exactly 0, not sigmoid(-gain*cutoff) gray."""
    x = jnp.full((1, 64, 64, 3), 0.8, jnp.float32)
    cfg = AugmentConfig(patch_size=64, rot90=False, random_crop=False,
                        intensity=True, rotate_any=True, max_degree=45)
    found_border = False
    for seed in range(8):  # angle 0 produces no border; try several keys
        out = np.asarray(augment_batch(jax.random.PRNGKey(seed), x, cfg))
        corners = out[0, [0, 0, -1, -1], [0, -1, 0, -1], 0]
        if np.any(corners == 0.0):
            found_border = True
            # all border fill must be exactly zero, never remapped gray
            assert np.all((corners == 0.0) | (corners > 0.5))
    assert found_border, "no rotation produced a zero border in 8 draws"


def test_rotate_any_zero_degrees_is_identity():
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3),
                    jnp.float32)
    cfg = AugmentConfig(patch_size=32, rot90=False, random_crop=False,
                        intensity=False, rotate_any=True, max_degree=0)
    out = augment_batch(jax.random.PRNGKey(0), x, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_center_crop_rejects_oversized_crop():
    x = jnp.zeros((2, 8, 8, 1))
    with pytest.raises(ValueError):
        center_crop(x, 16)


def test_prepare_batch_pairs_rejects_riding_mask_channel():
    x = jnp.zeros((2, 8, 8, 7))  # 3C+1 mask channel not split off
    with pytest.raises(ValueError):
        prepare_batch_pairs(x)


def test_aug_noise_blur_flags_wire_into_aug_config():
    """--aug_noise/--aug_blur reach the device-side augmentation stack
    (opt-in, excluded for exact channels like labels/masks)."""
    from superresolution_aniso_mri_tpu.cli.train_loop import (
        build_augment_config,
    )

    base = {"dataset": "ACDC", "width": 32, "aug_patch_size": 32}
    cfg = build_augment_config(base)
    assert cfg.noise is False and cfg.blur is False
    cfg = build_augment_config({**base, "aug_noise": True,
                               "aug_blur": True})
    assert cfg.noise is True and cfg.blur is True
    # exact channels (masks) exclude the intensity-space extras
    cfg = build_augment_config({**base, "aug_noise": True,
                               "aug_blur": True, "get_masks": True})
    assert cfg.noise is False and cfg.blur is False
