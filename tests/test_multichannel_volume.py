"""Multichannel (ACDCLBL) whole-volume synthesis & batched sweep.

The reference's with_labels volume path feeds [image, label] as input
channels and decodes BOTH heads — pred_labels = argmax(soft_probs) rides
through the interleave (reference: generate_hr_volumes.py:28-101,
sr_multi_channel/trainer_ae.py:117). Round-3 review found the entire
volume/eval pipeline crashed for this family; these tests pin the fix.
"""
import warnings

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data.volume import Volume
from superresolution_aniso_mri_tpu.evaluate.sweep import (
    evaluate_volumes_batched,
)
from superresolution_aniso_mri_tpu.infer import create_super_volume
from superresolution_aniso_mri_tpu.train import Trainer


def _mc_args(tmpdir, **over):
    args = {
        "dataset": "ACDCLBL",
        "model": "ae_combined",
        "ae_class": "VanillaACAI",
        "width": 32,
        "latent_width": 16,
        "depth": 8,
        "latent": 8,
        "colors": 2,
        "nclasses": 3,
        "lr": 1e-3,
        "weight_decay": 0.0,
        "batch_size": 4,
        "epochs": 2,
        "epoch_threshold": 0,
        "use_batchnorm": False,
        "use_sigmoid": True,
        "use_laploss": False,
        "use_percept_loss": False,
        "image_mix_loss_func": "mse",
        "downsample_steps": 2,
        "seed": 42,
        "output_dir": str(tmpdir),
    }
    args.update(over)
    return args


@pytest.fixture(scope="module")
def mc_trainer(tmp_path_factory):
    t = Trainer(_mc_args(tmp_path_factory.mktemp("mc")))
    assert t.family == "multichannel_combined"
    return t


def test_multichannel_volume_synthesis_with_labels(mc_trainer):
    rng = np.random.RandomState(0)
    imgs = rng.rand(10, 32, 32).astype(np.float32)      # tail: remain=1
    lbls = rng.randint(0, 3, (10, 32, 32)).astype(np.int16)
    out = create_super_volume(
        mc_trainer, imgs, alpha_range=[0.5], downsample_steps=2,
        generate_inbetween_slices=True, labels=lbls)
    vol = out["upsampled_image"]
    assert vol.shape == (10, 32, 32)
    assert vol.min() >= 0.0 and vol.max() <= 1.0
    up_lbl = out["upsampled_labels"]
    # labels are DECODED class ids (argmax of soft_probs), not a
    # nearest-neighbour copy of the input
    assert up_lbl is not None and up_lbl.shape == (10, 32, 32)
    assert up_lbl.dtype == lbls.dtype
    uniq = np.unique(up_lbl)
    assert uniq.min() >= 0 and uniq.max() <= 2
    # the verbatim tail slice keeps the ORIGINAL labels (reference
    # appends orig_labels[-remain:], evaluate/common.py:220-231)
    np.testing.assert_array_equal(up_lbl[-1], lbls[-1])


def test_multichannel_volume_synthesis_without_labels_warns(mc_trainer):
    rng = np.random.RandomState(1)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    with pytest.warns(UserWarning, match="zero label channel"):
        out = create_super_volume(
            mc_trainer, imgs, alpha_range=[0.5], downsample_steps=2,
            generate_inbetween_slices=True)
    assert out["upsampled_image"].shape == (9, 32, 32)
    assert np.isfinite(out["upsampled_image"]).all()


def test_multichannel_use_original_keeps_input_slices(mc_trainer):
    rng = np.random.RandomState(2)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    lbls = rng.randint(0, 3, (9, 32, 32)).astype(np.float32)
    out = create_super_volume(
        mc_trainer, imgs, alpha_range=[0.5], downsample_steps=2,
        generate_inbetween_slices=True, use_original=True, labels=lbls)
    vol = out["upsampled_image"]
    # kept grid positions are the ORIGINAL image slices
    np.testing.assert_allclose(vol[::2], imgs[::2], atol=1e-6)
    # kept grid label positions are the ORIGINAL labels
    np.testing.assert_array_equal(out["upsampled_labels"][::2], lbls[::2])


def test_multichannel_batched_sweep(mc_trainer):
    rng = np.random.RandomState(3)
    img = rng.rand(9, 32, 32).astype(np.float32)
    lbl = rng.randint(0, 3, (9, 32, 32)).astype(np.float32)
    vol = Volume(image=img, spacing=np.array([5.0, 1.0, 1.0]),
                 patient_id="mc01", image_hr=img, labels=lbl)
    res = evaluate_volumes_batched(mc_trainer, [vol], downsample_steps=2)
    assert "mc01" in res
    assert np.isfinite(res["mc01"]["ssim"])
    # labels absent → zero channel, still finite
    vol2 = Volume(image=img, spacing=np.array([5.0, 1.0, 1.0]),
                  patient_id="mc02", image_hr=img)
    res2 = evaluate_volumes_batched(mc_trainer, [vol2], downsample_steps=2)
    assert np.isfinite(res2["mc02"]["ssim"])


def test_singlechannel_labels_still_ride_along(tmp_path):
    """Regression: 1-channel models keep the nearest-neighbour label
    ride-along (grid coincides in in-between-slices mode → unchanged)."""
    args = _mc_args(tmp_path, dataset="MNIST3D", colors=1, nclasses=4)
    t = Trainer(args)
    rng = np.random.RandomState(4)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    lbls = rng.randint(0, 4, (9, 32, 32)).astype(np.int16)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no multichannel warning here
        out = create_super_volume(
            t, imgs, alpha_range=[0.5], downsample_steps=2,
            generate_inbetween_slices=True, labels=lbls)
    np.testing.assert_array_equal(out["upsampled_labels"], lbls)


def test_plain_2ch_alpha_model_labels_ride_along(tmp_path):
    """Review fix: a plain 2-channel AE (alpha family on ACDCLBL) does
    NOT decode labels — its decode channel 1 is an intensity
    reconstruction, not class ids (the reference's with_labels path only
    exists for the multichannel trainer, generate_hr_volumes.py:34-41).
    upsampled_labels must be the input-label ride-along, classes intact."""
    args = _mc_args(tmp_path, model="alpha", alpha_class="AlphaProbe16v1",
                    alpha_loss_func="mse")
    t = Trainer(args)
    assert t.family == "alpha"
    assert t.model_config.colors == 2
    rng = np.random.RandomState(5)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    lbls = rng.randint(0, 3, (9, 32, 32)).astype(np.int16)
    out = create_super_volume(
        t, imgs, alpha_range=[0.5], downsample_steps=2,
        generate_inbetween_slices=True, labels=lbls)
    assert out["upsampled_image"].shape == (9, 32, 32)
    np.testing.assert_array_equal(out["upsampled_labels"], lbls)


def _combo_trainer(tmp_path):
    import os

    t = Trainer(_mc_args(tmp_path))
    t.prepare_run()
    ckpt = os.path.join(t.dir_models, "caisr.models")
    t.save_models(ckpt, 1)
    t.load_caisr(ckpt)
    assert t.params_sr is not None
    return t


def test_multichannel_combo_path_decodes_labels(tmp_path):
    """Review fix (round 3): the AE+SR combo must serve MODEL-DECODED
    labels like the plain multichannel path — it previously stripped the
    SR decode's label channel and silently substituted the
    nearest-input-label copy. In use_original mode kept grid positions
    keep the input labels; synthesized positions carry decoded class
    ids."""
    t = _combo_trainer(tmp_path)
    rng = np.random.RandomState(6)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    lbls = rng.randint(0, 3, (9, 32, 32)).astype(np.int16)
    out = create_super_volume(
        t, imgs, alpha_range=[0.5], downsample_steps=2,
        generate_inbetween_slices=True, use_original=True, labels=lbls)
    up = out["upsampled_labels"]
    assert up.shape == (9, 32, 32) and up.dtype == lbls.dtype
    # kept grid: original labels verbatim
    np.testing.assert_array_equal(up[::2], lbls[::2])
    # synthesized positions: valid class ids, and NOT the ride-along
    # copy (random-weight decode differs from the input labels)
    assert set(np.unique(up)) <= {0, 1, 2}
    assert not np.array_equal(up, lbls)


def test_multichannel_combo_path_runs(tmp_path):
    """Review fix: the AE+SR combo path must feed predict the model's
    FULL input channels and unwrap the multichannel decode dict — it
    previously crashed with a stem shape error for this family."""
    t = _combo_trainer(tmp_path)
    rng = np.random.RandomState(6)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    lbls = rng.randint(0, 3, (9, 32, 32)).astype(np.float32)
    out = create_super_volume(
        t, imgs, alpha_range=[0.5], downsample_steps=2,
        generate_inbetween_slices=True, labels=lbls)
    vol = out["upsampled_image"]
    assert vol.shape == (9, 32, 32)
    assert np.isfinite(vol).all()
    up = out["upsampled_labels"]
    assert up is not None and set(np.unique(up)) <= {0.0, 1.0, 2.0}


def test_multichannel_mismatched_label_grid_raises(mc_trainer):
    """Review fix: labels on a different grid (e.g. ED/ES-only planes)
    must raise a clear error instead of a cryptic concat/shape failure
    deep inside the jitted encoder."""
    rng = np.random.RandomState(7)
    imgs = rng.rand(9, 32, 32).astype(np.float32)
    lbls = rng.randint(0, 3, (2, 32, 32)).astype(np.float32)
    with pytest.raises(ValueError, match="image grid"):
        create_super_volume(
            mc_trainer, imgs, alpha_range=[0.5], downsample_steps=2,
            generate_inbetween_slices=True, labels=lbls)
