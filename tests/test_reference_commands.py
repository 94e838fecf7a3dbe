"""Argument-surface parity: the reference README's training commands
must parse with identical effective settings; long-axis (eval_axis≠0)
metric evaluation works."""
import numpy as np

from superresolution_aniso_mri_tpu.config.arguments import parse_args
from superresolution_aniso_mri_tpu.evaluate import compute_volume_metrics


def test_acdc_readme_command():
    # reference README.md:23 (ACDC ae_combined)
    args, d = parse_args(
        "-d ACDC -m ae_combined -b 12 --latent 128 --downsample_steps 2 "
        "-e 900 --ex_loss_weight1 0.05 -id f0_128".split())
    # the ae_combined → perceptual mix-loss default lives in
    # net_config's architecture table and engages at merge time (the
    # CLI leaves it None) — assert the EFFECTIVE settings the training
    # entry point actually builds (cli/train_loop.py merge)
    from superresolution_aniso_mri_tpu.config.net_config import (
        NetworkConfig, merge_args_architecture,
    )
    assert d["image_mix_loss_func"] is None
    merged = merge_args_architecture(
        d, NetworkConfig(d["model"], d["dataset"],
                         d.get("ae_class")).architecture)
    assert merged["image_mix_loss_func"] == "perceptual"
    assert d["aug_patch_size"] == 180                # ACDC default
    assert d["latent"] == 128 and d["epochs"] == 900
    assert d["output_dir"].endswith("ACDC/ae_combined/f0_128")


def test_dhcp_readme_command():
    # reference README.md:31 (dHCP ae_combined)
    args, d = parse_args(
        "-d dHCP -m ae_combined -b 8 --width 256 --latent_width 64 "
        "--latent 128 --downsample_steps 4 -e 750 "
        "--ex_loss_weight1 0.001".split())
    assert d["width"] == 256 and d["latent_width"] == 64
    # width == 256 → no forced aug_patch_size
    assert d["aug_patch_size"] is None


def test_oasis_readme_command():
    # reference README.md:46 (OASIS ae_combined)
    args, d = parse_args(
        "-d OASIS -m ae_combined -b 16 --width 64 --latent_width 16 "
        "--latent 128 --downsample_steps 4 -e 1500 "
        "--aug_patch_size 220 --ex_loss_weight1 0.001".split())
    assert d["aug_patch_size"] == 220


def test_vae_command_routing():
    args, d = parse_args("-d ACDC -m vae --downsample_steps 2".split())
    assert d["ae_class"] == "VAE"
    assert d["vae_beta"] == 100 and d["lamb"] == 1.0
    args, d = parse_args("-d ACDC -m vae2 --downsample_steps 2".split())
    assert d["ae_class"] == "VAE2" and d["vae_beta"] == 1.0


def test_use_batchnorm_override():
    from superresolution_aniso_mri_tpu.config.net_config import (
        NetworkConfig, merge_args_architecture,
    )

    # absent → the architecture default (BN on, reference net_config)
    _, d = parse_args("-d OASIS -m ae_combined --downsample_steps 3".split())
    arch = NetworkConfig("ae_combined", "OASIS").architecture
    assert merge_args_architecture(d, arch)["use_batchnorm"] is True
    # explicit 0 → overrides the default through the merge
    _, d = parse_args("-d OASIS -m ae_combined --downsample_steps 3 "
                      "--use_batchnorm 0".split())
    assert merge_args_architecture(d, arch)["use_batchnorm"] == 0


def test_downsample_steps_required():
    import pytest
    with pytest.raises(ValueError):
        parse_args("-d ACDC -m ae".split())


def test_long_axis_evaluation():
    """eval_axis≠0 re-slices the volume and skips all-black slices
    (reference: evaluate/metrics.py:127-152)."""
    rng = np.random.RandomState(0)
    import scipy.ndimage
    vol = scipy.ndimage.gaussian_filter(rng.rand(12, 24, 24), 1.5)
    vol = ((vol - vol.min()) / (vol.max() - vol.min())).astype(np.float32)
    vol[:, :4] = 0.0  # black stripes → black LAX slices to skip
    noisy = np.clip(vol + 0.02, 0, 1).astype(np.float32)
    m = compute_volume_metrics(vol, noisy, eval_axis=1)
    assert np.isfinite(m["ssim"]) and np.isfinite(m["psnr"])
    m2 = compute_volume_metrics(vol, noisy, eval_axis=2)
    assert np.isfinite(m2["ssim"])
    # thin-slice fallback: LAX views with <8 px use win 5
    small = vol[:6, :6]
    m3 = compute_volume_metrics(small, np.clip(small + 0.01, 0, 1),
                                eval_axis=1)
    assert np.isfinite(m3["ssim"])


def test_sr_mix_loss_default_override(monkeypatch):
    """SR_MIX_LOSS_DEFAULT=mse flips the combined families' DEFAULT mix
    loss only (docs: README 'Recommended production recipes'); without
    the env the reference's forced-perceptual default stays intact, an
    invalid value fails fast, and an explicit flag always wins."""
    import pytest

    from superresolution_aniso_mri_tpu.config.net_config import (
        NetworkConfig, merge_args_architecture,
    )

    monkeypatch.delenv("SR_MIX_LOSS_DEFAULT", raising=False)
    assert (NetworkConfig("ae_combined", "ACDC")
            .architecture["image_mix_loss_func"] == "perceptual")

    monkeypatch.setenv("SR_MIX_LOSS_DEFAULT", "mse")
    for net in ("ae_combined", "vae_combined", "acai_combined"):
        assert (NetworkConfig(net, "ACDC")
                .architecture["image_mix_loss_func"] == "mse"), net
    # non-combined families keep None
    assert (NetworkConfig("ae", "ACDC")
            .architecture["image_mix_loss_func"] is None)
    # explicit CLI flag wins over the env-overridden default
    arch = NetworkConfig("ae_combined", "ACDC").architecture
    merged = merge_args_architecture(
        {"image_mix_loss_func": "perceptual"}, arch)
    assert merged["image_mix_loss_func"] == "perceptual"

    monkeypatch.setenv("SR_MIX_LOSS_DEFAULT", "nope")
    with pytest.raises(ValueError, match="SR_MIX_LOSS_DEFAULT"):
        NetworkConfig("ae_combined", "ACDC")
