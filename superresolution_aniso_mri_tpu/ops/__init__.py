"""Compute kernels: losses, metrics, perceptual distance, resampling."""
from .losses import (mse, l1, bce_sum_over_batch, kl_standard_normal,
                     latent_mix, latent_mix_cubic, catmull_rom_weights,
                     latent_mix_lanczos3, lanczos3_weights)
from .lap_pyramid import lap_loss, laplacian_pyramid
from .dice import dice_loss, soft_dice_score
from .metrics import (
    ssim2d, ssim_volume, psnr2d, psnr_volume, vif2d, vif_volume,
    synth_slice_mask, masked_mean, gaussian_filter2d,
)
from .lpips import (
    lpips_distance, lpips_loss, get_lpips_params, init_lpips_params,
    load_lpips_params, load_lin_weights, lpips_weights_info,
)
from .perceptual import (
    enc_lpips_distance, enc_perceptual_loss, get_enc_perceptual_params,
    load_enc_perceptual, save_enc_perceptual,
)

__all__ = [
    "mse", "l1", "bce_sum_over_batch", "kl_standard_normal", "latent_mix",
    "latent_mix_cubic", "catmull_rom_weights",
    "latent_mix_lanczos3", "lanczos3_weights",
    "lap_loss", "laplacian_pyramid", "dice_loss", "soft_dice_score",
    "ssim2d", "ssim_volume", "psnr2d", "psnr_volume", "vif2d", "vif_volume",
    "synth_slice_mask", "masked_mean", "gaussian_filter2d",
    "lpips_distance", "lpips_loss", "get_lpips_params", "init_lpips_params",
    "load_lpips_params", "load_lin_weights", "lpips_weights_info",
    "enc_lpips_distance", "enc_perceptual_loss",
    "get_enc_perceptual_params", "load_enc_perceptual",
    "save_enc_perceptual",
]
