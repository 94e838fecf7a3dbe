#!/usr/bin/env python
"""End-to-end quality harness: does the latent-interpolation model beat
conventional interpolation on held-out synthetic volumes?

This is the framework's runnable analogue of the reference's notebook
benchmarks (notebooks/evaluate_brain.ipynb cell 6/9 — model vs
conventional interpolation SSIM/PSNR/VIF). Trains a small ae_combined
model on procedural phantoms, super-resolves held-out volumes and prints
both methods' metrics.

Run on TPU (default) or CPU:
  python tools/quality_check.py --epochs 30
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--downsample_steps", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_train_volumes", type=int, default=12)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from superresolution_aniso_mri_tpu.data import (
        TripletSampler, make_toy_dataset, prepare_batch_pairs,
    )
    from superresolution_aniso_mri_tpu.evaluate import create_hr_images
    from superresolution_aniso_mri_tpu.train import Trainer

    ds = args.downsample_steps
    w = args.width
    train_vols = make_toy_dataset(args.num_train_volumes, size=w,
                                  num_slices=6 * ds + 1, seed=0)
    test_vols = make_toy_dataset(3, size=w, num_slices=6 * ds + 1,
                                 seed=1000)

    trainer = Trainer({
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": w, "latent_width": w // 4,
        "depth": 24, "latent": 64, "colors": 1, "lr": 2e-3,
        "weight_decay": 0.0, "batch_size": args.batch_size,
        "epochs": args.epochs, "epoch_threshold": 10 ** 9,
        "ex_loss_weight1": 0.1, "use_batchnorm": False,
        "use_sigmoid": True, "use_laploss": True,
        "use_percept_loss": False, "image_mix_loss_func": "mse",
        "downsample_steps": ds, "seed": 7, "output_dir": None,
    })
    sampler = TripletSampler(train_vols, ds, "adjacent_plus", seed=3)

    t0 = time.time()
    steps = 0
    for epoch in range(args.epochs):
        for raw in sampler.epoch_batches(args.batch_size):
            image, between = prepare_batch_pairs(jnp.asarray(raw["triplet"]))
            m = trainer.train({
                "image": image, "slice_between": between,
                "alpha_from": jnp.asarray(raw["alpha_from"]),
                "alpha_to": jnp.asarray(raw["alpha_to"]),
            })
            steps += 1
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:3d}  loss_ae={float(m['loss_ae']):.5f} "
                  f"synth={float(m['loss_ae_dist_extra']):.5f}")
    dt = time.time() - t0
    print(f"trained {steps} steps in {dt:.1f}s "
          f"({steps / dt:.1f} steps/s)")

    print(f"\n=== {ds}x through-plane SR on held-out volumes ===")
    rows = {}
    res = create_hr_images(trainer, test_vols, downsample_steps=ds)
    rows["model (AESR)"] = res["aggregate"]
    for method in ("linear", "bspline", "lanczos"):
        res = create_hr_images(None, test_vols, downsample_steps=ds,
                               interpol_method=method)
        rows[method] = res["aggregate"]

    hdr = f"{'method':>14} | {'SSIM synth':>12} | {'PSNR synth':>12} | {'VIF synth':>12}"
    print(hdr)
    print("-" * len(hdr))
    for name, agg in rows.items():
        print(f"{name:>14} | {agg['ssim_synth'][0]:12.4f} | "
              f"{agg['psnr_synth'][0]:12.3f} | {agg['vif_synth'][0]:12.4f}")

    model_ssim = rows["model (AESR)"]["ssim_synth"][0]
    best_conv = max(rows[m]["ssim_synth"][0]
                    for m in ("linear", "bspline", "lanczos"))
    verdict = "BEATS" if model_ssim > best_conv else "does not beat"
    print(f"\nmodel {verdict} best conventional interpolation "
          f"(SSIM {model_ssim:.4f} vs {best_conv:.4f})")


if __name__ == "__main__":
    main()
