#!/usr/bin/env python
"""End-to-end quality harness: does the latent-interpolation model beat
conventional interpolation on held-out synthetic volumes?

This is the framework's runnable analogue of the reference's notebook
benchmarks (notebooks/evaluate_brain.ipynb cell 6/9 — model vs
conventional interpolation SSIM/PSNR/VIF). Trains a small ae_combined
model on procedural phantoms, super-resolves held-out volumes and prints
both methods' metrics.

``--loss_mode`` selects the training configuration:
  mse            — MSE synthesis loss + laplacian (the ablation config)
  perceptual     — LPIPS synthesis loss, the reference's FORCED default
                   for ae_combined (reference: kwatsch/arguments.py:67-76
                   sets image_mix_loss_func='perceptual'); in this
                   environment LPIPS runs in lin-over-deterministic-
                   random-VGG mode (no ImageNet backbone on disk) and the
                   mode is printed so results are honestly labelled
  perceptual+lap — LPIPS synthesis loss + laplacian pyramid term
  mse+ssim       — MSE + SSIM structural term (use_ssim_loss)

Run on TPU (default) or CPU:
  python tools/quality_check.py --epochs 30 --loss_mode perceptual
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOSS_MODES = ("mse", "perceptual", "perceptual+lap", "mse+ssim")


def loss_mode_args(mode: str) -> dict:
    """Map a --loss_mode name onto the trainer's loss flags."""
    if mode == "mse":
        return {"use_percept_loss": False, "image_mix_loss_func": "mse",
                "use_laploss": True, "use_ssim_loss": False}
    if mode == "perceptual":
        return {"use_percept_loss": False,
                "image_mix_loss_func": "perceptual",
                "use_laploss": False, "use_ssim_loss": False}
    if mode == "perceptual+lap":
        return {"use_percept_loss": False,
                "image_mix_loss_func": "perceptual",
                "use_laploss": True, "use_ssim_loss": False}
    if mode == "mse+ssim":
        return {"use_percept_loss": False, "image_mix_loss_func": "mse",
                "use_laploss": True, "use_ssim_loss": True}
    raise ValueError(f"unknown loss_mode {mode!r}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--downsample_steps", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_train_volumes", type=int, default=12)
    p.add_argument("--loss_mode", type=str, default="mse",
                   choices=LOSS_MODES)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--phantom", type=str, default="smooth",
                   choices=("smooth", "textured"),
                   help="'textured' adds band-limited fine texture to "
                        "the phantoms — real MRI has such texture, and "
                        "it is exactly what through-plane interpolation "
                        "blurs away (separates methods on VIF, which "
                        "saturates on smooth phantoms)")
    p.add_argument("--latent_interp", type=str, default="linear",
                   choices=["linear", "cubic", "lanczos3", "fitted"],
                   help="latent z-mixing for the model's scoring pass "
                        "(4-tap Catmull-Rom vs the reference's 2-tap "
                        "lerp; inference-only). 'fitted' learns the tap "
                        "table on freshly built validation phantoms "
                        "(infer/latent_taps.py) before scoring")
    p.add_argument("--json_out", type=str, default=None,
                   help="append a JSON result line to this file")
    args = p.parse_args()

    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.data import (
        TripletSampler, make_toy_dataset, prepare_batch_pairs,
    )
    from superresolution_aniso_mri_tpu.evaluate import create_hr_images
    from superresolution_aniso_mri_tpu.train import Trainer

    ds = args.downsample_steps
    w = args.width

    def build_vols(n, seed):
        if args.phantom == "smooth":
            return make_toy_dataset(n, size=w, num_slices=6 * ds + 1,
                                    seed=seed)
        from superresolution_aniso_mri_tpu.data.synthetic import (
            make_textured_rotated_volume,
        )
        return [make_textured_rotated_volume(size=w, num_slices=6 * ds + 1,
                                             seed=seed + i)
                for i in range(n)]

    train_vols = build_vols(args.num_train_volumes, seed=0)
    test_vols = build_vols(3, seed=1000)

    targs = {
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": w, "latent_width": w // 4,
        "depth": args.depth, "latent": 64, "colors": 1, "lr": 2e-3,
        "weight_decay": 0.0, "batch_size": args.batch_size,
        "epochs": args.epochs, "epoch_threshold": 10 ** 9,
        "ex_loss_weight1": 0.1, "use_batchnorm": False,
        "use_sigmoid": True,
        "downsample_steps": ds, "seed": 7, "output_dir": None,
    }
    targs.update(loss_mode_args(args.loss_mode))
    trainer = Trainer(targs)
    lpips_mode = trainer.args.get("lpips_mode", "n/a")
    print(f"loss_mode={args.loss_mode}  lpips_mode={lpips_mode}")
    sampler = TripletSampler(train_vols, ds, "adjacent_plus", seed=3)
    if len(sampler) < args.batch_size:
        raise SystemExit(
            f"batch_size {args.batch_size} exceeds the {len(sampler)} "
            f"available triplets ({args.num_train_volumes} volumes) — "
            f"drop-last would yield zero batches per epoch")

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
                  f"synth={float(m['loss_ae_dist_extra']):.5f}",
                  flush=True)
    dt = time.time() - t0
    print(f"trained {steps} steps in {dt:.1f}s "
          f"({steps / dt:.1f} steps/s)")

    score_latent_interp = args.latent_interp
    if args.latent_interp == "fitted":
        # fit the tap table on val phantoms disjoint from train AND test
        import tempfile

        from superresolution_aniso_mri_tpu.infer import (
            fit_latent_taps, save_latent_taps,
        )

        val_vols = build_vols(3, seed=2000)
        fit = fit_latent_taps(trainer, val_vols, ds, verbose=True)
        tap_path = os.path.join(tempfile.mkdtemp(prefix="sr_taps_"),
                                "latent_taps.npz")
        save_latent_taps(tap_path, fit["offsets"], fit["alphas"],
                         fit["weights"])
        print(f"fitted taps: holdout mse {fit['loss_init']:.6f} -> "
              f"{fit['loss_final']:.6f}")
        score_latent_interp = f"fitted:{tap_path}"

    print(f"\n=== {ds}x through-plane SR on held-out volumes ===")
    rows = {}
    res = create_hr_images(trainer, test_vols, downsample_steps=ds,
                           latent_interp=score_latent_interp)
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

    model = rows["model (AESR)"]
    conv_methods = ("linear", "bspline", "lanczos")
    wins = {}
    for metric in ("ssim_synth", "psnr_synth", "vif_synth"):
        best_conv = max(rows[m][metric][0] for m in conv_methods)
        wins[metric] = (model[metric][0], best_conv)
    all_beat = all(m > c for m, c in wins.values())
    for metric, (mv, cv) in wins.items():
        tag = "BEATS" if mv > cv else ("ties" if mv == cv
                                       else "does not beat")
        print(f"{metric}: model {tag} best conventional "
              f"({mv:.4f} vs {cv:.4f})")
    print(f"\nmodel {'BEATS' if all_beat else 'does not beat'} "
          f"conventional interpolation on ALL metrics")

    if args.json_out:
        rec = {
            "loss_mode": args.loss_mode, "lpips_mode": lpips_mode,
            "latent_interp": args.latent_interp,
            "epochs": args.epochs, "depth": args.depth,
            "phantom": args.phantom,
            "downsample_steps": ds,
            "train_seconds": round(dt, 1),
            "model": {k: round(float(model[k][0]), 5)
                      for k in ("ssim_synth", "psnr_synth", "vif_synth")},
            "best_conventional": {
                k: round(float(max(rows[m][k][0] for m in conv_methods)), 5)
                for k in ("ssim_synth", "psnr_synth", "vif_synth")},
            "beats_all": bool(all_beat),
        }
        with open(args.json_out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"appended result to {args.json_out}")


if __name__ == "__main__":
    main()
