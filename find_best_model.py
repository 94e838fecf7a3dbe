#!/usr/bin/env python
"""Best-model epoch sweep CLI.

Reference: evaluate/find_best_model.py:184-213 — evaluate each saved
epoch checkpoint of an experiment on validation volumes, report and
persist the best SSIM/PSNR/VIF (overall + synthesized-only).
"""
import argparse
import os

from superresolution_aniso_mri_tpu.config.settings import load_settings
from superresolution_aniso_mri_tpu.data.datasets import get_datasets
from superresolution_aniso_mri_tpu.evaluate import find_best_val_model


def main():
    parser = argparse.ArgumentParser(description="Find best val model")
    parser.add_argument("--exper_dir", type=str, required=True)
    parser.add_argument("--downsample_steps", type=int, default=None)
    parser.add_argument("--limited_load", action="store_true")
    parser.add_argument("--use_synthetic_data", action="store_true")
    args = parser.parse_args()

    exper_dir = os.path.expanduser(args.exper_dir)
    settings = load_settings(os.path.join(exper_dir, "settings.yaml"))
    if args.limited_load:
        settings["limited_load"] = True
    if args.use_synthetic_data:
        settings["use_synthetic_data"] = True
    ds = args.downsample_steps or int(settings.get("downsample_steps") or 2)
    _train, val = get_datasets(settings)
    res = find_best_val_model(exper_dir, val, ds, verbose=True)
    print("best per metric:")
    for metric, info in res["best"].items():
        print(f"  {metric}: epoch {info['epoch']}  value {info['value']:.4f}")


if __name__ == "__main__":
    main()
