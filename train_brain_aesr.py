#!/usr/bin/env python
"""Brain (OASIS/dHCP/ADNI/MNIST3D/MNISTRoto) AESR training CLI.

Flag-compatible re-design of the reference CLI
(reference: train_brain_aesr.py:137-206).

Example (reference README.md:46, OASIS ae_combined):
  python train_brain_aesr.py -d OASIS -m ae_combined -b 16 --width 64 \
      --latent_width 16 --latent 128 --downsample_steps 4 -e 1500 \
      --aug_patch_size 220 --ex_loss_weight1 0.001
"""
import numpy as np

from superresolution_aniso_mri_tpu.config.arguments import parse_args
from superresolution_aniso_mri_tpu.cli import run_training


def main():
    args, args_dict = parse_args()
    if args.dataset not in ("OASIS", "dHCP", "ADNI", "MNIST3D", "MNISTRoto"):
        raise SystemExit(f"train_brain_aesr: brain/toy datasets only, "
                         f"got {args.dataset}")
    np.random.seed(args.seed)
    run_training(args_dict)


if __name__ == "__main__":
    main()
