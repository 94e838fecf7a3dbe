#!/usr/bin/env python
"""Brain (OASIS/dHCP/ADNI/MNIST3D/MNISTRoto) AESR training CLI.

Flag-compatible re-design of the reference CLI
(reference: train_brain_aesr.py:137-206).

Example (reference README.md:46, OASIS ae_combined):
  python train_brain_aesr.py -d OASIS -m ae_combined -b 16 --width 64 \
      --latent_width 16 --latent 128 --downsample_steps 4 -e 1500 \
      --aug_patch_size 220 --ex_loss_weight1 0.001
"""
from superresolution_aniso_mri_tpu.cli.entry import train_brain as main

if __name__ == "__main__":
    main()
