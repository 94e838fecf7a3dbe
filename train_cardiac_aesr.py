#!/usr/bin/env python
"""Cardiac (ACDC/ACDCLBL/ACDCC) AESR training CLI.

Flag-compatible re-design of the reference CLI
(reference: train_cardiac_aesr.py:153-214): same argument surface,
experiment-directory contract and checkpoint naming; the loop itself runs
as jitted XLA programs (see superresolution_aniso_mri_tpu/cli/train_loop.py).

Example (reference README.md:23):
  python train_cardiac_aesr.py -d ACDC -m ae_combined -b 12 --latent 128 \
      --downsample_steps 2 -e 900 --ex_loss_weight1 0.05
"""
from superresolution_aniso_mri_tpu.cli.entry import train_cardiac as main

if __name__ == "__main__":
    main()
