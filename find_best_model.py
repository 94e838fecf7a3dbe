#!/usr/bin/env python
"""Best-model epoch sweep CLI (reference: evaluate/find_best_model.py).

Thin shim over the installable entry point
superresolution_aniso_mri_tpu.cli.entry:find_best_model.
"""
from superresolution_aniso_mri_tpu.cli.entry import find_best_model

if __name__ == "__main__":
    find_best_model()
