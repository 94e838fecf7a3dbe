#!/usr/bin/env python
"""Standalone HR-volume generation CLI (reference: generate_hr_volumes.py).

Thin shim over the installable entry point
superresolution_aniso_mri_tpu.cli.entry:generate_hr_volumes.
"""
from superresolution_aniso_mri_tpu.cli.entry import generate_hr_volumes

if __name__ == "__main__":
    generate_hr_volumes()
