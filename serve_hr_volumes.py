#!/usr/bin/env python
"""Directory-watching HR-volume serving daemon (TPU-native extension;
the reference has only the one-shot generate_hr_volumes.py batch
script).

Thin shim over the installable entry point
superresolution_aniso_mri_tpu.cli.entry:serve_hr_volumes.
"""
from superresolution_aniso_mri_tpu.cli.entry import serve_hr_volumes

if __name__ == "__main__":
    serve_hr_volumes()
