#!/usr/bin/env python
"""Fit learned per-alpha latent tap weights on the validation split.

Thin shim over the installable entry point
superresolution_aniso_mri_tpu.cli.entry:fit_latent_taps. The fitted
table ('<exper>/models/latent_taps.npz') is the optimal member of the
multi-tap z-mixing family (linear/cubic/lanczos3 are fixed points of
it) for this decoder and anatomy — serve with --latent_interp fitted.
"""
from superresolution_aniso_mri_tpu.cli.entry import fit_latent_taps

if __name__ == "__main__":
    fit_latent_taps()
