#!/usr/bin/env python
"""Standalone HR-volume generation CLI.

Reference: generate_hr_volumes.py:159-209 — load an experiment from
settings.yaml + checkpoint, read a directory of NIfTI/mha/mhd volumes,
synthesize `num_interpolations` slices between every adjacent pair
(original slices kept verbatim) and write NIfTI with new z-spacing
= old / (num_interpolations + 1).
"""
import argparse
import glob
import os

import numpy as np

from superresolution_aniso_mri_tpu.data import rescale_intensities
from superresolution_aniso_mri_tpu.infer import create_super_volume
from superresolution_aniso_mri_tpu.train import get_trainer
from superresolution_aniso_mri_tpu.utils import read_image, write_image


def load_images(data_input_dir):
    files = []
    for pat in ("*.nii", "*.nii.gz", "*.mha", "*.mhd"):
        files.extend(glob.glob(os.path.join(data_input_dir, pat)))
    files = sorted(set(files))
    if not files:
        raise SystemExit(f"no volumes found in {data_input_dir}")
    return files


def main():
    parser = argparse.ArgumentParser(
        description="Synthesize in-between slices for anisotropic volumes")
    parser.add_argument("--exper_dir", type=str, required=True,
                        help="experiment directory (settings.yaml + models/)")
    parser.add_argument("--model_nbr", type=str, default="caisr",
                        help="epoch number or 'ae'/'caisr'")
    parser.add_argument("--data_input_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--num_interpolations", type=int, default=1)
    args = parser.parse_args()

    model_nbr = (int(args.model_nbr) if args.model_nbr.isdigit()
                 else args.model_nbr)
    trainer = get_trainer(os.path.expanduser(args.exper_dir),
                          model_nbr=model_nbr, eval_mode=True)
    os.makedirs(args.output_dir, exist_ok=True)

    n = args.num_interpolations
    alpha_range = np.linspace(0, 1, n + 2)[1:-1]
    for path in load_images(os.path.expanduser(args.data_input_dir)):
        arr, spacing, affine = read_image(path)
        arr = arr.astype(np.float32)
        frames = arr[None] if arr.ndim == 3 else arr
        out_frames = []
        for frame in frames:
            # percentile-normalize if outside [0,1]
            # (reference: generate_hr_volumes.py:104-111,130-133)
            if frame.min() < 0 or frame.max() > 1:
                frame = rescale_intensities(frame, percs=(1, 99))
            res = create_super_volume(trainer, frame,
                                      alpha_range=alpha_range,
                                      use_original=True,
                                      downsample_steps=None,
                                      generate_inbetween_slices=False)
            out_frames.append(res["upsampled_image"])
        out = (out_frames[0] if arr.ndim == 3
               else np.stack(out_frames, axis=0))
        new_spacing = np.asarray(spacing, np.float64).copy()
        new_spacing[0] = new_spacing[0] / (n + 1)
        base = os.path.basename(path)
        for ext in (".nii.gz", ".nii", ".mha", ".mhd"):
            if base.endswith(ext):
                base = base[: -len(ext)]
                break
        out_path = os.path.join(args.output_dir,
                                f"{base}_ni{n:02d}.nii.gz")
        write_image(out_path, out.astype(np.float32), spacing=new_spacing)
        print(f"saved {out_path}  ({out.shape[0] if out.ndim==3 else out.shape[1]} slices, "
              f"z-spacing {new_spacing[0]:.3f}mm)")


if __name__ == "__main__":
    main()
