#!/usr/bin/env python
"""Generate the evaluation notebooks (notebooks/*.ipynb).

The reference ships three interactive notebooks
(notebooks/evaluate_MNIST.ipynb, evaluate_brain.ipynb,
evaluate_cardiac.ipynb) as its exploratory evaluation surface. These are
their framework-native equivalents: self-contained, CPU-runnable on the
synthetic backend (point the data loaders at real trees via SR_DATA_ROOT
to reproduce paper numbers), regenerated deterministically by this
script. tests/test_notebooks.py executes every code cell.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _nb(cells):
    import nbformat

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    out = []
    for kind, src in cells:
        if kind == "md":
            out.append(nbformat.v4.new_markdown_cell(src))
        else:
            out.append(nbformat.v4.new_code_cell(src))
    nb.cells = out
    return nb


SETUP = """\
import os, sys
sys.path.insert(0, os.path.abspath(".."))  # repo root when run from notebooks/
import matplotlib
matplotlib.use("Agg")  # drop this line for inline display
import jax
import numpy as np
# run on CPU by default; delete the next line to use an attached TPU
jax.config.update("jax_platforms", "cpu")
"""


def mnist_nb():
    return _nb([
        ("md", "# Evaluate MNIST3D / rotation toys\n"
               "Framework equivalent of the reference's "
               "`notebooks/evaluate_MNIST.ipynb`: train a small "
               "`ae_combined` model on the rotation-toy backend and "
               "inspect latent interpolation quality.\n\n"
               "Set `SR_MNIST_PATH` to a local "
               "`train-images-idx3-ubyte.gz` to use real digits."),
        ("code", SETUP),
        ("code", """\
from superresolution_aniso_mri_tpu.data import (
    TripletSampler, make_toy_dataset, prepare_batch_pairs)
from superresolution_aniso_mri_tpu.train import Trainer
import jax.numpy as jnp

EPOCHS = int(os.environ.get("NB_EPOCHS", 8))
vols = make_toy_dataset(6, size=32, num_slices=13, seed=0,
                        mnist_path=os.environ.get("SR_MNIST_PATH"))
trainer = Trainer({
    "dataset": "MNIST3D", "model": "ae_combined",
    "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
    "depth": 16, "latent": 16, "colors": 1, "lr": 2e-3,
    "weight_decay": 0.0, "batch_size": 8, "epochs": EPOCHS,
    "epoch_threshold": 10**9, "ex_loss_weight1": 0.1,
    "use_batchnorm": False, "use_sigmoid": True, "use_laploss": False,
    "use_percept_loss": False, "image_mix_loss_func": "mse",
    "downsample_steps": 2, "seed": 3, "output_dir": None})
sampler = TripletSampler(vols, 2, "adjacent_plus", seed=1)
for epoch in range(EPOCHS):
    for raw in sampler.epoch_batches(8):
        image, between = prepare_batch_pairs(jnp.asarray(raw["triplet"]))
        m = trainer.train({"image": image, "slice_between": between,
                           "alpha_from": jnp.asarray(raw["alpha_from"]),
                           "alpha_to": jnp.asarray(raw["alpha_to"])})
    print(f"epoch {epoch}: loss_ae={float(m['loss_ae']):.5f}")
"""),
        ("md", "## Latent interpolation between two slices"),
        ("code", """\
from superresolution_aniso_mri_tpu.infer import latent_space_interp
from superresolution_aniso_mri_tpu.evaluate import interpol_sequence_page

vol = make_toy_dataset(1, 32, 13, seed=99)[0].image
a, b = vol[4], vol[6]
mids = np.stack([
    np.asarray(latent_space_interp(
        trainer, alpha, jnp.asarray(b[None, ..., None]),
        jnp.asarray(a[None, ..., None])))[0, ..., 0]
    for alpha in (0.25, 0.5, 0.75)])
fig = interpol_sequence_page(a, mids, b)
fig.savefig("mnist_interpolation.png", dpi=110)
print("ground truth mid-slice MSE:",
      float(np.mean((mids[1] - vol[5]) ** 2)))
"""),
        ("md", "## Model vs conventional interpolation"),
        ("code", """\
from superresolution_aniso_mri_tpu.evaluate import create_hr_images

test_vols = make_toy_dataset(2, 32, 13, seed=500)
rows = {"model": create_hr_images(trainer, test_vols,
                                  downsample_steps=2)["aggregate"]}
for meth in ("linear", "lanczos"):
    rows[meth] = create_hr_images(None, test_vols, downsample_steps=2,
                                  interpol_method=meth)["aggregate"]
for name, agg in rows.items():
    print(f"{name:>8}: SSIM {agg['ssim_synth'][0]:.4f}  "
          f"PSNR {agg['psnr_synth'][0]:.2f}  "
          f"VIF {agg['vif_synth'][0]:.4f}")
"""),
    ])


def brain_nb():
    return _nb([
        ("md", "# Evaluate brain SR (OASIS / dHCP / ADNI)\n"
               "Framework equivalent of the reference's "
               "`notebooks/evaluate_brain.ipynb`. Uses the synthetic "
               "backend by default; set `SR_DATA_ROOT` (and drop "
               "`use_synthetic_data`) for real trees."),
        ("code", SETUP),
        ("code", """\
from superresolution_aniso_mri_tpu.cli.train_loop import run_training
import tempfile

EPOCHS = int(os.environ.get("NB_EPOCHS", 4))
exper = os.path.join(tempfile.mkdtemp(), "brain_demo")
trainer = run_training({
    "dataset": "OASIS", "model": "ae_combined",
    "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
    "depth": 16, "latent": 16, "colors": 1, "lr": 2e-3,
    "batch_size": 8, "epochs": EPOCHS, "epoch_threshold": -1,
    "ex_loss_weight1": 0.1, "use_sigmoid": True,
    "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
    "use_synthetic_data": True, "volume_preview_interval": 0,
    "output_dir": exper})
"""),
        ("md", "## Super-resolve held-out volumes, compare methods"),
        ("code", """\
from superresolution_aniso_mri_tpu.data import make_toy_dataset
from superresolution_aniso_mri_tpu.evaluate import (
    boxplot_page, create_hr_images, methods_comparison_page)
from superresolution_aniso_mri_tpu.infer import (
    create_simple_interpolation, create_super_volume)

val = make_toy_dataset(3, 32, 13, seed=1000)
res_model = create_hr_images(trainer, val, downsample_steps=2)
res_lin = create_hr_images(None, val, downsample_steps=2,
                           interpol_method="linear")
print("model  :", {k: round(res_model['aggregate'][k][0], 4)
                   for k in ('ssim_synth', 'psnr_synth', 'vif_synth')})
print("linear :", {k: round(res_lin['aggregate'][k][0], 4)
                   for k in ('ssim_synth', 'psnr_synth', 'vif_synth')})
"""),
        ("code", """\
vol = val[0].image
lr = vol[::2]
methods = {
    "AISR": create_super_volume(trainer, vol, alpha_range=[0.5],
                                downsample_steps=2,
                                generate_inbetween_slices=True,
                                use_original=True)["upsampled_image"],
    "linear": create_simple_interpolation(
        vol, 2, method="linear", generate_inbetween_slices=True),
}
fig = methods_comparison_page(vol, methods)
fig.savefig("brain_methods.png", dpi=110)
per_method = {
    "AISR": res_model["per_volume"][val[0].patient_id],
    "linear": res_lin["per_volume"][val[0].patient_id],
}
per_method = {m: {k: [v[k]] for k in ("ssim", "psnr", "vif",
                                      "ssim_synth", "psnr_synth",
                                      "vif_synth")}
              for m, v in per_method.items()}
fig = boxplot_page(per_method)
fig.savefig("brain_boxplots.png", dpi=110)
print("figures saved")
"""),
    ])


def cardiac_nb():
    return _nb([
        ("md", "# Evaluate cardiac SR (ACDC 4-D)\n"
               "Framework equivalent of the reference's "
               "`notebooks/evaluate_cardiac.ipynb`: through-plane SR of "
               "cine frames, LAX views and clinical volume curves."),
        ("code", SETUP),
        ("code", """\
from superresolution_aniso_mri_tpu.data import (
    TripletSampler, make_toy_dataset, prepare_batch_pairs)
from superresolution_aniso_mri_tpu.train import Trainer
import jax.numpy as jnp

EPOCHS = int(os.environ.get("NB_EPOCHS", 6))
frames = [make_toy_dataset(1, 32, 9, seed=s)[0] for s in range(4)]
img4d = np.stack([f.image for f in frames])   # [t, z, y, x]
trainer = Trainer({
    "dataset": "ACDC", "model": "ae_combined",
    "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
    "depth": 16, "latent": 16, "colors": 1, "lr": 2e-3,
    "batch_size": 8, "epochs": EPOCHS, "epoch_threshold": 10**9,
    "ex_loss_weight1": 0.1, "use_sigmoid": True, "use_laploss": False,
    "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
    "output_dir": None})
sampler = TripletSampler(frames, 2, "adjacent_plus", seed=2)
for epoch in range(EPOCHS):
    for raw in sampler.epoch_batches(8):
        image, between = prepare_batch_pairs(jnp.asarray(raw["triplet"]))
        m = trainer.train({"image": image, "slice_between": between,
                           "alpha_from": jnp.asarray(raw["alpha_from"]),
                           "alpha_to": jnp.asarray(raw["alpha_to"])})
    print(f"epoch {epoch}: loss_ae={float(m['loss_ae']):.5f}")
"""),
        ("md", "## Frame-wise SR + long-axis views"),
        ("code", """\
from superresolution_aniso_mri_tpu.evaluate import (
    cardiac_lax_page, evaluate_image)
from superresolution_aniso_mri_tpu.infer import create_super_volume

rd = evaluate_image(trainer, {"image": img4d}, frame_id=0,
                    downsample_steps=2)
print("frame-0 synth stack:", rd["synth_images"][0].shape)
sr4d = np.stack([
    create_super_volume(trainer, img4d[t], alpha_range=[0.5],
                        downsample_steps=2,
                        generate_inbetween_slices=True,
                        use_original=True)["upsampled_image"]
    for t in range(img4d.shape[0])])
fig = cardiac_lax_page({"reference": img4d, "AISR": sr4d}, frame=0)
fig.savefig("cardiac_lax.png", dpi=110)
print("LAX page saved; SR 4D:", sr4d.shape)
"""),
        ("md", "## Clinical volume curves over the cycle"),
        ("code", """\
from superresolution_aniso_mri_tpu.evaluate import volumes_over_time

labels4d = (sr4d > 0.5).astype(np.int32)  # toy segmentation stand-in
voxel_ml = 3.0 * 1.0 * 1.0 / 1000.0
curves = volumes_over_time(labels4d, voxel_ml, labels={"LV": 1})
print("LV volume curve (ml):", np.round(curves["LV"], 2))
"""),
    ])


def main():
    import argparse

    import nbformat

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "notebooks"),
                    help="destination directory (default: repo "
                         "notebooks/)")
    out_dir = os.path.expanduser(ap.parse_args().out)
    os.makedirs(out_dir, exist_ok=True)
    for name, nb in (("evaluate_MNIST", mnist_nb()),
                     ("evaluate_brain", brain_nb()),
                     ("evaluate_cardiac", cardiac_nb())):
        path = os.path.join(out_dir, f"{name}.ipynb")
        nbformat.validate(nb)
        with open(path, "w") as f:
            nbformat.write(nb, f)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
