"""Tests for the dataset-level eval drivers + model registry."""
import os

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data import make_toy_dataset
from superresolution_aniso_mri_tpu.evaluate import (
    evaluate_interpolation_performance,
    test_interpolation_with_rigid_transformations,
    create_brain_volumes, load_model_specs, register_model,
    CARDIAC_MODEL_SPECS,
)
from superresolution_aniso_mri_tpu.train import Trainer

# silence the pytest collector: this reference-named function is an API,
# not a test
test_interpolation_with_rigid_transformations.__test__ = False


def _toy_trainer():
    return Trainer({
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 2,
        "epoch_threshold": -1, "ex_loss_weight1": 0.01,
        "use_batchnorm": False, "use_sigmoid": True, "use_laploss": False,
        "use_percept_loss": False, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": None,
    })


def test_interp_performance_wrapper():
    t = _toy_trainer()
    vols = make_toy_dataset(1, 32, 9, seed=4)
    res = evaluate_interpolation_performance(t, vols, downsample_steps=2)
    assert np.isfinite(res["aggregate"]["ssim_synth"][0])


def test_rigid_transform_sensitivity():
    t = _toy_trainer()
    vol = make_toy_dataset(1, 32, 9, seed=5)[0]
    res = test_interpolation_with_rigid_transformations(
        t, vol, downsample_steps=2, angles=(0, 10))
    assert set(res) == {0, 10}
    for agg in res.values():
        assert np.isfinite(agg["ssim_synth"][0])


def test_create_brain_volumes_synthetic(tmp_path):
    t = _toy_trainer()
    res = create_brain_volumes(t, "MNIST3D", downsample_steps=2,
                               output_dir=str(tmp_path), width=32,
                               limited_load=True)
    assert len(res["per_volume"]) >= 1
    # per-patient subdirs (reference create_HR_images.py:81-107 contract)
    saved = [os.path.join(d, f) for d in os.listdir(tmp_path)
             if os.path.isdir(os.path.join(tmp_path, d)) and d != "results"
             for f in os.listdir(os.path.join(tmp_path, d))
             if f.endswith(".nii.gz")]
    assert saved


def test_model_registry(tmp_path):
    register_model(CARDIAC_MODEL_SPECS, "toy", str(tmp_path),
                   checkpoint=3, downsample_steps=2)
    try:
        assert CARDIAC_MODEL_SPECS["toy"]["checkpoint"] == 3
    finally:
        # never leak the tmp-path spec into the module-global registry
        CARDIAC_MODEL_SPECS.pop("toy", None)
    yaml_path = tmp_path / "models.yaml"
    yaml_path.write_text(
        "exp_a:\n  path: /tmp/exp_a\n  checkpoint: caisr\n")
    specs = load_model_specs(str(yaml_path))
    assert specs["exp_a"]["checkpoint"] == "caisr"
