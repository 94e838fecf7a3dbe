"""Regression tests for training-loop/ops robustness fixes:
heterogeneous volume shapes, odd-size laplacian pyramids, rolling
last.models checkpoints for elastic resume."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.data import TripletSampler, Volume
from superresolution_aniso_mri_tpu.ops import lap_loss


def _vol(shape, seed):
    rng = np.random.RandomState(seed)
    return Volume(image=rng.rand(*shape).astype(np.float32),
                  spacing=np.array([3.0, 1.0, 1.0]),
                  patient_id=f"p{seed}")


def test_sampler_pads_heterogeneous_volumes_to_common_shape():
    """Volumes larger than pad_size must still land on ONE batch shape
    (a fixed small pad mixed shapes: numpy stack crash, native gather
    out-of-bounds reads)."""
    vols = [_vol((6, 120, 100), 0), _vol((6, 160, 150), 1)]
    s = TripletSampler(vols, downsample_steps=2, pad_size=128, seed=3)
    batch = s.sample_batch(8)
    assert batch["triplet"].shape == (8, 160, 160, 3)
    # the padded small volume's content is centered zero-pad, not
    # out-of-bounds garbage: every plane's sum matches a source slice sum
    cands = np.array([float(x.sum()) for v in vols for x in v.image])
    for item in batch["triplet"]:
        for c in range(3):
            ssum = float(np.asarray(item[..., c], np.float64).sum())
            assert np.isclose(cands, ssum, rtol=1e-4).any(), ssum


def test_lap_loss_handles_odd_sizes():
    rng = np.random.RandomState(0)
    for size in (45, 28, 30):
        a = jnp.asarray(rng.rand(2, size, size, 1), jnp.float32)
        b = jnp.asarray(rng.rand(2, size, size, 1), jnp.float32)
        val = float(lap_loss(a, b))
        assert np.isfinite(val) and val > 0


def test_rolling_last_checkpoint_and_auto_resume(tmp_path):
    """Every epoch writes last.models (elastic resume below the
    epoch_threshold; short runs keep their weights); auto_resume loads
    it."""
    from superresolution_aniso_mri_tpu.cli.train_loop import run_training

    args = {
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 2,
        "epoch_threshold": 10 ** 9,  # numbered checkpoints suppressed
        "ex_loss_weight1": 0.01, "use_batchnorm": False,
        "use_sigmoid": True, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0,
        "output_dir": str(tmp_path), "use_synthetic_data": True,
        "limited_load": True, "volume_preview_interval": 0,
    }
    t = run_training(dict(args), verbose=False)
    last = os.path.join(t.dir_models, "last.models")
    assert os.path.isfile(last), \
        "short runs below epoch_threshold must still save weights"
    t2 = run_training(dict(args, auto_resume=True, epochs=3),
                      verbose=False)
    assert t2.epoch == 3  # resumed at 2, trained one more


def test_empty_epoch_raises_clearly(tmp_path):
    from superresolution_aniso_mri_tpu.cli.train_loop import run_training

    args = {
        "dataset": "MNIST3D", "model": "ae", "ae_class": "VanillaACAI",
        "width": 32, "latent_width": 16, "depth": 8, "latent": 8,
        "colors": 1, "lr": 1e-3, "weight_decay": 0.0,
        "batch_size": 4096,  # far larger than the toy dataset
        "epochs": 1, "epoch_threshold": -1, "use_batchnorm": False,
        "use_sigmoid": True, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": str(tmp_path),
        "use_synthetic_data": True, "limited_load": True,
    }
    with pytest.raises(ValueError, match="0 training batches"):
        run_training(args, verbose=True)


def test_resume_restores_loss_history_and_best_val(tmp_path):
    """Resume must rehydrate the npz loss archives and best-val
    trackers — otherwise the first post-resume epoch overwrites
    ae.models with any (worse) model and clobbers the history."""
    from superresolution_aniso_mri_tpu.train import Trainer

    args = {
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 16, "latent_width": 8,
        "depth": 4, "latent": 4, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 2, "epochs": 4,
        "epoch_threshold": -1, "use_batchnorm": False,
        "use_sigmoid": True, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": str(tmp_path),
    }
    t = Trainer(dict(args))
    t.prepare_run()
    # two epochs of fake history; best val loss at epoch 0
    t.mean_losses["loss_ae"] = [0.5, 0.4]
    t.mean_losses_test["loss_ae"] = [0.5, 0.45]
    t.mean_losses_test["loss_ae_dist"] = [0.10, 0.20]
    t.loss_iters = [10, 20]
    t._best_val["loss_ae_dist"] = 0.10
    t.epoch = 1
    t.end_epoch_processing()   # writes last.models + npz archives

    t2 = Trainer(dict(args))
    t2.load(os.path.join(t.dir_models, "last.models"))
    assert t2.epoch == 2
    assert t2.loss_iters == [10, 20]
    assert t2.mean_losses_test["loss_ae_dist"] == [0.10, 0.20]
    assert t2._best_val["loss_ae_dist"] == pytest.approx(0.10)


def test_load_caisr_from_dict_family_checkpoint(tmp_path):
    """caisr.models saved by an acai run stores {'ae', 'disc'} params;
    load_caisr into a plain-AE trainer must select the 'ae' subtree."""
    from superresolution_aniso_mri_tpu.train import Trainer

    base = {
        "dataset": "MNIST3D", "ae_class": "VanillaACAI", "width": 16,
        "latent_width": 8, "depth": 4, "latent": 4, "colors": 1,
        "lr": 1e-3, "weight_decay": 0.0, "batch_size": 2, "epochs": 1,
        "epoch_threshold": -1, "use_batchnorm": False,
        "use_sigmoid": True, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": str(tmp_path),
    }
    t_acai = Trainer(dict(base, model="acai"))
    t_acai.prepare_run()
    ckpt = os.path.join(t_acai.dir_models, "caisr.models")
    t_acai.save_models(ckpt, 1)

    t_ae = Trainer(dict(base, model="ae", output_dir=None))
    t_ae.load_caisr(ckpt)
    assert t_ae.params_sr is not None
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    out = t_ae.predict(x, use_sr_model=True)
    assert out.shape == x.shape
