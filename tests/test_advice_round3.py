"""Regression tests for the round-3 advisor findings (ADVICE.md):
native-loader NaN scl_slope, brainMASI split-dir leak, resume-history
truncation, train_bench runnability."""
import os
import struct

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.utils.nifti import read_nifti, write_nifti


def _write_nifti_nan_slope(path, arr, spacing):
    """NIfTI with an uninitialized (NaN) scl_slope/scl_inter header —
    common in the wild; must be treated as 'no scaling'."""
    write_nifti(path, arr, spacing=spacing)
    with open(path, "r+b") as f:
        f.seek(112)
        f.write(struct.pack("<f", float("nan")))   # scl_slope
        f.write(struct.pack("<f", float("nan")))   # scl_inter


def test_python_reader_nan_slope_is_identity(tmp_path):
    a = np.random.RandomState(0).rand(5, 8, 8).astype(np.float32)
    p = str(tmp_path / "nan.nii")
    _write_nifti_nan_slope(p, a, [4.0, 1.0, 1.0])
    out, _, _ = read_nifti(p)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, a)


def test_native_reader_nan_slope_matches_python(tmp_path):
    from superresolution_aniso_mri_tpu.data import native_loader as nl
    if not nl.available():
        pytest.skip("native runtime unavailable")
    a = np.random.RandomState(1).rand(4, 6, 6).astype(np.float32)
    p = str(tmp_path / "nan.nii")
    _write_nifti_nan_slope(p, a, [4.0, 1.0, 1.0])
    out, sp, _ = nl.read_nifti_native(p)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, a)
    np.testing.assert_allclose(sp, [4.0, 1.0, 1.0])


def test_masi_missing_split_dir_raises(tmp_path):
    """split='test' with only a Training/ directory must raise, not
    silently return the training volumes as the test set."""
    from superresolution_aniso_mri_tpu.data.datasets import (
        load_brain_volumes,
    )

    d = tmp_path / "masi" / "Training"
    d.mkdir(parents=True)
    rng = np.random.RandomState(2)
    for pid in (1, 2):
        write_nifti(str(d / f"{pid}.nii.gz"),
                    rng.rand(8, 16, 16).astype(np.float32),
                    spacing=[3.0, 1.0, 1.0])
    # training split still works
    vols = load_brain_volumes("brainMASI", 3, split="training",
                              src_path=str(tmp_path / "masi"))
    assert len(vols) == 2
    with pytest.raises(FileNotFoundError):
        load_brain_volumes("brainMASI", 3, split="test",
                           src_path=str(tmp_path / "masi"))
    with pytest.raises(FileNotFoundError):
        load_brain_volumes("brainMASI", 3, split="validation",
                           src_path=str(tmp_path / "masi"))


def test_restore_history_truncates_to_checkpoint_epoch(tmp_path):
    """Loading an older numbered checkpoint (epoch k of an n>k run) must
    truncate the rehydrated loss archives and best-val trackers to the
    first k per-epoch entries."""
    from tests.test_train import _toy_args
    from superresolution_aniso_mri_tpu.train import Trainer

    t = Trainer(_toy_args("ae_combined", tmp_path))
    # simulate a 5-epoch run's archives: one entry per completed epoch
    t.loss_iters = [10, 20, 30, 40, 50]
    t.mean_losses["loss_ae"] = [0.9, 0.8, 0.7, 0.6, 0.5]
    t.mean_losses_test["loss_ae_dist"] = [0.9, 0.8, 0.2, 0.6, 0.1]
    t.save_losses()
    # checkpoint as written after completing epoch 2 (stores epoch 3 =
    # next to run)
    ckpt = os.path.join(str(tmp_path), "2.models")
    t.save_models(ckpt, 3)

    t2 = Trainer(_toy_args("ae_combined", tmp_path))
    t2.load(ckpt)
    assert t2.epoch == 3
    assert t2.loss_iters == [10, 20, 30]
    assert t2.mean_losses["loss_ae"] == [0.9, 0.8, 0.7]
    assert t2.mean_losses_test["loss_ae_dist"] == [0.9, 0.8, 0.2]
    assert t2._iters == 30
    # best-val must not remember the 0.1 from the discarded epoch 4
    np.testing.assert_allclose(t2._best_val["loss_ae_dist"], 0.2)


def test_train_bench_runs():
    """tools/train_bench.py's bench_config must complete and return the
    measured mean step time (regression: NameError after rename)."""
    import tools.train_bench as tb

    v = tb.bench_config("tiny", width=16, latent_width=8, depth=4,
                        latent=8, batch_pairs=2, compute_dtype="float32",
                        use_laploss=False, steps=2)
    assert v["pipelined_s"] > 0 and v["sync_s"] > 0
    # XLA's CPU backend exposes cost analysis too — FLOPs must be real
    assert v["flops"] > 1e6
