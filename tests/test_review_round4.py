"""Regression tests for the round-4 code-review findings."""
import json
import os

import numpy as np

import tools.real_pipeline_quality as rpq
from superresolution_aniso_mri_tpu.cli.train_loop import (
    rehydrate_resume_loss_config,
)
from superresolution_aniso_mri_tpu.config.settings import (
    save_experiment_settings,
)


def test_resume_rehydrates_mix_loss_from_settings(tmp_path):
    """An --auto_resume continuation with no explicit
    --image_mix_loss_func must take the RECORDED mix loss, not the
    (SR_MIX_LOSS_DEFAULT-sensitive) ambient default."""
    out = str(tmp_path / "exp")
    os.makedirs(out)
    save_experiment_settings(
        {"image_mix_loss_func": "mse", "alpha_loss_func": None},
        os.path.join(out, "settings.yaml"))

    d = {"auto_resume": True, "output_dir": out,
         "image_mix_loss_func": None, "alpha_loss_func": None}
    assert rehydrate_resume_loss_config(d) == ["image_mix_loss_func"]
    assert d["image_mix_loss_func"] == "mse"

    # explicit CLI value wins (no rehydration)
    d = {"auto_resume": True, "output_dir": out,
         "image_mix_loss_func": "perceptual"}
    assert rehydrate_resume_loss_config(d) == []
    assert d["image_mix_loss_func"] == "perceptual"

    # no auto_resume / no settings.yaml -> no-op
    assert rehydrate_resume_loss_config(
        {"auto_resume": False, "output_dir": out,
         "image_mix_loss_func": None}) == []
    assert rehydrate_resume_loss_config(
        {"auto_resume": True, "output_dir": str(tmp_path / "nope"),
         "image_mix_loss_func": None}) == []


def test_savez_atomic_no_torn_file(tmp_path):
    """Loss archives are written tmp+rename: the destination is either
    absent or a complete npz, and no tmp litter survives."""
    from superresolution_aniso_mri_tpu.train.trainer import Trainer

    p = str(tmp_path / "losses_train.npz")
    Trainer._savez_atomic(p, a=np.arange(5))
    with np.load(p) as d:
        np.testing.assert_array_equal(d["a"], np.arange(5))
    Trainer._savez_atomic(p, a=np.arange(7))
    with np.load(p) as d:
        assert d["a"].shape == (7,)
    assert os.listdir(str(tmp_path)) == ["losses_train.npz"]


def test_losses_written_before_checkpoint_each_epoch():
    """end_epoch_processing must flush the loss archives BEFORE the
    rolling checkpoint: a kill between the two then leaves npz entries
    >= the checkpoint's epoch, which _restore_history truncates —
    the reverse order loses the final epoch's loss entry for good."""
    import inspect

    from superresolution_aniso_mri_tpu.train.trainer import Trainer

    src = inspect.getsource(Trainer.end_epoch_processing)
    assert src.index("self.save_losses()") < src.index("last.models")


def test_fabrication_provenance_roundtrip(tmp_path, monkeypatch):
    """--reuse recovers phantom_noise/anatomy/counts from the kept
    work dir's fabrication.json (settings.yaml cannot know them)."""
    work = str(tmp_path)
    fab = {"dataset_shape": "OASIS", "anatomy": "rotate",
           "n_patients": 24, "num_slices": 37, "inplane": 64,
           "num_frames": 6, "phantom_noise": 0.03}
    with open(os.path.join(work, "fabrication.json"), "w") as f:
        json.dump(fab, f)
    # mirror the reuse branch's override loop
    import argparse
    args = argparse.Namespace(dataset_shape="OASIS", anatomy="rotate",
                              n_patients=24, num_slices=37, inplane=64,
                              num_frames=6, phantom_noise=0.0)
    with open(os.path.join(work, "fabrication.json")) as f:
        kept = json.load(f)
    for key in ("dataset_shape", "anatomy", "n_patients", "num_slices",
                "inplane", "num_frames", "phantom_noise"):
        if key in kept and kept[key] != getattr(args, key):
            setattr(args, key, kept[key])
    assert args.phantom_noise == 0.03


def test_fabrication_json_written_on_fresh_run(tmp_path):
    """The non-reuse path records fabrication provenance next to the
    data tree (exercised through the module-level fabricators the tool
    calls; here we check the write site exists by scanning main)."""
    import inspect

    src = inspect.getsource(rpq)
    assert "fabrication.json" in src
    # write side present in the non-reuse branch, read side in reuse
    assert src.count("fabrication.json") >= 2


def test_train_bench_f32_floor_uses_f32_peak():
    import tools.train_bench as tb

    assert tb.V5E_PEAK_F32_FLOPS < tb.V5E_PEAK_BF16_FLOPS
    assert abs(tb.V5E_PEAK_F32_FLOPS * 3 - tb.V5E_PEAK_BF16_FLOPS) < 1e9


def test_gap_study_import_is_side_effect_free():
    """Importing run_study (as the pinned test does) must not mutate
    the importing process's JAX platform environment."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['PALLAS_AXON_POOL_IPS'] = 'sentinel'\n"
        "os.environ.pop('JAX_PLATFORMS', None)\n"
        "import sys; sys.path.insert(0, 'tools')\n"
        "import lpips_gap_study\n"
        "assert os.environ.get('PALLAS_AXON_POOL_IPS') == 'sentinel'\n"
        "assert 'JAX_PLATFORMS' not in os.environ\n"
        "print('clean')\n")
    r = subprocess.run([sys.executable, "-c", code], cwd=rpq.REPO,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "clean" in r.stdout, r.stderr[-1500:]
