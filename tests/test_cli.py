"""End-to-end CLI smoke tests on the synthetic backend (CPU-runnable —
the framework's equivalent of the reference's MNIST3D smoke path,
SURVEY.md §4)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = dict(os.environ,
           JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
           # merge (not overwrite) inherited flags/paths — conftest.py
           # preserves inherited XLA flags for the same reason
           XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8"
                      ).strip(),
           PYTHONPATH=os.pathsep.join(
               p for p in (REPO, os.environ.get("PYTHONPATH")) if p))


def _run(cmd, **kw):
    return subprocess.run(cmd, cwd=REPO, env=ENV, capture_output=True,
                          text=True, timeout=1200, **kw)


@pytest.fixture(scope="module")
def trained_exper(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("exper"))
    r = _run([sys.executable, "train_brain_aesr.py",
              "-d", "MNIST3D", "-m", "ae_combined",
              "--downsample_steps", "2", "-e", "2", "-b", "4",
              "--width", "32", "--latent_width", "16", "--depth", "8",
              "--latent", "8", "--lr", "0.001",
              "--image_mix_loss_func", "mse",
              "--epoch_threshold", "-1", "--use_synthetic_data",
              "-o", out, "-id", "smoke"])
    assert r.returncode == 0, r.stderr[-3000:]
    exper_dir = os.path.join(out, "smoke")
    assert os.path.isfile(os.path.join(exper_dir, "settings.yaml"))
    return exper_dir


def test_train_cli_outputs(trained_exper):
    models = os.listdir(os.path.join(trained_exper, "models"))
    assert any(m.endswith(".models") for m in models)
    assert os.path.isfile(os.path.join(trained_exper, "losses_train.npz"))
    imgs = os.listdir(os.path.join(trained_exper, "log_images"))
    assert any(i.endswith(".png") for i in imgs)


def test_generate_hr_volumes_cli(trained_exper, tmp_path):
    from superresolution_aniso_mri_tpu.data import make_toy_dataset
    from superresolution_aniso_mri_tpu.utils import write_nifti, read_nifti

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    vol = make_toy_dataset(1, 32, 7, seed=3)[0]
    write_nifti(os.path.join(in_dir, "pat.nii.gz"), vol.image,
                spacing=np.array([6.0, 1.0, 1.0]))

    r = _run([sys.executable, "generate_hr_volumes.py",
              "--exper_dir", trained_exper, "--model_nbr", "0",
              "--data_input_dir", in_dir, "--output_dir", out_dir,
              "--num_interpolations", "2"])
    assert r.returncode == 0, r.stderr[-3000:]
    outs = [f for f in os.listdir(out_dir) if f.endswith(".nii.gz")]
    assert len(outs) == 1
    arr, spacing, affine = read_nifti(os.path.join(out_dir, outs[0]))
    assert arr.shape[0] == (7 - 1) * 3 + 1          # 2 interp per gap
    np.testing.assert_allclose(spacing[0], 2.0)     # 6mm / 3
    # the sform (preferred by NIfTI consumers over pixdim) must carry the
    # densified z spacing too — a verbatim source affine renders the
    # volume stretched (n+1)x in z
    assert affine is not None
    np.testing.assert_allclose(np.linalg.norm(affine[:3, 2]), 2.0,
                               rtol=1e-5)
    # original slices kept verbatim (use_original=True path)
    np.testing.assert_allclose(arr[::3], vol.image, atol=1e-6)


def test_generate_hr_volumes_cli_label_suffix(trained_exper, tmp_path):
    """A sibling '<name>_gt' volume must ride through synthesis (nearest
    lookup for a plain AE) and come back as an integer NIfTI, while the
    _gt file itself is excluded from the densify list. The reference CLI
    hardcodes labels=None (generate_hr_volumes.py:171)."""
    from superresolution_aniso_mri_tpu.data import make_toy_dataset
    from superresolution_aniso_mri_tpu.utils import write_nifti, read_nifti

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    vol = make_toy_dataset(1, 32, 7, seed=3)[0]
    write_nifti(os.path.join(in_dir, "pat.nii.gz"), vol.image,
                spacing=np.array([6.0, 1.0, 1.0]))
    rng = np.random.RandomState(0)
    lbl = rng.randint(0, 4, size=vol.image.shape).astype(np.int16)
    write_nifti(os.path.join(in_dir, "pat_gt.nii.gz"), lbl,
                spacing=np.array([6.0, 1.0, 1.0]), dtype=np.int16)

    r = _run([sys.executable, "generate_hr_volumes.py",
              "--exper_dir", trained_exper, "--model_nbr", "0",
              "--data_input_dir", in_dir, "--output_dir", out_dir,
              "--num_interpolations", "2"])
    assert r.returncode == 0, r.stderr[-3000:]
    outs = sorted(f for f in os.listdir(out_dir) if f.endswith(".nii.gz"))
    # exactly one image (pat_gt NOT densified as an image) + one label
    assert outs == ["pat_ni02.nii.gz", "pat_ni02_gt.nii.gz"], outs
    up_lbl, sp, _ = read_nifti(os.path.join(out_dir, outs[1]))
    assert np.issubdtype(up_lbl.dtype, np.integer)
    assert up_lbl.shape[0] == (7 - 1) * 3 + 1
    np.testing.assert_allclose(sp[0], 2.0)
    # original slice positions keep their labels verbatim
    np.testing.assert_array_equal(up_lbl[::3], lbl)


def test_serve_hr_volumes_once(trained_exper, tmp_path):
    """The serving daemon in --once mode drains a directory: densifies
    every volume (labels riding along), writes a JSONL manifest, exits.
    (TPU-native extension — the reference has no serving story.)"""
    import json

    from superresolution_aniso_mri_tpu.data import make_toy_dataset
    from superresolution_aniso_mri_tpu.utils import write_nifti

    watch = str(tmp_path / "watch")
    out_dir = str(tmp_path / "out")
    manifest = str(tmp_path / "manifest.jsonl")
    os.makedirs(watch)
    vols = make_toy_dataset(2, 32, 7, seed=11)
    write_nifti(os.path.join(watch, "a.nii.gz"), vols[0].image,
                spacing=np.array([6.0, 1.0, 1.0]))
    write_nifti(os.path.join(watch, "b.nii.gz"), vols[1].image,
                spacing=np.array([6.0, 1.0, 1.0]))
    lbl = np.random.RandomState(0).randint(
        0, 3, size=vols[0].image.shape).astype(np.int16)
    write_nifti(os.path.join(watch, "a_gt.nii.gz"), lbl,
                spacing=np.array([6.0, 1.0, 1.0]), dtype=np.int16)

    # --synth_timeout_s arms the stall watchdog around each synthesis;
    # a healthy run must complete without it firing
    r = _run([sys.executable, "serve_hr_volumes.py",
              "--exper_dir", trained_exper, "--model_nbr", "0",
              "--watch_dir", watch, "--output_dir", out_dir,
              "--num_interpolations", "1", "--once",
              "--synth_timeout_s", "600",
              "--manifest", manifest])
    assert r.returncode == 0, r.stderr[-3000:]
    outs = sorted(os.listdir(out_dir))
    assert outs == ["a_ni01.nii.gz", "a_ni01_gt.nii.gz",
                    "b_ni01.nii.gz"], outs
    lines = [json.loads(l) for l in open(manifest)]
    assert len(lines) == 2                      # one entry per volume
    assert all(l["seconds"] > 0 for l in lines)
    assert "serve loop exit after 2 volumes" in r.stdout


def test_serve_hr_volumes_poll_loop(trained_exper, tmp_path):
    """Live mode: a volume dropped AFTER startup is picked up once its
    stat is stable across two polls; --max_volumes bounds the run."""
    import threading

    from superresolution_aniso_mri_tpu.cli.entry import serve_hr_volumes
    from superresolution_aniso_mri_tpu.data import make_toy_dataset
    from superresolution_aniso_mri_tpu.utils import write_nifti

    watch = str(tmp_path / "watch")
    out_dir = str(tmp_path / "out")
    os.makedirs(watch)
    vols = make_toy_dataset(2, 32, 7, seed=12)
    write_nifti(os.path.join(watch, "first.nii.gz"), vols[0].image,
                spacing=np.array([6.0, 1.0, 1.0]))

    result = {}

    def _serve():
        result["served"] = serve_hr_volumes([
            "--exper_dir", trained_exper, "--model_nbr", "0",
            "--watch_dir", watch, "--output_dir", out_dir,
            "--num_interpolations", "1", "--poll_seconds", "0.2",
            "--max_volumes", "2"])

    th = threading.Thread(target=_serve, daemon=True)
    th.start()
    # drop the second volume while the daemon is live
    import time
    time.sleep(0.5)
    write_nifti(os.path.join(watch, "second.nii.gz"), vols[1].image,
                spacing=np.array([6.0, 1.0, 1.0]))
    th.join(timeout=300)
    assert not th.is_alive(), "serve loop did not stop at max_volumes"
    assert result["served"] == 2
    outs = sorted(os.listdir(out_dir))
    assert outs == ["first_ni01.nii.gz", "second_ni01.nii.gz"], outs


def test_serve_hr_volumes_arg_guards(tmp_path):
    """Fail fast on operational misconfigurations: a nonexistent watch
    dir (typo → daemon would spin forever serving nothing) and
    watch_dir == output_dir (self-feeding densification loop). Both
    guards run before the checkpoint loads."""
    from superresolution_aniso_mri_tpu.cli.entry import serve_hr_volumes

    d = str(tmp_path / "watch")
    os.makedirs(d)
    with pytest.raises(SystemExit, match="does not exist"):
        serve_hr_volumes(["--exper_dir", "unused",
                          "--watch_dir", str(tmp_path / "nope"),
                          "--output_dir", str(tmp_path / "out")])
    with pytest.raises(SystemExit, match="must differ"):
        serve_hr_volumes(["--exper_dir", "unused",
                          "--watch_dir", d, "--output_dir", d])


def test_serve_watchdog_beats_per_served_volume(trained_exper, tmp_path,
                                                monkeypatch):
    """The serve watchdog must beat() after each COMPLETED volume: the
    first served volume pays the XLA compile under the wide
    first_timeout_s window, and every later volume must be covered by
    the sharp steady-state synth_timeout_s window (it used to never
    beat, leaving the daemon on the 600s warm-up window forever)."""
    from superresolution_aniso_mri_tpu.cli import entry
    from superresolution_aniso_mri_tpu.data import make_toy_dataset
    from superresolution_aniso_mri_tpu.utils import watchdog as wd_mod
    from superresolution_aniso_mri_tpu.utils import write_nifti

    made = []

    class RecordingWatchdog(wd_mod.StepWatchdog):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            made.append(self)

    monkeypatch.setattr(wd_mod, "StepWatchdog", RecordingWatchdog)

    watch = str(tmp_path / "watch")
    out_dir = str(tmp_path / "out")
    os.makedirs(watch)
    vols = make_toy_dataset(2, 32, 7, seed=21)
    for i, v in enumerate(vols):
        write_nifti(os.path.join(watch, f"v{i}.nii.gz"), v.image,
                    spacing=np.array([6.0, 1.0, 1.0]))

    served = entry.serve_hr_volumes([
        "--exper_dir", trained_exper, "--model_nbr", "0",
        "--watch_dir", watch, "--output_dir", out_dir,
        "--num_interpolations", "1", "--once",
        "--synth_timeout_s", "600"])
    assert served == 2
    assert len(made) == 1
    wd = made[0]
    assert wd._beats == 2        # one beat per completed volume
    assert wd.first_timeout_s >= 600.0
    assert not wd._armed         # paused between volumes / at exit


def test_label_companion_helpers(tmp_path):
    """Review fixes: a '<stem>_gt' file is only treated as a label
    companion when its image sibling exists (a directory of volumes that
    merely end in _gt densifies as before), and the companion lookup
    tries every supported extension, not just the image's own."""
    from superresolution_aniso_mri_tpu.cli.entry import (
        _find_label_companion, _load_image_paths)

    d = str(tmp_path)
    for name in ("pat.nii", "pat_gt.nii.gz", "orphan_gt.nii.gz"):
        open(os.path.join(d, name), "wb").close()
    names = [os.path.basename(p) for p in _load_image_paths(d, "_gt")]
    assert names == ["orphan_gt.nii.gz", "pat.nii"]
    # cross-extension companion: pat.nii → pat_gt.nii.gz
    comp = _find_label_companion(os.path.join(d, "pat.nii"), "_gt")
    assert comp is not None and comp.endswith("pat_gt.nii.gz")
    assert _find_label_companion(os.path.join(d, "orphan_gt.nii.gz"),
                                 "_gt") is None
    # suffix disabled: everything densifies
    assert len(_load_image_paths(d, "")) == 3


def test_find_best_model_cli(trained_exper):
    r = _run([sys.executable, "find_best_model.py",
              "--exper_dir", trained_exper, "--use_synthetic_data",
              "--downsample_steps", "2"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "best per metric" in r.stdout


def test_bench_json_contract():
    r = _run([sys.executable, "bench.py"])
    assert r.returncode == 0, r.stderr[-3000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in data
    assert data["value"] > 0


@pytest.mark.parametrize("model", ["vae_combined", "acai_combined"])
def test_train_cli_secondary_families(model, tmp_path):
    """The secondary model families train end-to-end through the real
    CLI (not just the step-level family tests)."""
    out = str(tmp_path)
    r = _run([sys.executable, "train_brain_aesr.py",
              "-d", "MNIST3D", "-m", model,
              "--downsample_steps", "2", "-e", "1", "-b", "4",
              "--width", "32", "--latent_width", "16", "--depth", "8",
              "--latent", "8", "--lr", "0.001",
              "--image_mix_loss_func", "mse",
              "--epoch_threshold", "-1", "--use_synthetic_data",
              "--volume_preview_interval", "0",
              "-o", out, "-id", "fam"])
    assert r.returncode == 0, r.stderr[-3000:]
    exper = os.path.join(out, "fam")
    assert os.path.isfile(os.path.join(exper, "models", "last.models"))


def test_generate_hr_volumes_4d_metaimage_spacing(trained_exper, tmp_path):
    """4D .mha inputs: read_metaimage returns a (t, z, y, x) spacing, so
    the densified z-spacing lives at index -3 — dividing index 0 would
    shrink the TIME spacing and emit the volume with its original
    z-spacing (stretched (n+1)x in viewers)."""
    from superresolution_aniso_mri_tpu.data import make_toy_dataset
    from superresolution_aniso_mri_tpu.utils import write_metaimage
    from superresolution_aniso_mri_tpu.utils.nifti import read_nifti

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    vols = make_toy_dataset(2, 32, 7, seed=5)
    vol4d = np.stack([vols[0].image, vols[1].image])   # [t=2, z=7, y, x]
    write_metaimage(os.path.join(in_dir, "cine.mha"), vol4d,
                    spacing=np.array([1.0, 6.0, 1.0, 1.0]))  # (t,z,y,x)

    r = _run([sys.executable, "generate_hr_volumes.py",
              "--exper_dir", trained_exper, "--model_nbr", "0",
              "--data_input_dir", in_dir, "--output_dir", out_dir,
              "--num_interpolations", "1"])
    assert r.returncode == 0, r.stderr[-3000:]
    out_path = os.path.join(out_dir, "cine_ni01.nii.gz")
    arr, spacing, _ = read_nifti(out_path)
    assert arr.shape == (2, 13, 32, 32)
    # z halved (6mm -> 3mm), in-plane untouched
    np.testing.assert_allclose(spacing[-3], 3.0, rtol=1e-6)
    np.testing.assert_allclose(spacing[-2:], [1.0, 1.0], rtol=1e-6)
