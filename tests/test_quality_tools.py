"""Unit tests for tools/real_pipeline_quality.py helpers.

The end-to-end tool is exercised by hand (it trains for hours); these
pin the pure pieces: --reuse provenance overrides from the kept
experiment's settings.yaml and the training-timeout scaling.
"""
import argparse
import os

import numpy as np

import tools.real_pipeline_quality as rpq


def _ns(**kw):
    base = dict(downsample_steps=3, inplane=64, ex_loss_weight=0.001,
                lr_schedule=False, depth=24, latent=64, batch_size=16,
                model="ae_combined")
    base.update(kw)
    return argparse.Namespace(**base)


def test_reuse_overrides_take_settings_values():
    ns = _ns()
    kept = {"downsample_steps": 4, "width": 32, "ex_loss_weight1": 0.01,
            "use_lr_scheduler": True, "model": "ae", "depth": 32,
            "latent": 128, "batch_size": 8}
    msgs = rpq.apply_reuse_overrides(kept, ns)
    assert ns.downsample_steps == 4          # scoring tree suffix
    assert ns.inplane == 32                  # persisted as 'width'
    assert ns.ex_loss_weight == 0.01
    assert ns.lr_schedule is True
    assert ns.model == "ae"
    assert ns.depth == 32 and ns.latent == 128 and ns.batch_size == 8
    assert len(msgs) == 8


def test_reuse_overrides_noop_when_matching_or_absent():
    ns = _ns()
    # matching values → no override messages, args untouched
    kept = {"downsample_steps": 3, "width": 64, "ex_loss_weight1": 0.001,
            "use_lr_scheduler": False, "model": "ae_combined"}
    assert rpq.apply_reuse_overrides(kept, ns) == []
    assert ns.downsample_steps == 3 and ns.inplane == 64
    # absent/None keys are skipped entirely
    assert rpq.apply_reuse_overrides({}, ns) == []
    assert rpq.apply_reuse_overrides({"width": None}, ns) == []
    assert ns.inplane == 64


def test_select_score_checkpoint():
    import pytest
    sel = rpq.select_score_checkpoint
    # auto: EMA only when trained-with-EMA AND the file exists
    assert sel("auto", 0.999, True, 120) == "ema"
    assert sel("auto", 0.999, False, 120) == 120
    assert sel("auto", 0.0, True, 120) == 120   # stray ema.models ignored
    assert sel("auto", 0.0, False, "caisr") == "caisr"
    # sweep: forces the epoch even for EMA-trained runs (the
    # one-training-two-scorings comparison path)
    assert sel("sweep", 0.999, True, 117) == 117
    # ema: demands the averaged weights
    assert sel("ema", 0.999, True, 117) == "ema"
    with pytest.raises(SystemExit):
        sel("ema", 0.0, False, 117)


def test_make_extra_test_volumes():
    """Extra held-out fabrication: LR/HR pair with loader-matching
    preprocessing, deterministic per seed, disjoint from the training
    tree's 10_000+i seed range."""
    import numpy as np

    vols = rpq.make_extra_test_volumes(3, 2, 32, 13)
    assert len(vols) == 2
    for v in vols:
        assert v.image.shape == (13, 32, 32)
        assert v.image_hr.shape == (13, 32, 32)
        # loader-matching (0,100) rescale pins the range to [0, 1]
        assert v.image.min() == 0.0 and v.image.max() == 1.0
        # LR is the PSF-blurred HR, not a copy
        assert np.abs(v.image - v.image_hr).max() > 1e-3
        assert v.patient_id.startswith("EXTRA_")
    again = rpq.make_extra_test_volumes(3, 2, 32, 13)
    np.testing.assert_array_equal(vols[0].image, again[0].image)
    # different from the training tree's seed-10_000 fabrication
    from superresolution_aniso_mri_tpu.data.synthetic import (
        make_textured_rotated_volume,
    )
    tree0 = make_textured_rotated_volume(size=32, num_slices=13,
                                         seed=10_000).image
    assert np.abs(vols[0].image_hr
                  - (tree0 - tree0.min())
                  / max(tree0.max() - tree0.min(), 1e-9)).max() > 1e-3


def test_make_cardiac4d_volume():
    """4D cine phantom: deterministic, in-range, genuinely beating —
    the LV pool area shrinks from end-diastole to the middle frame."""
    import numpy as np

    from superresolution_aniso_mri_tpu.data.synthetic import (
        make_cardiac4d_volume,
    )

    v = make_cardiac4d_volume(size=32, num_slices=9, num_frames=5, seed=3)
    assert v.shape == (5, 9, 32, 32) and v.dtype == np.float32
    assert v.min() >= 0.0 and v.max() <= 1.0
    v2 = make_cardiac4d_volume(size=32, num_slices=9, num_frames=5, seed=3)
    np.testing.assert_array_equal(v, v2)
    # frames genuinely deform: mid-frame (systole) differs from frame 0
    assert np.abs(v[2] - v[0]).max() > 0.05
    # contraction: bright-pool voxel count shrinks at systole in the
    # mid-slice neighbourhood
    ed = (v[0, 3:6] > 0.75).sum()
    es = (v[2, 3:6] > 0.75).sum()
    assert es < ed


def test_make_textured_acdc_tree_loads(tmp_path):
    """Fabricated ACDC tree round-trips through the real loader with
    the split yaml honoured."""
    import os

    from superresolution_aniso_mri_tpu.data.datasets import (
        load_acdc_volumes,
    )

    root = str(tmp_path)
    rpq.make_textured_acdc_tree(root, n_patients=7, inplane=24,
                                num_slices=7, num_frames=2)
    os.environ["SR_DATA_ROOT"] = root
    try:
        test = load_acdc_volumes("test")
        train = load_acdc_volumes("training")
    finally:
        os.environ.pop("SR_DATA_ROOT", None)
    # 3 test patients x 2 frames, 2 train patients x 2 frames
    assert len(test) == 6 and len(train) == 4
    pids = {v.patient_id.split("_f")[0] for v in test}
    assert pids == {"patient005", "patient006", "patient007"}
    for v in test:
        assert v.image.shape == (7, 24, 24)
        assert 0.0 <= v.image.min() and v.image.max() <= 1.0


def test_make_extra_test_volumes_acdc():
    import numpy as np

    vols = rpq.make_extra_test_volumes_acdc(2, inplane=24, num_slices=7,
                                            num_frames=3)
    assert len(vols) == 6  # 2 phantoms x 3 frames
    for v in vols:
        assert v.image.shape == (7, 24, 24)
        assert v.patient_id.startswith("EXTRA_")
    # frames of one phantom differ (cine deformation survived the
    # loader-matching preprocessing)
    assert np.abs(vols[0].image - vols[1].image).max() > 1e-3


def test_cardiac_phantom_rician_noise():
    """noise_sigma: seeded-deterministic Rician magnitude noise — same
    seed reproduces, zero sigma is the legacy noiseless phantom, and
    the noisy volume stays non-negative (magnitude MRI)."""
    import numpy as np
    from superresolution_aniso_mri_tpu.data.synthetic import (
        make_cardiac4d_volume,
    )

    clean = make_cardiac4d_volume(size=16, num_slices=5, num_frames=2,
                                  seed=3)
    again = make_cardiac4d_volume(size=16, num_slices=5, num_frames=2,
                                  seed=3)
    np.testing.assert_array_equal(clean, again)
    noisy = make_cardiac4d_volume(size=16, num_slices=5, num_frames=2,
                                  seed=3, noise_sigma=0.03)
    noisy2 = make_cardiac4d_volume(size=16, num_slices=5, num_frames=2,
                                   seed=3, noise_sigma=0.03)
    np.testing.assert_array_equal(noisy, noisy2)
    assert not np.array_equal(noisy, clean)
    assert noisy.min() >= 0.0
    # Rician floor: background (clean == 0) acquires a positive mean
    bg = noisy[clean == 0]
    assert bg.size and bg.mean() > 0.01
    # noise magnitude is in the sigma ballpark, not wildly off
    assert 0.01 < float(np.abs(noisy - clean).mean()) < 0.1


def test_make_textured_dhcp_tree_layout_and_ingest(tmp_path):
    """The dHCP-shaped fabrication writes the neonatal layout the real
    loader expects (flat <id>_t2w[_<ds/2>mm].nii.gz + split yaml,
    config/data_config.py ConfigdHCP) and load_brain_volumes ingests it
    with the explicit deterministic split (last 3 test, 2 val)."""
    import os

    import numpy as np

    from superresolution_aniso_mri_tpu.data.datasets import (
        load_brain_volumes,
    )

    root = str(tmp_path)
    rpq.make_textured_dhcp_tree(root, ds=4, n_patients=7, inplane=24,
                                num_slices=13)
    d = os.path.join(root, "dHCP_cropped_256")
    assert os.path.isfile(os.path.join(d, "1000_t2w.nii.gz"))
    # dHCP LR suffix convention is ds/2 mm (0.5mm native voxels)
    assert os.path.isfile(os.path.join(d, "1000_t2w_2.0mm.nii.gz"))
    assert os.path.isfile(os.path.join(d, "train_test_split.yaml"))

    os.environ["SR_DATA_ROOT"] = root
    try:
        test = load_brain_volumes("dHCP", 4, split="test",
                                  include_hr_images=True)
        train = load_brain_volumes("dHCP", 4, split="training")
        val = load_brain_volumes("dHCP", 4, split="validation")
    finally:
        del os.environ["SR_DATA_ROOT"]
    assert [v.patient_id for v in test] == ["1004", "1005", "1006"]
    assert len(val) == 2 and len(train) == 2  # 7 - 3 test - 2 val
    for v in test:
        assert v.image.shape == (13, 24, 24)
        assert v.image_hr is not None and v.image_hr.shape == (13, 24, 24)
        # LR file is the thick-slice PSF output, not the HR copy
        assert np.abs(v.image - v.image_hr).max() > 1e-3


def test_run_child_timeout_clamped_below_epoll_limit(tmp_path):
    """A caller-computed multi-week budget must not crash
    subprocess.communicate (epoll's int-ms timeout overflows past
    ~24.8 days) — run_child clamps it and still runs the child."""
    import sys

    import tools._subproc as sp

    r = sp.run_child([sys.executable, "-c", "print('ok')"],
                     str(tmp_path), "clamp-test",
                     timeout=3_200_000, verbose=False)
    assert r.returncode == 0 and "ok" in r.stdout


def test_compute_train_budget_explicit_wins_over_cap():
    """An explicit --train_timeout_s is the user's hard wall-clock and
    must NOT be clamped by the 48h auto-budget cap; the cap applies to
    the auto-scaled value only."""
    ns = _ns(train_timeout_s=72 * 3600, epochs=300, inplane=256)
    assert rpq.compute_train_budget(ns, steps=10_000) == 72 * 3600
    # auto path: floor 2h, 4s/step base, capped at 48h
    ns = _ns(train_timeout_s=0, inplane=64, depth=24, latent=64)
    assert rpq.compute_train_budget(ns, steps=10) == 7200
    assert rpq.compute_train_budget(ns, steps=3600) == 3600 * 4
    ns_big = _ns(train_timeout_s=0, inplane=256, depth=24, latent=64)
    # 256^2 scales per-step 16x: 100k steps would be weeks -> capped
    assert rpq.compute_train_budget(ns_big, steps=100_000) == 48 * 3600


def test_n_patients_guard_covers_all_shapes(monkeypatch):
    """Every fabricated tree reserves 3 test + 2 val patients; fewer
    than 7 must fail fast for dHCP/OASIS too (it used to die minutes
    later inside the train child with an empty training split)."""
    import sys

    import pytest

    for shape in ("dHCP", "OASIS", "ACDC"):
        monkeypatch.setattr(sys, "argv", [
            "real_pipeline_quality.py", "--dataset_shape", shape,
            "--n_patients", "5"])
        with pytest.raises(SystemExit, match=">= 7 patients"):
            rpq.main()


def test_step_watchdog_armed_by_default():
    """The production-benchmark tool must survive a wedged tunneled
    device by default (a real 450-epoch run hung forever on device
    acquisition with the old default=0): --step_timeout_s defaults
    armed, which both threads --step_timeout_s/--auto_resume into the
    train child and enables the exit-75 stall-restart loop; 0 still
    disarms explicitly."""
    p = rpq.build_parser()
    args = p.parse_args([])
    assert args.step_timeout_s > 0
    # the pre-first-beat window in the train CLI is max(step, 600) —
    # keep the default below that so compilation is never the thing
    # the steady-state window measures
    assert args.step_timeout_s <= 600
    assert p.parse_args(["--step_timeout_s", "0"]).step_timeout_s == 0


def test_run_child_budget_caps_across_stall_restarts(tmp_path):
    """The timeout is an OVERALL wall-clock budget: a repeatedly
    wedging child (exit 75 each attempt) must exhaust it after a
    couple of attempts, not get the full budget per attempt (round-3
    advisor finding: 11 attempts x full budget = ~11x overrun)."""
    import sys
    import time

    import pytest

    import tools._subproc as sp

    t0 = time.time()
    with pytest.raises(SystemExit, match="budget exhausted"):
        sp.run_child(
            [sys.executable, "-c",
             "import sys, time; time.sleep(1.0); sys.exit(75)"],
            str(tmp_path), "budget-test", timeout=4.0,
            stall_restarts=10, min_stall_uptime_s=0.5, verbose=False)
    # 1 attempt (~1s) + 5s inter-restart sleep exceeds the 4s budget
    # before a second attempt launches; without the fix this loop would
    # run all 11 attempts (~66s)
    assert time.time() - t0 < 30


def test_extend_requires_reuse():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/real_pipeline_quality.py", "--extend"],
        capture_output=True, text=True, cwd=rpq.REPO)
    assert r.returncode != 0
    assert "--extend requires --reuse" in (r.stderr + r.stdout)


def test_reuse_overrides_loss_mode_and_batchnorm():
    """--extend resumes the kept checkpoint: the training child must
    inherit the recorded loss mode (two settings keys) and the BN flag
    (parameter-tree shape) or the resumed run silently diverges."""
    ns = _ns(loss_mode="mse", use_batchnorm=None)
    msgs = rpq.apply_reuse_overrides(
        {"image_mix_loss_func": "perceptual", "use_batchnorm": True}, ns)
    assert ns.loss_mode == "perceptual" and ns.use_batchnorm == 1
    assert "loss_mode=perceptual" in msgs and "use_batchnorm=1" in msgs

    ns = _ns(loss_mode="perceptual", use_batchnorm=1)
    rpq.apply_reuse_overrides(
        {"image_mix_loss_func": "mse", "use_ssim_loss": True,
         "use_batchnorm": False}, ns)
    assert ns.loss_mode == "mse+ssim" and ns.use_batchnorm == 0

    # matching values -> no messages
    ns = _ns(loss_mode="mse", use_batchnorm=1)
    assert rpq.apply_reuse_overrides(
        {"image_mix_loss_func": "mse", "use_batchnorm": True}, ns) == []


def test_brain_phantom_rician_calibration(tmp_path):
    """--phantom_noise now applies to the brain shapes too (VERDICT r3
    weak #4): HR acquisitions carry seeded Rician noise, the LR file is
    the PSF of the NOISY HR, and extra held-out volumes match."""
    from superresolution_aniso_mri_tpu.utils.nifti import read_nifti

    root = str(tmp_path / "d")
    rpq.make_textured_oasis_tree(root, ds=3, n_patients=1, inplane=24,
                                 num_slices=13, noise_sigma=0.05)
    root0 = str(tmp_path / "d0")
    rpq.make_textured_oasis_tree(root0, ds=3, n_patients=1, inplane=24,
                                 num_slices=13, noise_sigma=0.0)
    p = "OASIS/nifti/OAS1_0000_MR1/OAS1_0000_MR1_t88_gfc"
    hr_n, _, _ = read_nifti(os.path.join(root, p + ".nii.gz"))
    hr_0, _, _ = read_nifti(os.path.join(root0, p + ".nii.gz"))
    # same anatomy, noise on top
    d = hr_n - hr_0
    assert 0.01 < d.std() < 0.2
    # LR derives from the NOISY HR (PSF-averaged, so smaller residual)
    lr_n, _, _ = read_nifti(os.path.join(root, p + "_3mm.nii.gz"))
    lr_0, _, _ = read_nifti(os.path.join(root0, p + "_3mm.nii.gz"))
    assert 0.0 < (lr_n - lr_0).std() < d.std()
    # deterministic: refabricating reproduces bit-identical volumes
    root2 = str(tmp_path / "d2")
    rpq.make_textured_oasis_tree(root2, ds=3, n_patients=1, inplane=24,
                                 num_slices=13, noise_sigma=0.05)
    hr_n2, _, _ = read_nifti(os.path.join(
        root2, p + ".nii.gz"))
    np.testing.assert_array_equal(hr_n, hr_n2)

    # extra held-out volumes honor the same sigma
    ex = rpq.make_extra_test_volumes(3, 1, 24, 13, noise_sigma=0.05)
    ex0 = rpq.make_extra_test_volumes(3, 1, 24, 13, noise_sigma=0.0)
    assert (ex[0].image_hr - ex0[0].image_hr).std() > 0.005

    # dHCP tree too
    rpq.make_textured_dhcp_tree(root, ds=4, n_patients=7, inplane=24,
                                num_slices=13, noise_sigma=0.05)
    hd, _, _ = read_nifti(os.path.join(root, "dHCP_cropped_256",
                                       "1000_t2w.nii.gz"))
    rpq.make_textured_dhcp_tree(root0, ds=4, n_patients=7, inplane=24,
                                num_slices=13, noise_sigma=0.0)
    hd0, _, _ = read_nifti(os.path.join(root0, "dHCP_cropped_256",
                                        "1000_t2w.nii.gz"))
    assert (hd - hd0).std() > 0.01


def test_score_noise_requires_reuse_without_extend():
    """--score_noise re-scores a kept model; it must fail fast (before
    any fabrication) without --reuse, and with --extend."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/real_pipeline_quality.py",
         "--score_noise", "0.05"],
        capture_output=True, text=True, cwd=rpq.REPO, timeout=120)
    assert r.returncode != 0
    assert "--score_noise requires --reuse" in (r.stderr + r.stdout)
    assert "[fabricate]" not in r.stdout


def test_aug_and_clip_flags_reach_train_child_cmd():
    """--aug_noise/--aug_blur/--max_grad_norm pass through to the train
    child command (the r5 noise-aware-training levers)."""
    ns = _ns(aug_noise=True, aug_blur=True, max_grad_norm=1.0)
    flags = []
    flags += ["--aug_noise"] if ns.aug_noise else []
    flags += ["--aug_blur"] if ns.aug_blur else []
    flags += (["--max_grad_norm", str(ns.max_grad_norm)]
              if ns.max_grad_norm else [])
    # the literal construction in main() mirrors this; pin the parser
    # defaults so a silent rename breaks here
    p = rpq.build_parser()
    d = vars(p.parse_args([]))
    assert d["aug_noise"] is False and d["aug_blur"] is False
    assert d["max_grad_norm"] == 0.0 and d["score_noise"] is None
