#!/usr/bin/env python
"""Production-pipeline quality benchmark on realistic-shaped data.

Where tools/quality_check.py measures training quality through direct
Trainer calls on phantoms, THIS tool proves the same result through the
full production path a user actually runs — the OASIS ingest layout,
the real training CLI, the epoch sweep and the evaluation driver:

  1. fabricate an OASIS-shaped tree (root/OASIS/nifti/OAS1_xxxx_MR1/
     *_t88_gfc[_<ds>mm].nii.gz) of TEXTURED rotated-anatomy volumes —
     band-limited fine texture is what through-plane interpolation
     blurs away, so it separates methods on VIF like real MRI does
     (reference layout: datasets/common_brains.py:160-226,
     datasets/OASIS/dataset.py; LR simulation = the reference's
     thick-slice PSF, common_brains.py:37-44);
  2. train ae_combined through train_brain_aesr.py (the child process
     uses the default JAX platform — the TPU when attached; this
     parent pins itself to CPU so exactly one process touches the chip);
  3. sweep the numbered checkpoints with find_best_model.py --batched;
  4. score the best-on-val model vs linear/bspline/lanczos on the
     HELD-OUT TEST split with evaluate.create_hr_images and print the
     side-by-side (the reference's notebook protocol,
     notebooks/evaluate_brain.ipynb cells 6/9).

  python tools/real_pipeline_quality.py --epochs 300 \
      --loss_mode perceptual --json_out docs/quality_real_r3.jsonl

`--dataset_shape ACDC` swaps every stage for the CARDIAC production
pipeline (the reference's other headline table, BASELINE.md Sunnybrook
rows): beating 4D cine phantoms in the ACDC tree layout
(all_cardiac_phases/patientXXX/patientXXX_4d.nii.gz + split yaml),
training through train_cardiac_aesr.py (fixed alpha 0.5, ds=2,
per-frame pair index), scoring per (patient, frame) volume.
"""
import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOSS_MODES = ("mse", "perceptual", "perceptual_enc", "mse+ssim")


def loss_mode_flags(mode: str):
    """--loss_mode → training-CLI flags (the CLI's post-parse defaulting
    mirrors the reference: ae_combined forces perceptual unless
    image_mix_loss_func is given, kwatsch/arguments.py:67-76).
    'perceptual_enc' = the encoder-backbone perceptual loss
    (ops/perceptual.py; weights/perceptual_enc.npz)."""
    if mode == "mse":
        return ["--image_mix_loss_func", "mse"]
    if mode == "perceptual":
        return ["--image_mix_loss_func", "perceptual"]
    if mode == "perceptual_enc":
        return ["--image_mix_loss_func", "perceptual_enc"]
    if mode == "mse+ssim":
        return ["--image_mix_loss_func", "mse", "--use_ssim_loss"]
    raise ValueError(f"unknown loss_mode {mode!r}")


def make_textured_oasis_tree(data_root: str, ds: int, n_patients: int,
                             inplane: int, num_slices: int,
                             anatomy: str = "rotate",
                             noise_sigma: float = 0.0) -> None:
    from superresolution_aniso_mri_tpu.data import simulate_thick_slices
    from superresolution_aniso_mri_tpu.data.synthetic import (
        add_rician_noise, make_anatomy3d_volume,
        make_textured_rotated_volume,
    )
    from superresolution_aniso_mri_tpu.utils import write_nifti

    for i in range(n_patients):
        if anatomy == "anatomy3d":
            # genuinely 3-D structures whose edges drift/vanish across
            # slices — the regime where the reference's learned synthesis
            # beats linear blending on real MRI (see make_anatomy3d_volume)
            hr = make_anatomy3d_volume(size=inplane, num_slices=num_slices,
                                       seed=10_000 + i).image
        else:
            hr = make_textured_rotated_volume(
                size=inplane, num_slices=num_slices, seed=10_000 + i).image
        # Rician-calibrate like the cardiac benchmark (noise on the HR
        # acquisition; the thick-slice PSF below then averages it the
        # way a real LR scan does) — noise-free smoothness flatters
        # conventional interpolators (VERDICT r3 weak #4)
        hr = add_rician_noise(hr, noise_sigma, seed=20_000 + i)
        pdir = os.path.join(data_root, "OASIS", "nifti",
                            f"OAS1_{i:04d}_MR1")
        os.makedirs(pdir, exist_ok=True)
        write_nifti(os.path.join(pdir, f"OAS1_{i:04d}_MR1_t88_gfc.nii.gz"),
                    hr, spacing=np.array([1.0, 1.0, 1.0]))
        write_nifti(
            os.path.join(pdir, f"OAS1_{i:04d}_MR1_t88_gfc_{ds}mm.nii.gz"),
            simulate_thick_slices(hr, float(ds)),
            spacing=np.array([1.0, 1.0, 1.0]))


def make_textured_dhcp_tree(data_root: str, ds: int, n_patients: int,
                            inplane: int, num_slices: int,
                            anatomy: str = "rotate",
                            noise_sigma: float = 0.0) -> None:
    """dHCP-shaped tree (root/dHCP_cropped_256/<id>_t2w[_<ds/2>mm].nii.gz
    + train_test_split.yaml) of textured phantoms at the neonatal
    0.5 mm isotropic grid — the reference's HEADLINE benchmark config
    (README.md:31, notebooks/evaluate_brain.ipynb cell 6). LR files use
    the dHCP suffix convention ds/2 mm (datasets/dHCP/dataset.py:14-36;
    config.lr_file_suffix). Split: last 3 patients test, 2 val, rest
    train (explicit yaml so the scored test set is deterministic)."""
    import yaml

    from superresolution_aniso_mri_tpu.data import simulate_thick_slices
    from superresolution_aniso_mri_tpu.data.synthetic import (
        add_rician_noise, make_anatomy3d_volume,
        make_textured_rotated_volume,
    )
    from superresolution_aniso_mri_tpu.utils import write_nifti

    d = os.path.join(data_root, "dHCP_cropped_256")
    os.makedirs(d, exist_ok=True)
    pids = []
    for i in range(n_patients):
        pid = f"{1000 + i}"
        pids.append(pid)
        if anatomy == "anatomy3d":
            hr = make_anatomy3d_volume(size=inplane, num_slices=num_slices,
                                       seed=10_000 + i).image
        else:
            hr = make_textured_rotated_volume(
                size=inplane, num_slices=num_slices, seed=10_000 + i).image
        hr = add_rician_noise(hr, noise_sigma, seed=20_000 + i)
        write_nifti(os.path.join(d, f"{pid}_t2w.nii.gz"), hr,
                    spacing=np.array([0.5, 0.5, 0.5]))
        write_nifti(os.path.join(d, f"{pid}_t2w_{ds / 2:.1f}mm.nii.gz"),
                    simulate_thick_slices(hr, float(ds)),
                    spacing=np.array([0.5, 0.5, 0.5]))
    split = {"training": pids[:-5], "validation": pids[-5:-3],
             "test": pids[-3:]}
    with open(os.path.join(d, "train_test_split.yaml"), "w") as f:
        yaml.safe_dump(split, f)


def make_textured_acdc_tree(data_root: str, n_patients: int,
                            inplane: int, num_slices: int,
                            num_frames: int,
                            noise_sigma: float = 0.0) -> None:
    """ACDC-shaped 4D cine tree (root/ACDC/all_cardiac_phases/
    patientXXX/patientXXX_4d.nii.gz + the SR split yaml) of beating
    cardiac phantoms (data.synthetic.make_cardiac4d_volume).

    Written at the loader's resample target (1.4 mm in-plane,
    config/data_config.py) so per-frame preprocessing is shape-
    preserving; z-spacing 5 mm like the reference's test patients
    (datasets/ACDC/data.py:21-23). Split: last 3 patients test, 2 val,
    rest train (the reference splits by slice thickness; a fabricated
    tree has no thickness axis, so an explicit yaml stands in)."""
    import yaml

    from superresolution_aniso_mri_tpu.data.synthetic import (
        make_cardiac4d_volume,
    )
    from superresolution_aniso_mri_tpu.utils import write_nifti

    pids = []
    for i in range(1, n_patients + 1):
        pid = f"patient{i:03d}"
        pids.append(pid)
        pdir = os.path.join(data_root, "ACDC", "all_cardiac_phases", pid)
        os.makedirs(pdir, exist_ok=True)
        vol4d = make_cardiac4d_volume(size=inplane, num_slices=num_slices,
                                      num_frames=num_frames,
                                      seed=10_000 + i,
                                      noise_sigma=noise_sigma)
        # raw-MRI-like intensity scale; the loader's 1-99 percentile
        # rescale (load_acdc_volumes) normalizes it back
        write_nifti(os.path.join(pdir, f"{pid}_4d.nii.gz"),
                    (vol4d * 400.0).astype(np.float32),
                    spacing=np.array([5.0, 1.4, 1.4]))
    split = {"training": pids[:-5], "validation": pids[-5:-3],
             "test": pids[-3:]}
    with open(os.path.join(data_root, "ACDC",
                           "train_val_test_split_sr.yaml"), "w") as f:
        yaml.safe_dump(split, f)


sys.path.insert(0, os.path.join(REPO, "tools"))  # also under `import tools.*`
from _subproc import run_child as _run  # noqa: E402  (shared helper)


def compute_train_budget(args, steps: int) -> float:
    """Wall-clock budget for the training child.

    An explicit ``--train_timeout_s`` is the user's hard wall and wins
    unmodified. Otherwise scale from steps: long CPU benchmark runs
    legitimately exceed run_child's 2 h default (300 ep / 12 patients
    ≈ 85 min single-core). The 4 s/step base was calibrated at
    inplane=64 / depth=24 / latent=64 (~0.94 s/step measured, 4x
    headroom); larger configs cost more PER STEP, so scale with the
    dominant factors. The 48 h cap applies to the AUTO budget only:
    big configs (256² x many steps) multiply out to weeks, which is
    never a real training time on the chip (and used to overflow
    epoll's int-ms timeout inside subprocess before _subproc clamped
    it).
    """
    if args.train_timeout_s > 0:
        return args.train_timeout_s
    per_step = (4.0 * (args.inplane / 64.0) ** 2
                * max(1.0, args.depth / 24.0)
                * max(1.0, args.latent / 64.0))
    return min(max(7200, int(steps * per_step)), 48 * 3600)


def apply_reuse_overrides(kept: dict, args) -> list:
    """--reuse provenance: take flags that the kept experiment's
    settings.yaml records authoritatively (training config) from it,
    overriding this invocation's values. Returns a human-readable list
    of the overrides applied (empty = flags already matched)."""
    overrides = []
    for flag, key, cast in (
            ("dataset_shape", "dataset", str),
            ("downsample_steps", "downsample_steps", int),
            ("inplane", "width", int),
            ("latent_width", "latent_width", int),
            ("ex_loss_weight", "ex_loss_weight1", float),
            ("lr_schedule", "use_lr_scheduler", bool),
            ("lr_warmup_steps", "lr_warmup_steps", int),
            ("depth", "depth", int),
            ("latent", "latent", int),
            ("batch_size", "batch_size", int),
            ("ema_decay", "ema_decay", float),
            ("train_latent_interp", "train_latent_interp", str),
            ("compute_dtype", "compute_dtype", str),
            ("aug_noise", "aug_noise", bool),
            ("aug_blur", "aug_blur", bool),
            ("max_grad_norm", "max_grad_norm", float),
            ("model", "model", str)):
        if kept.get(key) is None:
            continue
        val = cast(kept[key])
        if val != getattr(args, flag):
            overrides.append(f"{flag}={val}")
            setattr(args, flag, val)
    # loss_mode is recorded as two settings keys; use_batchnorm changes
    # the parameter tree shape, so a resumed (--extend) training child
    # MUST inherit both or checkpoint load / loss selection diverge
    mix = kept.get("image_mix_loss_func")
    if mix is not None:
        mode = (mix if mix in ("perceptual", "perceptual_enc")
                else "mse+ssim" if kept.get("use_ssim_loss") else "mse")
        if mode != args.loss_mode:
            overrides.append(f"loss_mode={mode}")
            args.loss_mode = mode
    if kept.get("use_batchnorm") is not None:
        bn = int(bool(kept["use_batchnorm"]))
        if bn != args.use_batchnorm:
            overrides.append(f"use_batchnorm={bn}")
            args.use_batchnorm = bn
    return overrides


def select_score_checkpoint(score: str, ema_decay: float,
                            have_ema: bool, sweep_nbr):
    """--score resolution → checkpoint identifier to evaluate.

    'auto' scores the EMA weights only when the experiment trained with
    EMA (decay>0 recorded) AND the rolling ema.models exists; 'sweep'
    forces the sweep-selected epoch even for EMA-trained runs; 'ema'
    demands the averaged weights and errors when they don't exist."""
    if score == "ema":
        if not have_ema:
            raise SystemExit("--score ema: no models/ema.models in the "
                             "experiment (train with --ema_decay)")
        return "ema"
    if score == "auto" and ema_decay > 0 and have_ema:
        return "ema"
    return sweep_nbr


def make_extra_test_volumes(ds: int, n: int, inplane: int,
                            num_slices: int, anatomy: str = "rotate",
                            noise_sigma: float = 0.0):
    """N extra held-out Volumes (LR image + HR ground truth) fabricated
    at seeds 50_000+i — disjoint from the 10_000+i tree the experiment
    trained/validated/tested on — with the SAME preprocessing the
    dataset loader applies (thick-slice PSF, (0,100) rescale)."""
    from superresolution_aniso_mri_tpu.data import (Volume,
                                                    simulate_thick_slices)
    from superresolution_aniso_mri_tpu.data.synthetic import (
        add_rician_noise, make_anatomy3d_volume,
        make_textured_rotated_volume,
    )
    from superresolution_aniso_mri_tpu.data.volume import (
        rescale_intensities,
    )

    vols = []
    for i in range(n):
        if anatomy == "anatomy3d":
            hr = make_anatomy3d_volume(size=inplane, num_slices=num_slices,
                                       seed=50_000 + i).image
        else:
            hr = make_textured_rotated_volume(
                size=inplane, num_slices=num_slices, seed=50_000 + i).image
        hr = add_rician_noise(hr, noise_sigma, seed=60_000 + i)
        lr = simulate_thick_slices(hr, float(ds))
        vols.append(Volume(
            image=rescale_intensities(lr, percs=(0, 100)),
            spacing=np.array([1.0, 1.0, 1.0]),
            patient_id=f"EXTRA_{i:04d}",
            image_hr=rescale_intensities(hr, percs=(0, 100))))
    return vols


def make_extra_test_volumes_acdc(n: int, inplane: int, num_slices: int,
                                 num_frames: int,
                                 noise_sigma: float = 0.0):
    """Cardiac variant of make_extra_test_volumes: N fresh 4D cine
    phantoms (seeds 50_000+i, disjoint from the 10_000+i tree), split
    into per-frame 3-D Volumes with the SAME per-frame preprocessing
    load_acdc_volumes applies (identity in-plane resample + its 0.25 px
    blur, 1-99 percentile rescale)."""
    from superresolution_aniso_mri_tpu.data import Volume
    from superresolution_aniso_mri_tpu.data.synthetic import (
        make_cardiac4d_volume,
    )
    from superresolution_aniso_mri_tpu.data.volume import (
        apply_2d_zoom_4d, rescale_intensities,
    )

    sp = np.array([1.4, 1.4], np.float64)
    vols = []
    for i in range(n):
        arr = make_cardiac4d_volume(size=inplane, num_slices=num_slices,
                                    num_frames=num_frames,
                                    seed=50_000 + i,
                                    noise_sigma=noise_sigma) * 400.0
        arr = apply_2d_zoom_4d(arr, sp, sp)
        for t in range(arr.shape[0]):
            vols.append(Volume(
                image=rescale_intensities(arr[t], percs=(1, 99)),
                spacing=np.array([5.0, 1.4, 1.4]),
                patient_id=f"EXTRA_{i:04d}_f{t:02d}",
                frame_id=t, num_frames=num_frames))
    return vols


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--sweep_last", type=int, default=30,
                   help="numbered checkpoints kept for the epoch sweep")
    p.add_argument("--dataset_shape", type=str, default="OASIS",
                   choices=["OASIS", "ACDC", "dHCP"],
                   help="which production pipeline to benchmark: "
                        "'OASIS' = brain thick-slice (synthetic-LR "
                        "files, train_brain_aesr.py, per-sample alphas),"
                        " 'ACDC' = cardiac 4D cine (patientXXX_4d "
                        "NIfTIs, train_cardiac_aesr.py, fixed alpha "
                        "0.5, ds=2 — the reference's other headline "
                        "table, BASELINE.md Sunnybrook rows), 'dHCP' = "
                        "neonatal brain at the reference's HEADLINE "
                        "config (ds=4, flat <id>_t2w_<mm> layout + "
                        "split yaml, BASELINE.md dHCP rows)")
    p.add_argument("--num_frames", type=int, default=6,
                   help="cine frames per fabricated 4D patient "
                        "(ACDC shape only; real ACDC has ~25-35, 6 "
                        "keeps the benchmark affordable while still "
                        "exercising the per-frame pipeline)")
    p.add_argument("--downsample_steps", type=int, default=None,
                   help="default 3 for OASIS shape; ACDC is fixed at "
                        "the reference's 2 (in-between slices exist "
                        "only at gap 2, datasets/ACDC/"
                        "data4d_simple.py:253-262)")
    p.add_argument("--inplane", type=int, default=64)
    p.add_argument("--num_slices", type=int, default=37)
    p.add_argument("--n_patients", type=int, default=24)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.002,
                   help="training LR (0.002 = the benchmark's "
                        "calibrated default; the no-BN ablation "
                        "saturates the sigmoid head at this LR on the "
                        "cardiac data even with --lr_warmup_steps — "
                        "docs/STATUS.md session 8)")
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--latent", type=int, default=64,
                   help="latent channels (reference OASIS recipe: 128, "
                        "README.md:46; 64 keeps CPU benchmark runs "
                        "affordable)")
    p.add_argument("--latent_width", type=int, default=0,
                   help="latent spatial size (0 = inplane//4, the "
                        "reference's OASIS ratio 64->16, README.md:46). "
                        "Halving the spatial compression (e.g. 32 at "
                        "inplane=64) raises the AE reconstruction "
                        "ceiling that bounds production thick-slice "
                        "quality (docs/STATUS.md round-3 diagnosis)")
    p.add_argument("--n_res_block", type=int, default=None,
                   help="residual blocks at the latent bottleneck (the "
                        "reference's ResBlock capacity knob — raises "
                        "the AE reconstruction ceiling without changing "
                        "the spatial compression)")
    p.add_argument("--model", type=str, default="ae_combined",
                   choices=["ae_combined", "ae", "acai_combined", "acai",
                            "vae", "vae_combined",
                            "alpha_combined", "alpha_end_to_end"],
                   help="trainer family: the reference's dHCP tables "
                        "show plain 'ae' (no synthesis loss) beating "
                        "ae_combined on SSIM at some factors "
                        "(BASELINE.md). The secondary families "
                        "(acai/vae/alpha) run the same full pipeline "
                        "for production-quality rows (VERDICT r4 #3)")
    p.add_argument("--loss_mode", type=str, default="perceptual",
                   choices=LOSS_MODES)
    p.add_argument("--anatomy", type=str, default="rotate",
                   choices=["rotate", "anatomy3d"],
                   help="fabricated-volume family: 'rotate' = textured "
                        "rotating base (in-plane motion only), "
                        "'anatomy3d' = drifting 3-D ellipsoid anatomy "
                        "(closer to real MRI through-plane statistics)")
    p.add_argument("--phantom_noise", type=float, default=0.0,
                   help="Rician noise sigma for the fabricated phantoms "
                        "(all three shapes; applied to the HR "
                        "acquisition before the thick-slice PSF). 0 = "
                        "the legacy noiseless benchmark, whose "
                        "conventional-interpolator ordering "
                        "(bspline>lanczos>linear SSIM) CONTRADICTS the "
                        "reference's real-data tables; 0.03 = the "
                        "cardiac-calibrated setting that reproduces the "
                        "reference's real-data ordering on all three "
                        "metrics (see data/synthetic"
                        ".make_cardiac4d_volume / add_rician_noise)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="with --reuse: score THIS checkpoint (epoch "
                        "number / 'caisr' / 'ema') and skip the epoch "
                        "re-sweep entirely — e.g. rescore the "
                        "already-swept epoch at a different "
                        "--score_noise/--tta without paying the sweep "
                        "again")
    p.add_argument("--score_noise", type=float, default=None,
                   help="with --reuse (no --extend): score the kept "
                        "model against a FRESH fabrication at this "
                        "Rician sigma instead of the kept tree's "
                        "phantom_noise — same anatomy seeds, different "
                        "noise level. Drives the noise-sensitivity "
                        "curve (margin vs sigma) and the train/serve "
                        "sigma-mismatch robustness row without "
                        "retraining")
    p.add_argument("--aug_noise", action="store_true",
                   help="pass --aug_noise to the train child: additive-"
                        "gaussian noise augmentation (sigma ~ U(0, "
                        "0.05)) so the model learns to synthesize "
                        "through noisy GT instead of reproducing it — "
                        "the noise-aware-training lever for "
                        "--phantom_noise > 0 benchmarks")
    p.add_argument("--aug_blur", action="store_true",
                   help="pass --aug_blur to the train child (light "
                        "random 3x3 binomial blur, p=1/2)")
    p.add_argument("--max_grad_norm", type=float, default=0.0,
                   help="global-norm gradient clipping in the train "
                        "child (0 = off). Required in practice with "
                        "--aug_noise at bn=0: the round-5 pilot showed "
                        "noise-augmented gradients trigger the "
                        "sigmoid-collapse divergence (epoch-91 "
                        "collapse, docs/STATUS.md round 5)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="training compute dtype passed to the train "
                        "child (bfloat16 = mixed precision: bf16 "
                        "activations + LPIPS features, f32 params/"
                        "BN/loss accumulation) — use to benchmark the "
                        "quality cost of the faster path")
    p.add_argument("--use_batchnorm", type=int, default=None,
                   choices=[0, 1],
                   help="override the CLI's architecture default "
                        "(reference hardcodes BN on; 0 = ablation)")
    p.add_argument("--ex_loss_weight", type=float, default=0.001,
                   help="synthesis-loss mix weight (the reference's "
                        "OASIS recipe uses 0.001, README.md:46 — "
                        "heavier weights steal capacity from the AE "
                        "reconstruction that bounds production quality)")
    p.add_argument("--latent_interp", type=str, default="linear",
                   choices=["linear", "cubic", "lanczos3", "fitted"],
                   help="latent z-interpolation for the model's scoring "
                        "pass: 'cubic' = 4-tap Catmull-Rom over "
                        "neighbouring slice latents (inference-side "
                        "lever like --tta, no retraining); 'fitted' = "
                        "learn the tap table on the val split "
                        "(fit_latent_taps.py runs automatically: once "
                        "before the sweep, refit on the selected "
                        "checkpoint before scoring)")
    p.add_argument("--train_latent_interp", type=str, default="linear",
                   choices=["linear", "cubic", "lanczos3"],
                   help="latent z-mixing for the TRAINING synthesis "
                        "loss (--train_latent_interp of the train CLI): "
                        "'cubic'/'lanczos3' train through the same "
                        "4-/6-tap spline the matching scoring pass "
                        "decodes")
    p.add_argument("--tta", type=str, default=None,
                   choices=["flips", "dihedral"],
                   help="test-time augmentation for the model's scoring "
                        "pass (averaged in-plane symmetries; inference-"
                        "side quality lever, no retraining)")
    p.add_argument("--lr_schedule", action="store_true",
                   help="cosine-anneal the LR over the whole run "
                        "(--use_lr_scheduler with lr_iter_max = "
                        "epochs x steps-per-epoch upper bound)")
    p.add_argument("--lr_warmup_steps", type=int, default=0,
                   help="linear LR warmup steps for the training child "
                        "(rescues --use_batchnorm 0 configs whose "
                        "sigmoid head otherwise collapses to exact-zero "
                        "gradients at the full 0.002 LR — measured on "
                        "the cardiac pipeline, docs/STATUS.md)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="train with EMA (Polyak-averaged) weights and "
                        "score the rolling ema.models checkpoint "
                        "instead of the sweep-selected epoch (typical "
                        "0.999; 0 = off)")
    p.add_argument("--score", type=str, default="auto",
                   choices=("auto", "sweep", "ema"),
                   help="which checkpoint to score: 'auto' = the EMA "
                        "weights when the experiment trained with "
                        "--ema_decay, else the sweep-selected epoch; "
                        "'sweep'/'ema' force one — e.g. --reuse an "
                        "EMA-trained run with --score sweep to compare "
                        "both from a single training")
    p.add_argument("--step_timeout_s", type=float, default=300,
                   help="per-step watchdog for the training child (the "
                        "tunneled TPU backend can wedge forever, "
                        "utils/watchdog.py): the child exits 75 on a "
                        "stall and is restarted with --auto_resume from "
                        "the rolling checkpoint, up to 10 times. ON by "
                        "default (300 s steady-state; the pre-first-"
                        "beat window stays >= 600 s for compilation) — "
                        "a benchmark run must survive a device wedge, "
                        "not hang on it; 0 disarms")
    p.add_argument("--train_timeout_s", type=float, default=0,
                   help="hard wall-clock budget for the training child "
                        "(0 = auto: 4 s/step at the inplane=64 default, "
                        "scaled by (inplane/64)^2 and model width)")
    p.add_argument("--extra_test_volumes", type=int, default=0,
                   help="additionally score on N freshly fabricated "
                        "held-out volumes (seeds disjoint from the "
                        "whole training tree) — the 3-volume dataset "
                        "test split alone puts ~+-0.003 SSIM of noise "
                        "on the model-vs-conventional verdict")
    p.add_argument("--json_out", type=str, default=None)
    p.add_argument("--keep", action="store_true")
    p.add_argument("--reuse", type=str, default=None,
                   help="path to a kept work dir from a previous --keep "
                        "run (contains data/ + exper/rpq): skip "
                        "fabrication and training, re-run the sweep and "
                        "scoring only — e.g. to score the same trained "
                        "model with --tta or a different checkpoint")
    p.add_argument("--extend", action="store_true",
                   help="with --reuse: CONTINUE training the kept "
                        "experiment to this invocation's --epochs "
                        "(auto-resumes from the rolling checkpoint, "
                        "keeping the kept run's recorded config), then "
                        "sweep+score as usual — e.g. grow a "
                        "budget-truncated 120-epoch run to 450")
    return p


def main():
    args = build_parser().parse_args()

    if args.extend and not args.reuse:
        raise SystemExit("--extend requires --reuse (it continues a "
                         "kept experiment's training)")
    if args.score_noise is not None and (not args.reuse or args.extend):
        raise SystemExit("--score_noise requires --reuse without "
                         "--extend (it re-scores a kept model, never "
                         "retrains)")
    if args.downsample_steps is None:
        # per-shape reference defaults: ACDC trains/evaluates at gap 2,
        # dHCP's headline is 4x (2.0mm -> 0.5mm, README.md:31), OASIS
        # keeps the tool's established 3mm benchmark setting
        args.downsample_steps = {"ACDC": 2, "dHCP": 4}.get(
            args.dataset_shape, 3)

    # the parent never touches the TPU — fabrication is numpy/scipy and
    # the final scoring runs on CPU; only the child CLIs use the chip
    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.reuse:
        work = os.path.expanduser(args.reuse)
        data_root = os.path.join(work, "data")
        exper_root = os.path.join(work, "exper")
        if not os.path.isdir(os.path.join(exper_root, "rpq", "models")):
            raise SystemExit(f"--reuse {work}: no exper/rpq/models — not "
                             f"a kept real_pipeline_quality work dir")
        args.keep = True  # never delete a user-provided tree
        # The kept settings.yaml records the true training configuration;
        # flags that affect scoring (downsample_steps must match the
        # fabricated '*_{ds}mm' tree) or the JSONL provenance are taken
        # from it rather than trusting this invocation's defaults.
        spath = os.path.join(exper_root, "rpq", "settings.yaml")
        if os.path.exists(spath):
            import yaml
            with open(spath) as f:
                kept = yaml.safe_load(f) or {}
            overrides = apply_reuse_overrides(kept, args)
            if overrides:
                print("[reuse] from kept settings.yaml: "
                      + " ".join(overrides), flush=True)
        # fabrication provenance (phantom_noise/anatomy/counts) is a
        # DATA property settings.yaml can't know — without it a reused
        # noise-calibrated tree would fabricate noiseless extra held-out
        # volumes and record phantom_noise=0.0 in the JSONL row
        fab_path = os.path.join(work, "fabrication.json")
        if os.path.exists(fab_path):
            with open(fab_path) as f:
                fab = json.load(f)
            fab_overrides = []
            for key in ("dataset_shape", "anatomy", "n_patients",
                        "num_slices", "inplane", "num_frames",
                        "phantom_noise"):
                if key in fab and fab[key] != getattr(args, key):
                    fab_overrides.append(f"{key}={fab[key]}")
                    setattr(args, key, fab[key])
            if fab_overrides:
                print("[reuse] from kept fabrication.json: "
                      + " ".join(fab_overrides), flush=True)
    else:
        work = tempfile.mkdtemp(prefix="sr_rpq_")
        data_root = os.path.join(work, "data")
        exper_root = os.path.join(work, "exper")
    ds = args.downsample_steps  # after --reuse settings.yaml overrides
    cardiac = args.dataset_shape == "ACDC"
    if cardiac and ds != 2:
        raise SystemExit("--dataset_shape ACDC requires "
                         f"--downsample_steps 2, got {ds} (the cardiac "
                         "pipeline trains/evaluates at gap 2)")
    if args.n_patients < 7:
        # every fabricated tree reserves 3 test + 2 val patients
        # (ACDC via its own split; OASIS/dHCP via pids[:-5]/[-5:-3]/
        # [-3:]) — fewer than 7 leaves an empty/degenerate training
        # split that only fails minutes later inside the train child
        raise SystemExit(f"--dataset_shape {args.dataset_shape} needs "
                         ">= 7 patients (split reserves 3 test + 2 "
                         f"val), got {args.n_patients}")
    try:
        if args.reuse:
            print(f"[reuse] kept work dir {work} — skipping fabrication"
                  + ("" if args.extend else "/training"), flush=True)
        elif cardiac:
            print(f"[fabricate] {args.n_patients} cardiac 4D cine "
                  f"phantoms ({args.num_frames}x{args.num_slices}x"
                  f"{args.inplane}^2) under {data_root}", flush=True)
            make_textured_acdc_tree(data_root, args.n_patients,
                                    args.inplane, args.num_slices,
                                    args.num_frames,
                                    noise_sigma=args.phantom_noise)
        elif args.dataset_shape == "dHCP":
            print(f"[fabricate] {args.n_patients} {args.anatomy} dHCP "
                  f"volumes ({args.num_slices}x{args.inplane}^2, "
                  f"{ds / 2:.1f}mm LR) under {data_root}", flush=True)
            make_textured_dhcp_tree(data_root, ds, args.n_patients,
                                    args.inplane, args.num_slices,
                                    anatomy=args.anatomy,
                                    noise_sigma=args.phantom_noise)
        else:
            print(f"[fabricate] {args.n_patients} {args.anatomy} volumes "
                  f"({args.num_slices}x{args.inplane}^2, {ds}mm LR) "
                  f"under {data_root}", flush=True)
            make_textured_oasis_tree(data_root, ds, args.n_patients,
                                     args.inplane, args.num_slices,
                                     anatomy=args.anatomy,
                                     noise_sigma=args.phantom_noise)
        if not args.reuse:
            # provenance for --reuse/--extend (see the reuse branch)
            with open(os.path.join(work, "fabrication.json"), "w") as f:
                json.dump({k: getattr(args, k)
                           for k in ("dataset_shape", "anatomy",
                                     "n_patients", "num_slices",
                                     "inplane", "num_frames",
                                     "phantom_noise")}, f)

        score_root = data_root
        score_sigma = args.phantom_noise
        if args.score_noise is not None:
            if not args.reuse or args.extend:
                raise SystemExit("--score_noise requires --reuse "
                                 "without --extend (it re-scores a "
                                 "kept model, never retrains)")
            score_sigma = float(args.score_noise)
            score_root = os.path.join(
                work, f"scoredata_{score_sigma:g}", "data")
            if not os.path.isdir(score_root):
                print(f"[score-noise] fabricating evaluation tree at "
                      f"sigma={score_sigma:g} (same anatomy seeds) "
                      f"under {score_root}", flush=True)
                if cardiac:
                    make_textured_acdc_tree(
                        score_root, args.n_patients, args.inplane,
                        args.num_slices, args.num_frames,
                        noise_sigma=score_sigma)
                elif args.dataset_shape == "dHCP":
                    make_textured_dhcp_tree(
                        score_root, ds, args.n_patients, args.inplane,
                        args.num_slices, anatomy=args.anatomy,
                        noise_sigma=score_sigma)
                else:
                    make_textured_oasis_tree(
                        score_root, ds, args.n_patients, args.inplane,
                        args.num_slices, anatomy=args.anatomy,
                        noise_sigma=score_sigma)

        train_cmd = [
            sys.executable,
            "train_cardiac_aesr.py" if cardiac else "train_brain_aesr.py",
            "-d", args.dataset_shape,
            "-m", args.model, "--downsample_steps", str(ds),
            "--width", str(args.inplane), "--latent_width",
            str(args.latent_width or args.inplane // 4),
            "--latent", str(args.latent),
            "--depth", str(args.depth),
            "--aug_patch_size", str(args.inplane),
            "-b", str(args.batch_size), "--lr", str(args.lr),
            "-e", str(args.epochs),
            "--epoch_threshold", str(args.epochs - args.sweep_last),
            "--ex_loss_weight1", str(args.ex_loss_weight),
            "--volume_preview_interval", "0", "--seed", "7",
            *loss_mode_flags(args.loss_mode),
            *(["--use_batchnorm", str(args.use_batchnorm)]
              if args.use_batchnorm is not None else []),
            *(["--ema_decay", str(args.ema_decay)]
              if args.ema_decay > 0 else []),
            *(["--lr_warmup_steps", str(args.lr_warmup_steps)]
              if args.lr_warmup_steps > 0 else []),
            *(["--n_res_block", str(args.n_res_block)]
              if args.n_res_block is not None else []),
            *(["--train_latent_interp", args.train_latent_interp]
              if args.train_latent_interp != "linear" else []),
            *(["--compute_dtype", args.compute_dtype]
              if args.compute_dtype != "float32" else []),
            *(["--aug_noise"] if args.aug_noise else []),
            *(["--aug_blur"] if args.aug_blur else []),
            *(["--max_grad_norm", str(args.max_grad_norm)]
              if args.max_grad_norm else []),
            *(["--step_timeout_s", str(args.step_timeout_s),
               "--auto_resume"]
              if args.step_timeout_s > 0 else []),
            # steps-per-epoch UPPER bound (train split <= n_patients
            # volumes of num_slices triplets — x num_frames for the 4D
            # cardiac index): overestimating decay_steps only leaves
            # the cosine tail slightly above 0
            *(["--use_lr_scheduler", "--lr_iter_max",
               str(args.epochs * max(1, (args.n_patients
                                         * args.num_slices
                                         * (args.num_frames if cardiac
                                            else 1))
                                     // args.batch_size))]
              if args.lr_schedule else []),
            "-o", exper_root, "-id", "rpq",
        ]
        if args.extend and "--auto_resume" not in train_cmd:
            # --auto_resume normally rides in with --step_timeout_s>0;
            # an extension run needs it unconditionally to pick up the
            # kept rolling checkpoint instead of reinitializing
            train_cmd += ["--auto_resume"]
        if not args.reuse or args.extend:
            print("[train] " + " ".join(train_cmd), flush=True)
            steps = args.epochs * max(1, (args.n_patients
                                          * args.num_slices
                                          * (args.num_frames if cardiac
                                             else 1))
                                      // args.batch_size)
            _run(train_cmd, data_root, "train",
                 log_path=os.path.join(work, "train.log"),
                 timeout=compute_train_budget(args, steps),
                 stall_restarts=10 if args.step_timeout_s > 0 else 0)
        exper = os.path.join(exper_root, "rpq")

        def _fit_taps(model_nbr, what):
            _run([sys.executable, "fit_latent_taps.py",
                  "--exper_dir", exper, "--downsample_steps", str(ds),
                  "--model_nbr", str(model_nbr)],
                 data_root, what,
                 log_path=os.path.join(work, f"{what}.log"))

        if args.latent_interp == "fitted":
            # the sweep needs a table before it can select under the
            # fitted scheme; fit against the min-val-loss alias first,
            # refit on the actually-selected checkpoint before scoring
            _fit_taps("caisr", "fit_taps")

        if args.checkpoint is not None:
            # pinned: skip the (expensive) epoch re-sweep of a kept,
            # already-swept experiment — rescoring at a different
            # --score_noise/--tta must not pay the sweep again
            if not args.reuse:
                raise SystemExit("--checkpoint requires --reuse")
            best_nbr = (int(args.checkpoint) if args.checkpoint.isdigit()
                        else args.checkpoint)
            print(f"[score] using pinned checkpoint: {best_nbr}",
                  flush=True)
        else:
            r = _run([sys.executable, "find_best_model.py",
                      "--exper_dir", exper, "--downsample_steps", str(ds),
                      "--batched",
                      # select checkpoints under the same z-mixing scheme
                      # the scoring pass serves with
                      *(["--latent_interp", args.latent_interp]
                        if args.latent_interp != "linear" else [])],
                     data_root, "find_best",
                     log_path=os.path.join(work, "find_best.log"))
            best_lines = [l for l in r.stdout.splitlines()
                          if "best per metric" in l or "ssim" in l.lower()]
            print("\n".join(best_lines[-6:]), flush=True)
            # model selection happens on the VAL sweep: score the epoch
            # the sweep picked by synthesized-slice SSIM; fall back to
            # the min-val-loss 'caisr' alias when the line isn't found
            import re
            m = re.search(r"ssim_synth: epoch (\d+)", r.stdout)
            best_nbr = int(m.group(1)) if m else "caisr"
            have_ema = os.path.isfile(
                os.path.join(exper, "models", "ema.models"))
            best_nbr = select_score_checkpoint(args.score, args.ema_decay,
                                               have_ema, best_nbr)
            kind = "EMA" if best_nbr == "ema" else "sweep-selected"
            print(f"[score] using {kind} checkpoint: {best_nbr}",
                  flush=True)

        score_latent_interp = args.latent_interp
        if args.latent_interp == "fitted":
            _fit_taps(best_nbr, "fit_taps_refit")
            from superresolution_aniso_mri_tpu.infer import (
                resolve_latent_interp,
            )
            score_latent_interp = resolve_latent_interp("fitted", exper)

        # ------------------------------------------------------------------
        # held-out test scoring, CPU, in-process
        # ------------------------------------------------------------------
        from superresolution_aniso_mri_tpu.data.datasets import (
            load_acdc_volumes, load_brain_volumes,
        )
        from superresolution_aniso_mri_tpu.evaluate import create_hr_images
        from superresolution_aniso_mri_tpu.train import get_trainer

        os.environ["SR_DATA_ROOT"] = score_root
        if cardiac:
            # one 3-D Volume per (patient, frame) — create_hr_images
            # downsamples each internally and scores the synthesized
            # slices against the held-out originals (the reference's
            # cardiac protocol, evaluate/cardiac/evaluate_model.py)
            test_vols = load_acdc_volumes("test")
        else:
            test_vols = load_brain_volumes(args.dataset_shape, ds,
                                           split="test",
                                           include_hr_images=True)
        assert test_vols, "empty test split"
        print(f"[score] {len(test_vols)} held-out test volumes", flush=True)

        trainer = get_trainer(exper, model_nbr=best_nbr, eval_mode=True)
        rows = {"model (AESR)": create_hr_images(
            trainer, test_vols, downsample_steps=ds,
            tta=args.tta, latent_interp=score_latent_interp)["aggregate"]}
        for method in ("linear", "bspline", "lanczos"):
            rows[method] = create_hr_images(
                None, test_vols, downsample_steps=ds,
                interpol_method=method)["aggregate"]

        loss_mode = args.loss_mode
        if args.reuse:
            # describe the kept experiment, not this call's flag
            # defaults (anatomy/n_patients/etc. are not persisted —
            # pass matching flags when reusing a non-default tree)
            ta = trainer.args
            if ta.get("image_mix_loss_func") == "perceptual":
                loss_mode = ("perceptual+lap" if ta.get("use_laploss")
                             else "perceptual")
            elif ta.get("image_mix_loss_func") == "perceptual_enc":
                loss_mode = "perceptual_enc"
            else:
                loss_mode = ("mse+ssim" if ta.get("use_ssim_loss")
                             else "mse")

        hdr = (f"{'method':>14} | {'SSIM synth':>12} | "
               f"{'PSNR synth':>12} | {'VIF synth':>12} | "
               f"{'SSIM all':>9} | {'PSNR all':>9}")
        print(f"\n=== production-pipeline {args.dataset_shape}-shaped "
              f"quality (ds={ds}, loss={loss_mode}) ===")
        print(hdr)
        print("-" * len(hdr))
        # the all-slice columns include the ORIGINAL-grid slices (the
        # model path reconstructs them through the AE, conventional
        # copies them verbatim) — a large model synth-vs-all gap
        # localizes failure to synthesis, a small one to AE recon
        for name, agg in rows.items():
            print(f"{name:>14} | {agg['ssim_synth'][0]:12.4f} | "
                  f"{agg['psnr_synth'][0]:12.3f} | "
                  f"{agg['vif_synth'][0]:12.4f} | "
                  f"{agg['ssim'][0]:9.4f} | {agg['psnr'][0]:9.3f}")

        model = rows["model (AESR)"]
        conv = ("linear", "bspline", "lanczos")
        wins = {}
        for metric in ("ssim_synth", "psnr_synth", "vif_synth"):
            best_conv = max(rows[m][metric][0] for m in conv)
            wins[metric] = (float(model[metric][0]), float(best_conv))
            tag = ("BEATS" if wins[metric][0] > wins[metric][1]
                   else "does not beat")
            print(f"{metric}: model {tag} best conventional "
                  f"({wins[metric][0]:.4f} vs {wins[metric][1]:.4f})")
        all_beat = all(m > c for m, c in wins.values())
        print(f"\nmodel {'BEATS' if all_beat else 'does not beat'} "
              f"conventional interpolation on ALL metrics "
              f"(full production pipeline)")

        wins_extra = None
        all_beat_extra = None
        if args.extra_test_volumes > 0:
            if cardiac:
                extra = make_extra_test_volumes_acdc(
                    args.extra_test_volumes, args.inplane,
                    args.num_slices, args.num_frames,
                    noise_sigma=score_sigma)
            else:
                extra = make_extra_test_volumes(
                    ds, args.extra_test_volumes, args.inplane,
                    args.num_slices, anatomy=args.anatomy,
                    noise_sigma=score_sigma)
            print(f"\n=== extra held-out set: {len(extra)} fresh "
                  f"volumes (disjoint seeds) ===")
            rows_x = {"model (AESR)": create_hr_images(
                trainer, extra, downsample_steps=ds, tta=args.tta,
                latent_interp=score_latent_interp)["aggregate"]}
            for method in ("linear", "bspline", "lanczos"):
                rows_x[method] = create_hr_images(
                    None, extra, downsample_steps=ds,
                    interpol_method=method)["aggregate"]
            print(hdr)
            print("-" * len(hdr))
            for name, agg in rows_x.items():
                print(f"{name:>14} | {agg['ssim_synth'][0]:12.4f} | "
                      f"{agg['psnr_synth'][0]:12.3f} | "
                      f"{agg['vif_synth'][0]:12.4f} | "
                      f"{agg['ssim'][0]:9.4f} | {agg['psnr'][0]:9.3f}")
            model_x = rows_x["model (AESR)"]
            wins_extra = {}
            for metric in ("ssim_synth", "psnr_synth", "vif_synth"):
                best_conv = max(rows_x[m][metric][0] for m in conv)
                wins_extra[metric] = (float(model_x[metric][0]),
                                      float(best_conv))
                tag = ("BEATS" if wins_extra[metric][0]
                       > wins_extra[metric][1] else "does not beat")
                print(f"{metric}: model {tag} best conventional "
                      f"({wins_extra[metric][0]:.4f} vs "
                      f"{wins_extra[metric][1]:.4f})  [extra set]")
            all_beat_extra = all(m > c for m, c in wins_extra.values())
            print(f"model {'BEATS' if all_beat_extra else 'does not beat'}"
                  f" conventional on ALL metrics (extra held-out set)")

        if args.json_out:
            rec = {
                "tool": "real_pipeline_quality",
                "dataset_shape": args.dataset_shape,
                "anatomy": "cardiac4d" if cardiac else args.anatomy,
                "num_frames": args.num_frames if cardiac else None,
                "phantom_noise": args.phantom_noise,
                "score_noise": score_sigma,
                "compute_dtype": trainer.args.get("compute_dtype",
                                                  "float32"),
                "loss_mode": loss_mode,
                "model_family": args.model,
                "lpips_mode": trainer.args.get("lpips_mode"),
                # in --reuse mode the flag default may not describe the
                # kept experiment — the settings.yaml value always does
                "epochs": int(trainer.args.get("epochs") or args.epochs),
                "checkpoint": str(best_nbr),
                # normalise to int 0/1: the CLI records bools when the
                # flag was defaulted, ints when explicit — a typed JSONL
                # consumer must not see both
                "use_batchnorm": (
                    None if trainer.args.get("use_batchnorm") is None
                    else int(bool(trainer.args.get("use_batchnorm")))),
                "lr_schedule": bool(args.lr_schedule),
                "aug_noise": bool(trainer.args.get("aug_noise")),
                "aug_blur": bool(trainer.args.get("aug_blur")),
                "max_grad_norm": float(
                    trainer.args.get("max_grad_norm", 0) or 0),
                "lr_warmup_steps": int(trainer.args.get(
                    "lr_warmup_steps", 0) or 0),
                "n_res_block": trainer.args.get("n_res_block"),
                "tta": args.tta,
                "latent_interp": args.latent_interp,
                "train_latent_interp": trainer.args.get(
                    "train_latent_interp", "linear"),
                "ema_decay": args.ema_decay,
                "ex_loss_weight": args.ex_loss_weight,
                "downsample_steps": ds,
                "latent": int(args.latent), "depth": int(args.depth),
                "latent_width": int(args.latent_width
                                    or args.inplane // 4),
                "inplane": args.inplane, "num_slices": args.num_slices,
                "n_patients": args.n_patients,
                "model": {k: round(mv, 5)
                          for k, (mv, _) in wins.items()},
                "model_all_slices": {
                    k: round(float(model[k][0]), 5)
                    for k in ("ssim", "psnr", "vif")},
                "best_conventional": {k: round(cv, 5)
                                      for k, (_, cv) in wins.items()},
                "beats_all": bool(all_beat),
            }
            if wins_extra is not None:
                rec["n_extra_test"] = int(args.extra_test_volumes)
                rec["model_extra"] = {k: round(mv, 5)
                                      for k, (mv, _) in wins_extra.items()}
                rec["best_conventional_extra"] = {
                    k: round(cv, 5) for k, (_, cv) in wins_extra.items()}
                rec["beats_all_extra"] = bool(all_beat_extra)
            with open(args.json_out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"appended result to {args.json_out}")
    finally:
        if args.keep:
            print(f"artifacts kept in {work}")
        else:
            # on failure, rescue the child-CLI logs BEFORE deleting the
            # tree — train.log/find_best.log hold the full tracebacks
            # the SystemExit message truncates
            if sys.exc_info()[0] is not None:
                rescue = tempfile.mkdtemp(prefix="sr_rpq_logs_")
                for f in glob.glob(os.path.join(work, "*.log")):
                    shutil.copy2(f, rescue)
                print(f"FAILED — child logs preserved in {rescue}",
                      file=sys.stderr)
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
