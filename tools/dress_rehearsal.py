#!/usr/bin/env python
"""Real-data dress rehearsal: fabricate OASIS/dHCP/ACDC-shaped dataset
trees and drive the full CLI pipeline over each —
train → find_best_model → generate_hr_volumes → quantitative comparison
— asserting every stage's outputs. One command proves the ingest paths,
the experiment-dir contract and the inference/eval CLIs work end to end
on dataset layouts shaped like the real thing (the reference layouts:
datasets/common_brains.py:160-226, datasets/dHCP/dataset.py,
datasets/ACDC/data4d_simple.py).

  python tools/dress_rehearsal.py [--datasets OASIS dHCP ACDC ACDCLBL] [--keep]

Runs on CPU; ~2-6 min per dataset on one core.
"""
import argparse
import glob
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


from _subproc import run_child  # noqa: E402  (shared helper)


def _run(cmd, data_root, what):
    # CPU-pinned children: many short trainings that must not queue on
    # the single tunneled chip
    return run_child(cmd, data_root, what, timeout=1800, force_cpu=True,
                     verbose=False)


# ---------------------------------------------------------------------------
# fabricated dataset trees (shapes/layouts of the real datasets, tiny sizes)
# ---------------------------------------------------------------------------

def _smooth3d(rng, shape):
    import scipy.ndimage
    v = scipy.ndimage.gaussian_filter(
        rng.rand(*shape).astype(np.float32), (0.8, 2.0, 2.0))
    v -= v.min()
    return (v / max(v.max(), 1e-6)).astype(np.float32)


def make_oasis_tree(data_root, ds=3, n_patients=10, inplane=24, nsl=13):
    """root/OASIS/nifti/OAS1_xxxx_MR1/*_t88_gfc[_3mm].nii.gz"""
    from superresolution_aniso_mri_tpu.data import simulate_thick_slices
    from superresolution_aniso_mri_tpu.utils import write_nifti

    rng = np.random.RandomState(0)
    for i in range(n_patients):
        pdir = os.path.join(data_root, "OASIS", "nifti",
                            f"OAS1_{i:04d}_MR1")
        os.makedirs(pdir, exist_ok=True)
        hr = _smooth3d(rng, (nsl, inplane, inplane))
        write_nifti(os.path.join(pdir, f"OAS1_{i:04d}_MR1_t88_gfc.nii.gz"),
                    hr, spacing=np.array([1.0, 1.0, 1.0]))
        write_nifti(
            os.path.join(pdir, f"OAS1_{i:04d}_MR1_t88_gfc_{ds}mm.nii.gz"),
            simulate_thick_slices(hr, float(ds)),
            spacing=np.array([1.0, 1.0, 1.0]))


def make_dhcp_tree(data_root, ds=2, n_patients=10, inplane=24, nsl=13):
    """root/dHCP_cropped_256/<id>_t2w[_1.0mm].nii.gz"""
    from superresolution_aniso_mri_tpu.data import simulate_thick_slices
    from superresolution_aniso_mri_tpu.utils import write_nifti

    rng = np.random.RandomState(1)
    d = os.path.join(data_root, "dHCP_cropped_256")
    os.makedirs(d, exist_ok=True)
    for i in range(n_patients):
        hr = _smooth3d(rng, (nsl, inplane, inplane))
        write_nifti(os.path.join(d, f"{1000 + i}_t2w.nii.gz"), hr,
                    spacing=np.array([0.5, 0.5, 0.5]))
        write_nifti(
            os.path.join(d, f"{1000 + i}_t2w_{ds / 2:.1f}mm.nii.gz"),
            simulate_thick_slices(hr, float(ds)),
            spacing=np.array([0.5, 0.5, 0.5]))


def make_acdc_tree(data_root, n_patients=8, inplane=24, nsl=7, frames=3):
    """root/ACDC/all_cardiac_phases/patientXXX/patientXXX_4d.nii.gz
    (+labeled ED/ES frames) + the SR split yaml."""
    import yaml
    from superresolution_aniso_mri_tpu.utils import write_nifti

    rng = np.random.RandomState(2)
    base = os.path.join(data_root, "ACDC", "all_cardiac_phases")
    pids = []
    for i in range(1, n_patients + 1):
        pid = f"patient{i:03d}"
        pids.append(pid)
        pdir = os.path.join(base, pid)
        os.makedirs(pdir, exist_ok=True)
        vol4d = np.stack([_smooth3d(rng, (nsl, inplane, inplane)) * 400
                          for _ in range(frames)])
        write_nifti(os.path.join(pdir, f"{pid}_4d.nii.gz"),
                    vol4d.astype(np.float32),
                    spacing=np.array([10.0, 1.6, 1.6]))
        # labeled ED/ES frames for the ACDCLBL multichannel pipeline
        # (real layout: patientXXX_frameYY.nii.gz + _gt segmentation)
        for fr in (1, frames):
            img = _smooth3d(rng, (nsl, inplane, inplane)) * 400
            # 4-class segmentation-shaped labels (BG/RV/MYO/LV) from
            # intensity quartiles — spatially coherent like real masks
            qs = np.percentile(img, (60, 80, 92))
            lbl = np.digitize(img, qs).astype(np.int16)
            write_nifti(os.path.join(pdir, f"{pid}_frame{fr:02d}.nii.gz"),
                        img.astype(np.float32),
                        spacing=np.array([10.0, 1.6, 1.6]))
            write_nifti(os.path.join(pdir,
                                     f"{pid}_frame{fr:02d}_gt.nii.gz"),
                        lbl, spacing=np.array([10.0, 1.6, 1.6]))
    split = {"training": pids[:-2], "validation": pids[-2:-1],
             "test": pids[-1:]}
    with open(os.path.join(data_root, "ACDC",
                           "train_val_test_split_sr.yaml"), "w") as f:
        yaml.safe_dump(split, f)


# ---------------------------------------------------------------------------
# pipeline drivers
# ---------------------------------------------------------------------------

TRAIN_COMMON = ["--width", "16", "--latent_width", "8", "--depth", "8",
                "--latent", "8", "--lr", "0.002", "-e", "2", "-b", "4",
                "--image_mix_loss_func", "mse", "--epoch_threshold", "-1",
                "--volume_preview_interval", "0",
                # pin the aug canvas to the fabricated 24px in-plane
                # size: without this the CLI's real-dataset defaults
                # (OASIS 220 / dHCP 256 / ACDC 180, arguments.py) pad
                # the tiny volumes into mostly-blank canvases and the
                # random 16-crop would train on ~4% anatomy
                "--aug_patch_size", "24"]


def rehearse(dataset, data_root, work):
    from superresolution_aniso_mri_tpu.utils import read_nifti

    cli = ("train_cardiac_aesr.py" if dataset.startswith("ACDC")
           else "train_brain_aesr.py")
    ds = {"OASIS": 3, "dHCP": 2, "ACDC": 2, "ACDCLBL": 2}[dataset]
    out = os.path.join(work, f"exper_{dataset}")
    print(f"[{dataset}] train ({cli})...", flush=True)
    _run([sys.executable, cli, "-d", dataset, "-m", "ae_combined",
          "--downsample_steps", str(ds), *TRAIN_COMMON,
          "-o", out, "-id", "dress"], data_root, f"{dataset} train")
    exper = os.path.join(out, "dress")
    assert os.path.isfile(os.path.join(exper, "settings.yaml")), \
        "settings.yaml missing"
    assert glob.glob(os.path.join(exper, "models", "*.models")), \
        "no checkpoints written"
    assert os.path.isfile(os.path.join(exper, "losses_train.npz"))

    print(f"[{dataset}] find_best_model...", flush=True)
    r = _run([sys.executable, "find_best_model.py", "--exper_dir", exper,
              "--downsample_steps", str(ds), "--batched"],
             data_root, f"{dataset} find_best")
    assert "best per metric" in r.stdout, r.stdout[-1000:]

    # inference inputs: the LR volumes themselves (brain) / one frame
    print(f"[{dataset}] generate_hr_volumes...", flush=True)
    in_dir = os.path.join(work, f"in_{dataset}")
    os.makedirs(in_dir, exist_ok=True)
    if dataset == "OASIS":
        src = glob.glob(os.path.join(data_root, "OASIS", "nifti", "*",
                                     f"*_{ds}mm.nii.gz"))[0]
    elif dataset == "dHCP":
        src = glob.glob(os.path.join(data_root, "dHCP_cropped_256",
                                     f"*_{ds / 2:.1f}mm.nii.gz"))[0]
    elif dataset == "ACDCLBL":
        # labeled ED frame + its _gt companion: the CLI must pick the
        # labels up, feed them through the multichannel model and save
        # the decoded label volume alongside
        src = glob.glob(os.path.join(data_root, "ACDC",
                                     "all_cardiac_phases", "*",
                                     "*_frame01.nii.gz"))[0]
        shutil.copy2(src.replace(".nii.gz", "_gt.nii.gz"), in_dir)
    else:
        src = glob.glob(os.path.join(data_root, "ACDC",
                                     "all_cardiac_phases", "*",
                                     "*_4d.nii.gz"))[0]
    shutil.copy2(src, in_dir)
    hr_dir = os.path.join(work, f"hr_{dataset}")
    _run([sys.executable, "generate_hr_volumes.py", "--exper_dir", exper,
          "--model_nbr", "caisr", "--data_input_dir", in_dir,
          "--output_dir", hr_dir, "--num_interpolations", "1"],
         data_root, f"{dataset} generate_hr")
    outs = sorted(glob.glob(os.path.join(hr_dir, "*.nii.gz")))
    if dataset == "ACDCLBL":
        assert len(outs) == 2, f"expected image + _gt outputs, got {outs}"
        lbl_out = [o for o in outs if o.endswith("_gt.nii.gz")]
        assert len(lbl_out) == 1, f"no decoded label output in {outs}"
        lbl_arr, _, _ = read_nifti(lbl_out[0])
        assert np.issubdtype(lbl_arr.dtype, np.integer), lbl_arr.dtype
        assert set(np.unique(lbl_arr)) <= set(range(4)), \
            f"label classes {np.unique(lbl_arr)}"
        outs = [o for o in outs if not o.endswith("_gt.nii.gz")]
    else:
        assert len(outs) == 1, f"expected 1 output volume, got {outs}"
    arr, spacing, _ = read_nifti(outs[0])
    src_arr, src_sp, _ = read_nifti(src)
    z = 0 if arr.ndim == 3 else 1
    assert arr.shape[z] == 2 * src_arr.shape[z] - 1, \
        f"densified slice count {arr.shape} vs source {src_arr.shape}"
    np.testing.assert_allclose(spacing[0], src_sp[0] / 2.0)

    # quantitative comparison: model vs conventional interpolation on the
    # held-out validation volumes (evaluate/quantitative_comparison.py)
    print(f"[{dataset}] quantitative comparison...", flush=True)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from superresolution_aniso_mri_tpu.config.settings import load_settings\n"
        "from superresolution_aniso_mri_tpu.data.datasets import get_datasets\n"
        "from superresolution_aniso_mri_tpu.train import get_trainer\n"
        "from superresolution_aniso_mri_tpu.evaluate import (\n"
        "    create_hr_images, compare_quantitative)\n"
        "s = load_settings(%r)\n"
        "s['downsample_steps'] = %d\n"
        "_, val = get_datasets(s)\n"
        "t = get_trainer(%r, model_nbr='caisr')\n"
        "m = create_hr_images(t, val[:1], downsample_steps=%d)\n"
        "c = create_hr_images(None, val[:1], downsample_steps=%d,\n"
        "                     interpol_method='linear')\n"
        "import numpy as np\n"
        "for k in ('ssim_synth', 'psnr_synth'):\n"
        "    assert np.isfinite(m['aggregate'][k][0]), k\n"
        "    assert np.isfinite(c['aggregate'][k][0]), k\n"
        "print('QC OK model ssim=%%.4f linear ssim=%%.4f' %%\n"
        "      (m['aggregate']['ssim_synth'][0],\n"
        "       c['aggregate']['ssim_synth'][0]))\n"
    ) % (REPO, os.path.join(exper, "settings.yaml"), ds, exper, ds, ds)
    r = _run([sys.executable, "-c", code], data_root,
             f"{dataset} quantitative")
    assert "QC OK" in r.stdout, r.stdout[-1000:]
    print(f"[{dataset}] PASS", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", nargs="*",
                   default=["OASIS", "dHCP", "ACDC", "ACDCLBL"])
    p.add_argument("--keep", action="store_true",
                   help="keep the fabricated trees/experiments")
    args = p.parse_args()

    work = tempfile.mkdtemp(prefix="sr_dress_")
    data_root = os.path.join(work, "data")
    try:
        built = set()
        for d in args.datasets:
            builder = {"OASIS": make_oasis_tree, "dHCP": make_dhcp_tree,
                       "ACDC": make_acdc_tree,
                       "ACDCLBL": make_acdc_tree}[d]
            # ACDC and ACDCLBL share one fabricated tree — build once
            if builder not in built:
                builder(data_root)
                built.add(builder)
            rehearse(d, data_root, work)
        print(f"dress rehearsal PASSED for {args.datasets}")
    finally:
        failed = sys.exc_info()[0] is not None
        if args.keep or failed:
            # keep the tree on FAILURE too: the experiment dirs and
            # fabricated datasets are exactly what's needed to debug
            # the assertion that fired — deleting them forces a full
            # multi-minute rerun with --keep
            print(("artifacts kept in {}" if not failed else
                   "FAILED — artifacts kept for debugging in {}")
                  .format(work), flush=True)
        else:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
