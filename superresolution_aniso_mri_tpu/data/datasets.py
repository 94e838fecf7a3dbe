"""Dataset builders: on-disk volume ingest for the brain and cardiac
datasets, plus the synthetic toy backend.

Reference:
  * brain loaders — datasets/common_brains.py:160-226 get_images (LR
    suffix logic, per-dataset patient-id parsing), OASIS/dHCP/ADNI
    dataset classes;
  * ACDC — datasets/ACDC/data.py:419-506 ACDCImage (per-frame in-plane
    resample to 1.4mm + blur + 1-99 percentile rescale),
    data4d_simple.py pairs dataset;
  * LR-volume creation tools — datasets/OASIS/dataset.py:104-122
    create_lr_dataset, dHCP/dataset.py:14-36.

Each builder returns lists of ``Volume`` that plug into TripletSampler.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml

from ..config.data_config import get_config
from ..utils.nifti import read_image, write_image
from .synthetic import make_toy_dataset
from .volume import (Volume, apply_2d_zoom_3d, apply_2d_zoom_4d,
                     create_lr_volume, rescale_intensities)


# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------

def _find_files(root: str, suffix: str) -> List[str]:
    hits = []
    for dirpath, _dirs, files in os.walk(os.path.expanduser(root)):
        for f in files:
            if f.endswith(suffix):
                hits.append(os.path.join(dirpath, f))
    hits.sort()
    return hits


def _patient_id_from_file(dataset: str, path: str,
                          root: Optional[str] = None) -> str:
    name = os.path.basename(path)
    if dataset == "OASIS":
        return "_".join(name.split("_")[:3])
    if dataset == "dHCP":
        return name.split("_")[0]
    if dataset == "ADNI":
        # reference: the first subdir BELOW the dataset root is the
        # patient id, the scan dir above the file the sequence number
        # (common_brains.py:120-128 parses the root-relative path;
        # absolute-path offsets would grab arbitrary components)
        if root:
            rel = os.path.relpath(os.path.normpath(path),
                                  os.path.expanduser(root))
            parts = [p for p in rel.split(os.sep) if p not in ("", ".")]
            if len(parts) >= 3:
                return parts[0] + "_" + parts[-2]
            if len(parts) == 2:
                return parts[0]
        return os.path.splitext(name)[0].replace(".nii", "")
    stem = os.path.splitext(name)[0].replace(".nii", "")
    if dataset in ("ACDC", "ACDCC", "ARVC") and stem.endswith("_4d"):
        # 'patient001_4d.nii.gz' → 'patient001' so ids match the
        # reference split files and the labeled loader's ids
        # (reference: datasets/ACDC/data.py patient ids)
        stem = stem[:-3]
    return stem


def _split_patients(patient_ids: Sequence[str], split_file: Optional[str],
                    ratios=(0.8, 0.1, 0.1), seed: int = 1234
                    ) -> Dict[str, List[str]]:
    """Use an on-disk yaml split when present, else a deterministic
    seeded split (reference keeps yaml/xlsx split files per dataset)."""
    if split_file and os.path.isfile(os.path.expanduser(split_file)):
        with open(os.path.expanduser(split_file)) as fp:
            split = yaml.safe_load(fp)
        return {k: [str(p) for p in v] for k, v in split.items()}
    ids = sorted(set(str(p) for p in patient_ids))
    rs = np.random.RandomState(seed)
    perm = rs.permutation(len(ids))
    n_tr = int(len(ids) * ratios[0])
    n_va = int(len(ids) * ratios[1])
    if len(ids) >= 3:
        # small cohorts: int() flooring can zero out validation/test
        # (e.g. 8 patients at 0.8/0.1/0.1 → 6/0/2), which crashes the
        # val sampler far from the cause — guarantee one of each and
        # give the remainder to training
        n_va = max(n_va, 1)
        n_tr = max(1, min(n_tr, len(ids) - n_va - 1))
    return {
        "training": [ids[i] for i in perm[:n_tr]],
        "validation": [ids[i] for i in perm[n_tr:n_tr + n_va]],
        "test": [ids[i] for i in perm[n_tr + n_va:]],
    }


# ---------------------------------------------------------------------------
# brain datasets (OASIS / dHCP / ADNI / brainMASI)
# ---------------------------------------------------------------------------


def _warn_empty_split(dataset, split, n_files, splits):
    """Shared '0 of N volumes selected' diagnostic for the loaders."""
    import warnings
    warnings.warn(
        f"{dataset}: split {split!r} selected 0 of {n_files} "
        f"volumes (split keys: {sorted(splits)}; check the split "
        f"file's patient ids)", stacklevel=3)


def load_brain_volumes(dataset: str, downsample_steps: int,
                       split: str = "training",
                       limited_load: bool = False,
                       include_hr_images: bool = False,
                       rescale_int: bool = True,
                       src_path: Optional[str] = None) -> List[Volume]:
    """Load pre-generated synthetic-LR brain volumes
    (reference: common_brains.py:160-226 get_images).

    ``rescale_int`` defaults TRUE like the reference's dataset builders
    (OASIS/dHCP dataset.py pass rescale=True; evaluate_model.py
    rescale_int=True): raw scanner intensities (0..4095) would
    otherwise flow into a pipeline whose losses, metrics
    (data_range=1.0) and conventional-interp clipping all assume
    [0, 1]."""
    cfg = get_config(dataset)
    root = src_path or cfg.image_dir
    suffix = cfg.lr_file_suffix(downsample_steps)
    files = _find_files(root, suffix)
    if not files:
        raise FileNotFoundError(
            f"no '*{suffix}' volumes under {root} for {dataset}")
    dir_split_applied = False
    if dataset == "brainMASI":
        # the curated on-disk layout IS the split
        # (reference: brainMASI/dataset.py — Training/ and Test/
        # directories only; 'validation' maps to the test set like the
        # reference's val_set). A random re-split would leak curated
        # test patients into training.
        want_dir = ("training" if split == "training" else "test")

        # only components BELOW the data root count — an ancestor
        # directory named 'test'/'training' (e.g. /mnt/test/data) would
        # otherwise match every file and leak splits into each other
        def _parts_below_root(f):
            rel = os.path.relpath(os.path.abspath(f),
                                  os.path.abspath(root))
            return {p.lower() for p in rel.split(os.sep)}

        by_dir = [f for f in files if want_dir in _parts_below_root(f)]
        has_split_dirs = any(
            d in _parts_below_root(f) for f in files
            for d in ("training", "test"))
        if by_dir:
            files = by_dir
            dir_split_applied = True
        elif has_split_dirs:
            # split directories exist but NONE matched the requested
            # split (e.g. split='test' with only Training/ present) —
            # returning everything would silently leak training volumes
            # into the test/validation set
            raise FileNotFoundError(
                f"brainMASI: no '{want_dir}' directory with *{suffix} "
                f"volumes under {root} for split {split!r}")
    pids = [_patient_id_from_file(dataset, f, root) for f in files]
    if dir_split_applied:
        # directory filter above already selected the split
        sel = list(zip(pids, files))
    else:
        splits = _split_patients(pids, cfg.split_file)
        wanted = set(splits.get(split, []))
        sel = [(p, f) for p, f in zip(pids, files) if p in wanted]
    if not sel and files:
        _warn_empty_split(dataset, split, len(files), splits)
    if limited_load:
        sel = sel[:cfg.limited_load_max]
    # decode the whole split in parallel on the native runtime when it is
    # available (native/srloader.cc thread-pool NIfTI ingest); identical
    # arrays to the sequential Python reader
    reads = {path: None for _, path in sel}
    if include_hr_images:
        for _, path in sel:
            hr_path = path.replace(suffix, cfg.img_file_ext)
            if os.path.isfile(hr_path):
                reads[hr_path] = None
    decoded = _read_images_parallel(list(reads))
    volumes = []
    for pid, path in sel:
        arr, spacing, _ = decoded[path]
        arr = arr.astype(np.float32)
        if rescale_int:
            arr = rescale_intensities(arr, percs=(0, 100))
        hr = None
        if include_hr_images:
            hr_path = path.replace(suffix, cfg.img_file_ext)
            # when the LR suffix IS the extension (brainMASI/toy sets),
            # hr_path == path and "HR" would just be the LR copy —
            # scoring SR against its own input
            if hr_path != path and hr_path in decoded:
                hr = decoded[hr_path][0].astype(np.float32)
                if rescale_int:
                    hr = rescale_intensities(hr, percs=(0, 100))
        volumes.append(Volume(image=arr, spacing=spacing, patient_id=pid,
                              image_hr=hr))
    return volumes


def _read_images_parallel(paths):
    """{path: (arr, spacing, affine)} — native thread-pool decode for
    NIfTI files when the runtime is available, Python reader otherwise
    (and always for MetaImage)."""
    from .native_loader import available, read_nifti_many

    out = {}
    nif = [p for p in paths if p.endswith((".nii", ".nii.gz"))]
    if len(nif) > 1 and available():
        try:
            # strict=False: one corrupt file keeps the N-1 good native
            # decodes (None entries retry through the Python reader
            # below, which raises the real per-file error)
            for p, res in zip(nif, read_nifti_many(nif, strict=False)):
                if res is not None:
                    out[p] = res
        except (IOError, OSError):
            out = {}  # fall back to the Python reader for everything
    for p in paths:
        if p not in out:
            out[p] = read_image(p)
    return out


def create_lr_dataset(dataset: str, downsample_steps: int,
                      src_path: Optional[str] = None,
                      out_path: Optional[str] = None) -> List[str]:
    """Generate + save blurred synthetic-LR volumes next to the HR ones
    (reference: OASIS/dataset.py:104-122, dHCP/dataset.py:14-36,
    ADNI/create_dataset.py)."""
    import re

    cfg = get_config(dataset)
    if cfg.lr_file_suffix(downsample_steps) == cfg.img_file_ext:
        raise ValueError(
            f"{dataset} trains from HR volumes (downsampling happens at "
            f"sample time) — there is no LR file convention, and writing "
            f"one would overwrite the source volumes in place")
    root = src_path or cfg.image_dir
    files = _find_files(root, cfg.img_file_ext)
    # never re-ingest previously generated LR outputs (their '_Kmm'
    # suffix still ends with img_file_ext for ADNI's plain '.nii'):
    # a rerun would double-blur them into e.g. 'x_2mm_4mm.nii'
    lr_pat = re.compile(r"_\d+(\.\d+)?mm" + re.escape(cfg.img_file_ext)
                        + r"$")
    files = [f for f in files if not lr_pat.search(os.path.basename(f))]
    if out_path:
        out_path = os.path.expanduser(out_path)
        os.makedirs(out_path, exist_ok=True)
    written = []
    for path in files:
        arr, spacing, affine = read_image(path)
        # blur sigma works in native-voxel units for every dataset; the
        # dHCP naming alone differs (0.5mm voxels → suffix ds/2 mm)
        thickness = downsample_steps
        lr = create_lr_volume(arr.astype(np.float32), thickness,
                              subsample=False)
        suffix = cfg.lr_file_suffix(downsample_steps)
        out = path.replace(cfg.img_file_ext, suffix)
        if out_path:
            out = os.path.join(out_path, os.path.basename(out))
        write_image(out, lr.astype(np.float32), spacing=spacing,
                    affine=affine)
        written.append(out)
    return written


# ---------------------------------------------------------------------------
# cardiac (ACDC 4D and friends)
# ---------------------------------------------------------------------------

# patients whose native slice thickness is 5mm → SR test split
# (reference: datasets/ACDC/data.py:21-23 PATIENT_LIST_5MM_SLICE_THICKNESS)
ACDC_5MM_PATIENTS = (4, 5, 9, 18, 54, 63, 69, 75, 79, 80, 90, 94)


def acdc_default_split(pids) -> Dict[str, List[str]]:
    """Reference ACDC SR split when no on-disk file exists: the 12
    patients with native 5mm slices form the test set, 70 of the rest
    train, the remainder validate (reference: datasets/ACDC/data.py
    PATIENT_LIST_5MM_SLICE_THICKNESS:21-23,
    split_patids_by_slice_thickness:163-174, get_patids_acdc_sr:176-195)."""
    five = {f"patient{p:03d}" for p in ACDC_5MM_PATIENTS}
    ids = sorted(set(str(p) for p in pids))
    test = [p for p in ids if p in five]
    rest = [p for p in ids if p not in five]
    rs = np.random.RandomState(1234)
    perm = rs.permutation(len(rest))
    n_tr = min(70, len(rest))
    return {
        "training": sorted(rest[i] for i in perm[:n_tr]),
        "validation": sorted(rest[i] for i in perm[n_tr:]),
        "test": test,
    }


def load_acdc_volumes(split: str = "training",
                      limited_load: bool = False,
                      resample: bool = True,
                      rescale: bool = True,
                      src_path: Optional[str] = None,
                      frame_limit: Optional[int] = None,
                      dataset: str = "ACDC") -> List[Volume]:
    """Load ACDC 4D cine volumes; each frame becomes one 3-D Volume
    (pair sampling never crosses frames, matching the reference's
    (pat, frame, slice) index — datasets/ACDC/data4d_simple.py:131-240).

    Per-frame preprocessing mirrors ACDCImage.preprocessed4d
    (data.py:471-506): in-plane resample to 1.4x1.4 mm with blur, 1-99
    percentile rescale.
    """
    cfg = get_config(dataset)
    root = src_path or cfg.image_dir
    files = _find_files(root, "4d.nii.gz") or _find_files(root, ".nii.gz")
    if not files:
        raise FileNotFoundError(f"no {dataset} volumes under {root}")
    pids = [_patient_id_from_file(dataset, f, root) for f in files]
    if (dataset in ("ACDC", "ACDCC") and not (cfg.split_file and os.path.isfile(
            os.path.expanduser(cfg.split_file)))):
        # reference 5mm-thickness split (see acdc_default_split)
        splits = acdc_default_split(pids)
    else:
        splits = _split_patients(pids, cfg.split_file)
    wanted = set(splits.get(split, []))
    sel = [(p, f) for p, f in zip(pids, files) if p in wanted]
    if not sel and files:
        _warn_empty_split(dataset, split, len(files), splits)
    if limited_load:
        sel = sel[:cfg.limited_load_max]
    # native thread-pool decode (same helper as the brain loaders) —
    # serial gunzip of a 100-patient 4D cohort dominates startup
    decoded = _read_images_parallel([p for _, p in sel])
    volumes: List[Volume] = []
    for pid, path in sel:
        arr, spacing, _ = decoded[path]
        arr = arr.astype(np.float32)
        if arr.ndim == 3:
            arr = arr[None]
        if frame_limit:
            arr = arr[:frame_limit]
        # per-patient bad-frame trimming is an ACDC curation — ACDCC
        # reads the same all_cardiac_phases files and needs it too
        bad_limit = (acdc_frame_limit(pid)
                     if dataset in ("ACDC", "ACDCC") else None)
        if bad_limit is not None:
            arr = arr[:bad_limit]
        original_spacing = np.asarray(spacing, np.float64)[-3:]
        spacing = original_spacing.copy()
        if resample and cfg.voxel_spacing_resample is not None:
            arr = apply_2d_zoom_4d(arr, spacing[-2:],
                                   cfg.voxel_spacing_resample)
            # the Volume now lives on the resampled in-plane grid
            spacing[1:] = np.asarray(cfg.voxel_spacing_resample,
                                     np.float64)[-2:]
        for t in range(arr.shape[0]):
            frame = arr[t]
            if rescale:
                frame = rescale_intensities(frame, percs=(1, 99))
            volumes.append(Volume(
                image=frame.astype(np.float32), spacing=spacing.copy(),
                patient_id=f"{pid}_f{t:02d}",
                original_spacing=original_spacing.copy(),
                frame_id=t, num_frames=int(arr.shape[0])))
    return volumes


# ---------------------------------------------------------------------------
# dispatcher used by the train CLIs
# ---------------------------------------------------------------------------

def get_datasets(args: Dict) -> Tuple[List[Volume], List[Volume]]:
    """(train, validation) volume lists for a settings dict.

    ``use_synthetic_data`` (or unavailable data dirs for the MNIST toys)
    routes to the procedural toy backend — the test/fixture path
    (SURVEY.md §4: MNIST3D-style synthetic data is the de-facto fake
    backend)."""
    dataset = args["dataset"]
    ds = int(args.get("downsample_steps") or 2)
    limited = bool(args.get("limited_load", False))

    if args.get("use_synthetic_data") or dataset in ("MNIST3D", "MNISTRoto"):
        width = int(args.get("aug_patch_size") or args.get("width", 64))
        n_train = 4 if limited else 12
        # a locally provided MNIST file (args or SR_MNIST_PATH) swaps the
        # procedural phantoms for real digits — the reference's exact
        # MNIST3D construction (datasets/MNIST/data.py:11-45)
        mnist_path = args.get("mnist_path")
        train = make_toy_dataset(n_train, size=width, num_slices=8 * ds + 1,
                                 seed=int(args.get("seed", 0)) % 100000,
                                 mnist_path=mnist_path,
                                 mnist_split="train")
        val = make_toy_dataset(2, size=width, num_slices=8 * ds + 1,
                               seed=int(args.get("seed", 0)) % 100000 + 999,
                               mnist_path=mnist_path, mnist_split="val")
        if dataset == "ACDCLBL":
            # the multichannel model needs a label channel: quantize the
            # phantom intensities into 4 pseudo-structures
            for vol in train + val:
                vol.labels = np.digitize(
                    vol.image, [0.25, 0.5, 0.75]).astype(np.int32)
        return train, val

    if dataset in ("OASIS", "dHCP", "ADNI", "brainMASI"):
        train = load_brain_volumes(dataset, ds, "training",
                                   limited_load=limited)
        val = load_brain_volumes(dataset, ds, "validation",
                                 limited_load=limited)
        return train, val

    if dataset == "ACDCLBL":
        # the multichannel (image+label) model needs labeled ED/ES frames
        train = load_acdc_labeled_volumes("training", limited_load=limited)
        val = load_acdc_labeled_volumes("validation", limited_load=limited)
        return train, val

    if dataset in ("ACDC", "ACDCC"):
        train = load_acdc_volumes("training", limited_load=limited)
        val = load_acdc_volumes("validation", limited_load=limited)
        return train, val

    raise ValueError(f"unknown dataset {dataset!r}")


# ---------------------------------------------------------------------------
# eval-only cardiac loaders (sunnybrook / ARVC) and dHCP preprocessing
# ---------------------------------------------------------------------------

SUNNYBROOK_SPACING = (8.0, 1.25, 1.25)


def load_sunnybrook_volumes(src_path: Optional[str] = None,
                            resample: bool = True,
                            rescale: bool = True,
                            limited_load: bool = False,
                            file_suffix: str = "_ES.mhd") -> List[Volume]:
    """Sunnybrook ED/ES short-axis MetaImage volumes (eval-only dataset;
    reference: datasets/sunnybrook/dataset.py:10-60 — fixed 8x1.25x1.25mm
    spacing, x-flip, optional 1.4mm in-plane resample + 1-99 rescale)."""
    cfg = get_config("sunnybrook")
    root = src_path or cfg.image_dir
    files = sorted(glob.glob(os.path.join(os.path.expanduser(root),
                                          "*" + file_suffix)))
    if not files:
        raise FileNotFoundError(f"no '*{file_suffix}' under {root}")
    if limited_load:
        files = files[:cfg.limited_load_max]
    volumes = []
    for fname in files:
        base = os.path.basename(fname)
        pid = base.replace(file_suffix, "")
        # anchored suffix swap on the BASENAME — a path component or
        # patient id containing 'ES' must not be rewritten. The phase
        # label comes FROM the suffix: a hardcoded 'ES' would mislabel
        # every volume of an ED-suffixed load (and a phase-less suffix
        # has no companion to derive)
        first = ("ES" if "ES" in file_suffix
                 else "ED" if "ED" in file_suffix else "")
        other = {"ES": "ED", "ED": "ES"}.get(first)
        phases = [(first, fname)]
        if other:
            comp_name = (base[: -len(file_suffix)]
                         + file_suffix.replace(first, other))
            comp_path = os.path.join(os.path.dirname(fname), comp_name)
        else:
            comp_path = None
        if comp_path and os.path.isfile(comp_path):
            phases.append((other, comp_path))
        elif comp_path:
            import warnings
            warnings.warn(f"sunnybrook: no {other} companion for {base} "
                          f"— loading {first} phase only", stacklevel=2)
        for phase, path in phases:
            arr, _sp, _ = read_image(path)
            arr = np.flip(arr.astype(np.float32), axis=2).copy()
            spacing = np.asarray(SUNNYBROOK_SPACING, np.float64)
            if resample and cfg.voxel_spacing_resample is not None:
                arr = apply_2d_zoom_3d(arr, spacing[-2:],
                                       cfg.voxel_spacing_resample)
                spacing = np.array([spacing[0],
                                    *cfg.voxel_spacing_resample], np.float64)
            if rescale:
                arr = rescale_intensities(arr, percs=(1, 99))
            volumes.append(Volume(image=arr.astype(np.float32),
                                  spacing=spacing,
                                  patient_id=(f"{pid}_{phase}" if phase
                                              else pid)))
    return volumes


def load_arvc_volumes(split: str = "training", limited_load: bool = False,
                      src_path: Optional[str] = None) -> List[Volume]:
    """ARVC 4D cardiac pairs — same per-frame pipeline as ACDC
    (reference: datasets/ARVC/dataset_sr.py, a subclass of the ACDC 4D
    pairs dataset)."""
    cfg = get_config("ARVC")
    root = src_path or cfg.image_dir
    return load_acdc_volumes(split=split, limited_load=limited_load,
                             src_path=root, dataset="ARVC")


def create_dhcp_dataset(src_path: str, out_path: str,
                        patch_size: int = 256,
                        background_threshold: float = 0.05) -> List[str]:
    """Crop raw dHCP volumes to the brain bounding box, zero the
    background, pad to patch_size and save
    (reference: datasets/dHCP/create_dataset.py:87-136 — the original
    uses nilearn's background mask; here a percentile-threshold mask
    (same outcome: brain bbox + zeroed background) since nilearn is not
    available)."""
    import scipy.ndimage as ndi

    src_path = os.path.expanduser(src_path)
    out_path = os.path.expanduser(out_path)
    os.makedirs(out_path, exist_ok=True)
    written = []
    for path in _find_files(src_path, ".nii.gz"):
        arr, spacing, _ = read_image(path)
        arr = arr.astype(np.float32)
        thr = background_threshold * np.percentile(arr, 99)
        mask = ndi.binary_fill_holes(
            ndi.binary_closing(arr > thr, iterations=2))
        if not mask.any():
            continue
        nz = np.nonzero(mask)
        sl = tuple(slice(int(a.min()), int(a.max()) + 1) for a in nz)
        cropped = np.where(mask[sl], arr[sl], 0.0).astype(np.float32)
        from .transforms import pad_to_size
        cropped = pad_to_size(cropped, patch_size)
        pid = _patient_id_from_file("dHCP", path)
        if os.path.basename(path).endswith("t2w.nii.gz"):
            out = os.path.join(out_path, os.path.basename(path))
        else:
            out = os.path.join(out_path, f"{pid}_t2w.nii.gz")
        if out in written or os.path.isfile(out):
            # several sessions/files of the same subject must not
            # silently overwrite each other — BOTH branches (same-named
            # t2w files from different source subdirs collide too):
            # uniquify from the full source stem, then a counter
            stem = os.path.basename(path)
            for ext in (".nii.gz", ".nii"):
                if stem.endswith(ext):
                    stem = stem[: -len(ext)]
                    break
            out = os.path.join(out_path, f"{stem}_t2w.nii.gz")
            k = 2
            while out in written or os.path.isfile(out):
                out = os.path.join(out_path,
                                   f"{stem}_{k}_t2w.nii.gz")
                k += 1
        write_image(out, cropped, spacing=spacing)
        written.append(out)
    return written


def create_split_file(out_path: str, patid_list: Sequence[str],
                      num_split=(200, 20, 20), seed: int = 1234) -> str:
    """Persist a training/validation/test patient split as yaml
    (reference: dHCP/create_dataset.py:139-166)."""
    rs = np.random.RandomState(seed)
    ids = list(patid_list)
    rs.shuffle(ids)
    n_tr, n_te, n_va = num_split
    split = {
        "training": ids[:n_tr],
        "test": ids[n_tr:n_tr + n_te],
        "validation": ids[n_tr + n_te:n_tr + n_te + n_va],
    }
    fname = os.path.join(os.path.expanduser(out_path), "train_test_split.yaml")
    with open(fname, "w") as fp:
        yaml.safe_dump(split, fp)
    return fname


def load_acdc_labeled_volumes(split: str = "training",
                              limited_load: bool = False,
                              src_path: Optional[str] = None) -> List[Volume]:
    """ACDC ED/ES frames with segmentation labels for the ACDCLBL
    multi-channel model (reference: datasets/ACDC/data_with_labels.py:14-276
    — 2-channel (image+label) volumes). Expects per-patient
    'patientXXX_frameYY.nii.gz' + '_gt' label files."""
    cfg = get_config("ACDCLBL")
    root = src_path or cfg.image_dir
    img_files = [f for f in _find_files(root, ".nii.gz")
                 if "_gt" not in f and "frame" in os.path.basename(f)]
    if not img_files:
        raise FileNotFoundError(f"no labeled ACDC frames under {root}")
    pids = [_patient_id_from_file("ACDC", f).split("_")[0]
            for f in img_files]
    if not (cfg.split_file and os.path.isfile(
            os.path.expanduser(cfg.split_file))):
        # keep the 12 native-5mm SR test patients out of ACDCLBL
        # training too (same default split as load_acdc_volumes)
        splits = acdc_default_split(pids)
    else:
        splits = _split_patients(pids, cfg.split_file)
    wanted = set(splits.get(split, []))
    sel = [(p, f) for p, f in zip(pids, img_files) if p in wanted]
    if limited_load:
        sel = sel[:cfg.limited_load_max]
    # decode images + their label companions through the shared native
    # thread pool in one pass
    gt_of = {p: p.replace(".nii.gz", "_gt.nii.gz") for _, p in sel}
    to_read = [p for _, p in sel] + [g for g in gt_of.values()
                                     if os.path.isfile(g)]
    decoded = _read_images_parallel(to_read)
    volumes = []
    for pid, path in sel:
        arr, spacing, _ = decoded[path]
        arr = arr.astype(np.float32)
        spacing = np.asarray(spacing, np.float64)
        gt_path = gt_of[path]
        labels = None
        if gt_path in decoded:
            lbl, _, _ = decoded[gt_path]
            labels = lbl.astype(np.int32)
        # in-plane resample to the shared 1.4mm grid like the plain ACDC
        # pipeline (reference passes new_spacing=(1,1.4,1.4) to the
        # labeled dataset too, train_cardiac_aesr.py:55-58); labels ride
        # along with order-0 lookup
        if cfg.voxel_spacing_resample is not None:
            new_sp = np.asarray(cfg.voxel_spacing_resample, np.float64)
            arr = apply_2d_zoom_3d(arr, spacing[-2:], new_sp)
            if labels is not None:
                labels = apply_2d_zoom_3d(labels, spacing[-2:], new_sp,
                                          do_blur=False, order=0,
                                          as_type=np.int32)
            spacing = spacing.copy()
            spacing[1:] = new_sp[-2:]
        arr = rescale_intensities(arr, percs=(1, 99))
        volumes.append(Volume(
            image=arr, spacing=spacing,
            patient_id=os.path.basename(path).replace(".nii.gz", ""),
            labels=labels))
    return volumes


# frames with invalid intensities to drop per patient
# (reference: datasets/ACDC/data.py:475-485 — patients 015/034 keep only
# the first 20 frames, patient 045 likewise)
ACDC_BAD_FRAME_LIMITS = {"patient015": 20, "patient034": 20,
                         "patient045": 20}


def acdc_frame_limit(patient_id: str) -> Optional[int]:
    for pid, limit in ACDC_BAD_FRAME_LIMITS.items():
        if pid in str(patient_id):
            return limit
    return None


def load_sax_volumes(root_dir: str, file_suffix: str = ".nii.gz",
                     resample: bool = True, rescale: bool = True,
                     new_spacing=(1.4, 1.4),
                     limited_load: bool = False,
                     limited_load_max: int = 5) -> List[Volume]:
    """Generic short-axis eval-only loader (PIE-style datasets —
    reference: datasets/cardiac_image.py:7-120, sax_dataset.py:9-140:
    read a directory of SAX volumes, resample in-plane, rescale)."""
    files = _find_files(root_dir, file_suffix)
    if not files:
        raise FileNotFoundError(f"no '*{file_suffix}' under {root_dir}")
    if limited_load:
        files = files[:limited_load_max]
    volumes = []
    for path in files:
        arr, spacing, _ = read_image(path)
        arr = arr.astype(np.float32)
        if arr.ndim == 4:
            arr = arr[0]
        if resample:
            arr = apply_2d_zoom_3d(arr, spacing[-2:], new_spacing)
            spacing = np.array([spacing[0], *new_spacing], np.float64)
        if rescale:
            arr = rescale_intensities(arr, percs=(1, 99))
        volumes.append(Volume(image=arr, spacing=np.asarray(spacing),
                              patient_id=os.path.basename(path)
                              .replace(file_suffix, "")))
    return volumes
