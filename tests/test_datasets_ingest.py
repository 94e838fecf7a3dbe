"""On-disk dataset ingest tests using synthetic NIfTI fixtures."""
import os

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data.datasets import (
    load_brain_volumes, create_lr_dataset, create_dhcp_dataset,
    create_split_file, load_acdc_volumes, load_sax_volumes,
    acdc_frame_limit, _split_patients,
)
from superresolution_aniso_mri_tpu.data import simulate_thick_slices
from superresolution_aniso_mri_tpu.utils import read_nifti, write_nifti


def _write_oasis_tree(root, n_patients=4, ds=3):
    """OASIS-style files: OAS1_<id>_MR1 ... t88_gfc.nii.gz (+_3mm LR)."""
    rng = np.random.RandomState(0)
    for i in range(n_patients):
        pdir = os.path.join(root, f"OAS1_{i:04d}_MR1")
        os.makedirs(pdir, exist_ok=True)
        hr = rng.rand(12, 16, 16).astype(np.float32)
        write_nifti(os.path.join(pdir, f"OAS1_{i:04d}_MR1_t88_gfc.nii.gz"),
                    hr, spacing=np.array([1.0, 1.0, 1.0]))
        lr = simulate_thick_slices(hr, float(ds))
        write_nifti(os.path.join(
            pdir, f"OAS1_{i:04d}_MR1_t88_gfc_{ds}mm.nii.gz"),
            lr, spacing=np.array([1.0, 1.0, 1.0]))


def test_load_brain_volumes_oasis_style(tmp_path):
    root = str(tmp_path)
    _write_oasis_tree(root, n_patients=5, ds=3)
    vols = load_brain_volumes("OASIS", 3, split="training",
                              include_hr_images=True, src_path=root)
    assert len(vols) >= 1
    v = vols[0]
    assert v.image.shape == (12, 16, 16)
    assert v.image_hr is not None
    assert v.patient_id.startswith("OAS1_")


def test_create_lr_dataset_roundtrip(tmp_path):
    root = str(tmp_path)
    rng = np.random.RandomState(1)
    pdir = os.path.join(root, "OAS1_0001_MR1")
    os.makedirs(pdir)
    hr = rng.rand(10, 8, 8).astype(np.float32)
    write_nifti(os.path.join(pdir, "OAS1_0001_MR1_t88_gfc.nii.gz"), hr,
                spacing=np.array([1.0, 1.0, 1.0]))
    written = create_lr_dataset("OASIS", 4, src_path=root)
    assert len(written) == 1
    assert written[0].endswith("_4mm.nii.gz")
    lr, sp, _ = read_nifti(written[0])
    np.testing.assert_allclose(lr, simulate_thick_slices(hr, 4.0),
                               atol=1e-5)


def test_create_dhcp_dataset(tmp_path):
    src = tmp_path / "raw"
    out = tmp_path / "crop"
    os.makedirs(src)
    rng = np.random.RandomState(2)
    vol = np.zeros((10, 24, 24), np.float32)
    vol[2:8, 6:18, 6:18] = rng.rand(6, 12, 12) * 0.8 + 0.2  # "brain"
    write_nifti(str(src / "1234_t2w.nii.gz"), vol,
                spacing=np.array([0.5, 0.5, 0.5]))
    written = create_dhcp_dataset(str(src), str(out), patch_size=16)
    assert len(written) == 1
    arr, _, _ = read_nifti(written[0])
    assert arr.shape[1] == 16 and arr.shape[2] == 16


def test_create_split_file(tmp_path):
    ids = [f"p{i:03d}" for i in range(20)]
    fname = create_split_file(str(tmp_path), ids, num_split=(12, 4, 4))
    import yaml
    with open(fname) as fp:
        split = yaml.safe_load(fp)
    assert len(split["training"]) == 12
    assert len(split["test"]) == 4
    assert len(split["validation"]) == 4
    assert not (set(split["training"]) & set(split["test"]))


def test_load_acdc_volumes_4d(tmp_path):
    rng = np.random.RandomState(3)
    for i in (1, 15):
        pdir = tmp_path / f"patient{i:03d}"
        os.makedirs(pdir)
        vol4d = (rng.rand(25, 6, 20, 20) * 500).astype(np.float32)
        write_nifti(str(pdir / f"patient{i:03d}_4d.nii.gz"), vol4d,
                    spacing=np.array([10.0, 1.6, 1.6]))
    # use a split file covering both patients as training
    import yaml
    split = {"training": ["patient001_4d", "patient015_4d"],
             "validation": [], "test": []}
    os.environ["SR_DATA_ROOT"] = str(tmp_path / "nonexist")
    vols = load_acdc_volumes("training", src_path=str(tmp_path),
                             resample=True, rescale=True)
    # patient015: bad-frame limit 20 → 20 frames; patient001 → 25 frames
    # (generic seeded split may drop one patient; at least one must load)
    assert len(vols) >= 20
    v = vols[0]
    # resampled in-plane to 1.4mm: 20 * 1.6 / 1.4 ≈ 22.8 → 22/23 px
    assert v.image.shape[0] == 6
    assert v.image.shape[1] in (22, 23)
    assert 0.0 <= v.image.min() and v.image.max() <= 1.0
    assert acdc_frame_limit("patient015_4d") == 20
    n015 = sum(1 for v in vols if "patient015" in v.patient_id)
    assert n015 in (0, 20)


def test_load_sax_volumes(tmp_path):
    rng = np.random.RandomState(4)
    write_nifti(str(tmp_path / "case1.nii.gz"),
                (rng.rand(5, 20, 20) * 300).astype(np.float32),
                spacing=np.array([8.0, 1.6, 1.6]))
    vols = load_sax_volumes(str(tmp_path), resample=True, rescale=True)
    assert len(vols) == 1
    assert vols[0].image.max() <= 1.0


def test_split_patients_yaml_and_fallback(tmp_path):
    ids = [f"p{i}" for i in range(10)]
    split = _split_patients(ids, None)
    assert len(split["training"]) == 8
    yaml_file = tmp_path / "split.yaml"
    yaml_file.write_text("training: [p0, p1]\nvalidation: [p2]\ntest: [p3]\n")
    split2 = _split_patients(ids, str(yaml_file))
    assert split2["training"] == ["p0", "p1"]


def test_split_patients_small_cohorts_never_empty():
    """int() flooring must not zero out validation/test for small
    cohorts (8 patients at 0.8/0.1/0.1 floored to 6/0/2 and crashed the
    val sampler); every split is non-empty from 3 patients up."""
    for n in (3, 4, 8, 24):
        split = _split_patients([f"p{i}" for i in range(n)], None)
        assert all(split[k] for k in ("training", "validation", "test")), \
            (n, split)
        assert sum(len(v) for v in split.values()) == n


def test_acdc_default_split_puts_5mm_patients_in_test(tmp_path):
    """With no on-disk split file, the 12 native-5mm patients form the
    SR test split (reference: data.py:21-23, 163-195); ids strip the
    '_4d' filename suffix so they match reference split files."""
    from superresolution_aniso_mri_tpu.data.datasets import (
        ACDC_5MM_PATIENTS, acdc_default_split, _patient_id_from_file,
    )

    assert _patient_id_from_file("ACDC", "/x/patient004_4d.nii.gz") == \
        "patient004"
    pids = [f"patient{i:03d}" for i in range(1, 101)]
    splits = acdc_default_split(pids)
    assert set(splits["test"]) == {f"patient{p:03d}"
                                  for p in ACDC_5MM_PATIENTS}
    assert len(splits["training"]) == 70
    assert len(splits["validation"]) == 100 - 12 - 70
    # end-to-end: a 5mm patient's file lands in the test split
    rng = np.random.RandomState(0)
    for pat in (4, 5, 7, 8):
        write_nifti(str(tmp_path / f"patient{pat:03d}_4d.nii.gz"),
                    rng.rand(2, 6, 8, 8).astype(np.float32),
                    spacing=np.array([5.0, 1.4, 1.4]))
    test_vols = load_acdc_volumes(split="test", src_path=str(tmp_path),
                                  resample=False, rescale=False)
    pats = {v.patient_id.split("_f")[0] for v in test_vols}
    assert pats == {"patient004", "patient005"}


def test_create_lr_dataset_rerun_skips_generated_lr(tmp_path):
    """A second create_lr_dataset run must not re-blur previously
    written '_Kmm' LR outputs into doubly-blurred files."""
    root = str(tmp_path)
    rng = np.random.RandomState(2)
    pdir = os.path.join(root, "OAS1_0002_MR1")
    os.makedirs(pdir)
    write_nifti(os.path.join(pdir, "OAS1_0002_MR1_t88_gfc.nii.gz"),
                rng.rand(8, 8, 8).astype(np.float32))
    first = create_lr_dataset("OASIS", 2, src_path=root)
    second = create_lr_dataset("OASIS", 4, src_path=root)
    assert len(first) == 1 and len(second) == 1
    names = sorted(os.listdir(pdir))
    assert not any("_2mm_4mm" in n for n in names), names


def test_brainmasi_loads_plain_hr_volumes(tmp_path):
    """brainMASI rides plain HR .nii files (reference downsamples at
    sample time) — previously lr_file_suffix raised for it."""
    rng = np.random.RandomState(3)
    for i in range(3):
        write_nifti(str(tmp_path / f"{i:02d}.nii.gz"),
                    rng.rand(10, 12, 12).astype(np.float32))
    vols = load_brain_volumes("brainMASI", 3, split="training",
                              src_path=str(tmp_path))
    assert len(vols) >= 1


def test_split_mismatch_warns_instead_of_silent_empty(tmp_path):
    import warnings
    import yaml

    root = str(tmp_path)
    _write_oasis_tree(root, n_patients=3, ds=3)
    split_file = str(tmp_path / "split.yaml")
    with open(split_file, "w") as fp:
        yaml.safe_dump({"training": ["nonexistent_patient"]}, fp)
    from unittest import mock

    import superresolution_aniso_mri_tpu.data.datasets as ds_mod
    cfg = ds_mod.get_config("OASIS")
    cfg.split_file = split_file
    with mock.patch.object(ds_mod, "get_config", return_value=cfg):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            vols = load_brain_volumes("OASIS", 3, split="training",
                                      src_path=root)
    assert vols == []
    assert any("selected 0 of" in str(x.message) for x in w)


def test_brainmasi_directory_split_is_respected(tmp_path):
    """brainMASI's curated Training/Test directory layout IS the split
    — a random re-split would leak test patients into training."""
    rng = np.random.RandomState(5)
    for d, n in (("training", 3), ("test", 2)):
        os.makedirs(tmp_path / d / "images")
        for i in range(n):
            write_nifti(str(tmp_path / d / "images" / f"{d[:2]}{i}.nii.gz"),
                        rng.rand(8, 12, 12).astype(np.float32))
    tr = load_brain_volumes("brainMASI", 3, split="training",
                            src_path=str(tmp_path))
    te = load_brain_volumes("brainMASI", 3, split="test",
                            src_path=str(tmp_path))
    assert {v.patient_id for v in tr} == {"tr0", "tr1", "tr2"}
    assert {v.patient_id for v in te} == {"te0", "te1"}
    # and "HR" must never be the LR volume itself
    tr_hr = load_brain_volumes("brainMASI", 3, split="training",
                               src_path=str(tmp_path),
                               include_hr_images=True)
    assert all(v.image_hr is None for v in tr_hr)


def test_create_lr_dataset_refuses_inplace_overwrite(tmp_path):
    """Datasets whose LR suffix equals the file extension train from HR
    volumes — generating 'LR' files would overwrite the sources."""
    write_nifti(str(tmp_path / "00.nii.gz"),
                np.random.RandomState(6).rand(6, 8, 8).astype(np.float32))
    with pytest.raises(ValueError, match="overwrite"):
        create_lr_dataset("brainMASI", 3, src_path=str(tmp_path))


def test_create_dhcp_dataset_keeps_t2w_suffix(tmp_path):
    """Cropped dHCP outputs must keep the t2w suffix the dHCP config
    globs for — and distinct sessions must not collide."""
    src = tmp_path / "raw"
    out = tmp_path / "crop"
    os.makedirs(src)
    rng = np.random.RandomState(7)
    for name in ("subA_ses1_t2w.nii.gz", "subA_ses2_t2w.nii.gz"):
        vol = np.zeros((8, 40, 40), np.float32)
        vol[:, 10:30, 10:30] = rng.rand(8, 20, 20)
        write_nifti(str(src / name), vol)
    written = create_dhcp_dataset(str(src), str(out), patch_size=32)
    names = sorted(os.path.basename(w) for w in written)
    assert names == ["subA_ses1_t2w.nii.gz", "subA_ses2_t2w.nii.gz"]
