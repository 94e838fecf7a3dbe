"""Regression tests for the round-3 dataset-layer review fixes."""
import os

import numpy as np
import pytest
import yaml

from superresolution_aniso_mri_tpu.utils import write_nifti
from superresolution_aniso_mri_tpu.utils.nifti import write_metaimage


def test_acdclbl_loader_resamples_to_shared_grid(tmp_path):
    """ACDCLBL volumes resample in-plane to the config's 1.4mm grid like
    the plain ACDC pipeline (labels order-0), instead of keeping native
    per-patient spacing."""
    from superresolution_aniso_mri_tpu.data.datasets import (
        load_acdc_labeled_volumes,
    )

    rng = np.random.RandomState(0)
    pdir = tmp_path / "patient001"
    pdir.mkdir()
    img = (rng.rand(6, 20, 20) * 400).astype(np.float32)
    lbl = np.zeros((6, 20, 20), np.int32)
    lbl[:, 5:15, 5:15] = 2
    write_nifti(str(pdir / "patient001_frame01.nii.gz"), img,
                spacing=np.array([10.0, 1.6, 1.6]))
    write_nifti(str(pdir / "patient001_frame01_gt.nii.gz"), lbl,
                spacing=np.array([10.0, 1.6, 1.6]), dtype=np.int32)
    # patient001 lands in 'training' under the default 5mm split
    vols = load_acdc_labeled_volumes("training", src_path=str(tmp_path))
    assert len(vols) == 1
    v = vols[0]
    # 20 px at 1.6mm -> ~23 px at 1.4mm; labels ride along, integers
    assert v.image.shape[1] == round(20 * 1.6 / 1.4)
    assert v.labels is not None
    assert v.labels.shape == v.image.shape
    assert v.labels.dtype == np.int32
    assert set(np.unique(v.labels)) <= {0, 2}
    np.testing.assert_allclose(v.spacing[1:], [1.4, 1.4])


def test_acdcc_gets_bad_frame_trim(tmp_path):
    from superresolution_aniso_mri_tpu.data.datasets import (
        load_acdc_volumes,
    )

    rng = np.random.RandomState(1)
    pdir = tmp_path / "patient015"   # 20-frame bad-frame limit
    pdir.mkdir()
    vol4d = (rng.rand(25, 4, 12, 12) * 300).astype(np.float32)
    write_nifti(str(pdir / "patient015_4d.nii.gz"), vol4d,
                spacing=np.array([10.0, 1.4, 1.4]))
    # patient015 lands in 'training' under the default 5mm split
    for dataset in ("ACDC", "ACDCC"):
        vols = load_acdc_volumes("training", src_path=str(tmp_path),
                                 resample=False, rescale=False,
                                 dataset=dataset)
        assert len(vols) == 20, \
            f"{dataset}: bad frames beyond 20 must be trimmed"


def test_sunnybrook_suffix_without_es_loads_once(tmp_path):
    """A file_suffix without 'ES' must not re-load the same file as a
    fake ED companion."""
    from superresolution_aniso_mri_tpu.data.datasets import (
        load_sunnybrook_volumes,
    )

    rng = np.random.RandomState(2)
    write_metaimage(str(tmp_path / "pat1.mhd".replace(".mhd", ".mha")),
                    (rng.rand(5, 10, 10) * 200).astype(np.float32),
                    spacing=np.array([8.0, 1.25, 1.25]))
    vols = load_sunnybrook_volumes(file_suffix=".mha",
                                   src_path=str(tmp_path),
                                   resample=False)
    assert len(vols) == 1  # not duplicated as a phantom 'ED' copy


def test_brain_split_file_is_consumed(tmp_path, monkeypatch):
    """create_split_file output at <root>/train_test_split.yaml governs
    the split (was: written but never consumed)."""
    from superresolution_aniso_mri_tpu.data import simulate_thick_slices
    from superresolution_aniso_mri_tpu.data.datasets import (
        create_split_file, load_brain_volumes,
    )

    monkeypatch.setenv("SR_DATA_ROOT", str(tmp_path))
    root = tmp_path / "dHCP_cropped_256"
    root.mkdir()
    rng = np.random.RandomState(3)
    pids = []
    for i in range(4):
        pid = f"{1000 + i}"
        pids.append(pid)
        hr = rng.rand(9, 12, 12).astype(np.float32)
        write_nifti(str(root / f"{pid}_t2w_1.0mm.nii.gz"),
                    simulate_thick_slices(hr, 2.0),
                    spacing=np.array([0.5, 0.5, 0.5]))
    create_split_file(str(root), pids, num_split=(2, 1, 1), seed=7)
    with open(root / "train_test_split.yaml") as f:
        persisted = yaml.safe_load(f)
    # reload config so split_file resolves under the patched root
    import importlib
    import superresolution_aniso_mri_tpu.config.data_config as dc
    importlib.reload(dc)
    try:
        train = load_brain_volumes("dHCP", 2, split="training")
        val = load_brain_volumes("dHCP", 2, split="validation")
        assert sorted(v.patient_id for v in train) == \
            sorted(persisted["training"])
        assert sorted(v.patient_id for v in val) == \
            sorted(persisted["validation"])
    finally:
        monkeypatch.delenv("SR_DATA_ROOT")
        importlib.reload(dc)


def test_create_dhcp_dataset_uniquifies_collisions(tmp_path):
    from superresolution_aniso_mri_tpu.data.datasets import (
        create_dhcp_dataset,
    )

    rng = np.random.RandomState(4)
    src = tmp_path / "raw"
    for ses in ("ses-1", "ses-2", "ses-3"):
        d = src / "sub-001" / ses
        d.mkdir(parents=True)
        write_nifti(str(d / "t2.nii.gz"),
                    rng.rand(8, 16, 16).astype(np.float32))
    written = create_dhcp_dataset(str(src), str(tmp_path / "out"),
                                  patch_size=16)
    assert len(written) == 3
    assert len(set(written)) == 3, "colliding outputs were overwritten"
    for p in written:
        assert os.path.isfile(p)


def test_brainmasi_ancestor_dir_names_do_not_leak(tmp_path):
    """A data ROOT living under a directory named 'test' must not make
    every file match the test split."""
    from superresolution_aniso_mri_tpu.data.datasets import (
        load_brain_volumes,
    )

    root = tmp_path / "test" / "data"   # poisoned ancestor name
    (root / "Training").mkdir(parents=True)
    (root / "Test").mkdir(parents=True)
    rng = np.random.RandomState(5)
    write_nifti(str(root / "Training" / "01.nii.gz"),
                rng.rand(6, 12, 12).astype(np.float32))
    write_nifti(str(root / "Test" / "02.nii.gz"),
                rng.rand(6, 12, 12).astype(np.float32))
    train = load_brain_volumes("brainMASI", 3, split="training",
                               src_path=str(root))
    test = load_brain_volumes("brainMASI", 3, split="test",
                              src_path=str(root))
    assert [v.patient_id for v in train] == ["01"]
    assert [v.patient_id for v in test] == ["02"]
