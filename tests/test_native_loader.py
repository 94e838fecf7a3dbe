"""Native data-loader runtime (native/srloader.cc via ctypes): the C++
NIfTI decode, thread-pool ingest and batch gather must be exact drop-ins
for the pure-Python reference implementations."""
import os

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data import native_loader as nl
from superresolution_aniso_mri_tpu.utils.nifti import read_nifti, write_nifti

# lazy skip: available() triggers the native build (`make`, up to
# 300s) — evaluating it at collection would tax unrelated test
# selections on a cold checkout
@pytest.fixture(autouse=True)
def _require_native():
    if not nl.available():
        pytest.skip("native runtime unavailable (no g++/zlib)")


@pytest.fixture(scope="module")
def nifti_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("nifti")
    rng = np.random.RandomState(0)
    files = {}
    a = rng.rand(9, 20, 24).astype(np.float32)
    write_nifti(str(d / "f32.nii.gz"), a, spacing=[6.0, 1.25, 1.5])
    files["f32.nii.gz"] = str(d / "f32.nii.gz")
    b = (rng.rand(5, 8, 8) * 1000 - 300).astype(np.int16)
    write_nifti(str(d / "i16.nii"), b, spacing=[5.0, 1.0, 1.0],
                dtype=np.int16)
    files["i16.nii"] = str(d / "i16.nii")
    c = rng.rand(3, 4, 10, 12).astype(np.float32)
    write_nifti(str(d / "t4d.nii.gz"), c, spacing=[4.0, 1.0, 1.0])
    files["t4d.nii.gz"] = str(d / "t4d.nii.gz")
    return files


def test_native_read_matches_python_reader(nifti_files):
    for path in nifti_files.values():
        ref_arr, ref_sp, ref_aff = read_nifti(path)
        nat_arr, nat_sp, nat_aff = nl.read_nifti_native(path)
        assert nat_arr.dtype == np.float32
        assert nat_arr.shape == ref_arr.shape
        np.testing.assert_allclose(nat_arr, ref_arr.astype(np.float32))
        np.testing.assert_allclose(nat_sp, ref_sp)
        if ref_aff is None:
            assert nat_aff is None
        else:
            np.testing.assert_allclose(nat_aff, ref_aff, atol=1e-6)


def test_native_read_many_order_and_parallel(nifti_files):
    paths = list(nifti_files.values()) * 3
    results = nl.read_nifti_many(paths, nthreads=4)
    assert len(results) == len(paths)
    for p, (arr, sp, _aff) in zip(paths, results):
        ref_arr, ref_sp, _ = read_nifti(p)
        np.testing.assert_allclose(arr, ref_arr.astype(np.float32))
        np.testing.assert_allclose(sp, ref_sp)


def test_native_read_errors(tmp_path):
    with pytest.raises(IOError):
        nl.read_nifti_native(str(tmp_path / "missing.nii.gz"))
    bad = tmp_path / "bad.nii"
    bad.write_bytes(b"not a nifti at all" * 30)
    with pytest.raises(IOError):
        nl.read_nifti_native(str(bad))


def test_gather_matches_numpy_stack():
    rng = np.random.RandomState(1)
    vol = rng.rand(12, 17, 23).astype(np.float32)
    slices = [[vol[i], vol[i + 1], vol[i + 2], vol[i + 3]]
              for i in range(8)]
    got = nl.gather_triplets(slices)
    ref = np.stack([np.stack(ch, axis=-1) for ch in slices])
    np.testing.assert_array_equal(got, ref)


def test_sampler_batched_assembly_native_vs_fallback(monkeypatch):
    """TripletSampler batches must be bit-identical with and without the
    native gather (same seed → same RNG draw order → same indices)."""
    from superresolution_aniso_mri_tpu.data import TripletSampler, \
        make_toy_dataset

    vols = make_toy_dataset(num_volumes=2, size=24, num_slices=9, seed=3)
    s_native = TripletSampler(vols, downsample_steps=2, seed=5)
    b_native = s_native.sample_batch(6)

    monkeypatch.setattr(nl, "_lib", None)
    monkeypatch.setattr(nl, "_load_failed", True)
    s_py = TripletSampler(vols, downsample_steps=2, seed=5)
    b_py = s_py.sample_batch(6)
    for k in b_py:
        np.testing.assert_array_equal(b_native[k], b_py[k])


def test_load_brain_volumes_parallel_ingest(tmp_path, monkeypatch):
    """Directory ingest through the native thread pool returns the same
    volumes as the sequential Python path."""
    from superresolution_aniso_mri_tpu.config.data_config import get_config
    from superresolution_aniso_mri_tpu.data.datasets import (
        load_brain_volumes,
    )

    rng = np.random.RandomState(2)
    cfg = get_config("OASIS")
    suffix = cfg.lr_file_suffix(4)
    for i in range(4):
        arr = rng.rand(8, 16, 16).astype(np.float32)
        write_nifti(str(tmp_path / f"pat{i:02d}{suffix}"), arr,
                    spacing=[4.0, 1.0, 1.0])
        write_nifti(str(tmp_path / f"pat{i:02d}{cfg.img_file_ext}"), arr,
                    spacing=[1.0, 1.0, 1.0])

    kw = dict(split="training", include_hr_images=True,
              src_path=str(tmp_path))
    vols_native = load_brain_volumes("OASIS", 4, **kw)
    monkeypatch.setattr(nl, "_lib", None)
    monkeypatch.setattr(nl, "_load_failed", True)
    vols_py = load_brain_volumes("OASIS", 4, **kw)
    assert len(vols_native) == len(vols_py) > 0
    for a, b in zip(vols_native, vols_py):
        assert a.patient_id == b.patient_id
        np.testing.assert_array_equal(a.image, b.image)
        np.testing.assert_array_equal(a.image_hr, b.image_hr)
        np.testing.assert_allclose(a.spacing, b.spacing)
