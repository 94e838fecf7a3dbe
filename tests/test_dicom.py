"""Built-in DICOM reader tests against hand-encoded Part-10 files
(written by an independent byte-level encoder below, NOT the reader's
own code)."""
import os
import struct

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.utils.dicom import (
    DicomError, read_dicom, read_dicom_series,
)

EXPLICIT_LE = b"1.2.840.10008.1.2.1"
IMPLICIT_LE = b"1.2.840.10008.1.2"


def _elem_explicit(group, elem, vr, value):
    if len(value) % 2:
        value += b" " if vr in (b"UI", b"DS", b"IS", b"CS", b"LO") else b"\x00"
    head = struct.pack("<HH", group, elem) + vr
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + struct.pack("<H", len(value)) + value


def _elem_implicit(group, elem, value):
    if len(value) % 2:
        value += b"\x00"
    return (struct.pack("<HH", group, elem)
            + struct.pack("<I", len(value)) + value)


def _write_dicom(path, pixels, *, implicit=False, instance=1, zpos=None,
                 spacing=(1.5, 1.5), slope=None, intercept=None,
                 series_uid=b"1.2.3.4"):
    rows, cols = pixels.shape
    meta = _elem_explicit(0x0002, 0x0010, b"UI",
                          IMPLICIT_LE if implicit else EXPLICIT_LE)
    e = _elem_implicit if implicit else (
        lambda g, el, value, vr=None: _elem_explicit(g, el, vr, value))

    def elem(g, el, vr, value):
        if implicit:
            return _elem_implicit(g, el, value)
        return _elem_explicit(g, el, vr, value)

    body = b""
    body += elem(0x0008, 0x0060, b"CS", b"MR")
    body += elem(0x0020, 0x000E, b"UI", series_uid)
    body += elem(0x0020, 0x0013, b"IS", str(instance).encode())
    if zpos is not None:
        body += elem(0x0020, 0x0032, b"DS",
                     f"0.0\\0.0\\{zpos}".encode())
    body += elem(0x0018, 0x0050, b"DS", b"3.0")
    body += elem(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += elem(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem(0x0028, 0x0030, b"DS",
                 f"{spacing[0]}\\{spacing[1]}".encode())
    body += elem(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += elem(0x0028, 0x0103, b"US",
                 struct.pack("<H", 1 if pixels.dtype == np.int16 else 0))
    if intercept is not None:
        body += elem(0x0028, 0x1052, b"DS", str(intercept).encode())
    if slope is not None:
        body += elem(0x0028, 0x1053, b"DS", str(slope).encode())
    body += elem(0x7FE0, 0x0010, b"OW", pixels.tobytes())
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)


def test_read_explicit_le(tmp_path):
    px = (np.arange(48, dtype=np.uint16).reshape(6, 8) * 7)
    p = str(tmp_path / "a.dcm")
    _write_dicom(p, px, zpos=10.0)
    d = read_dicom(p)
    np.testing.assert_allclose(d["pixel_array"], px.astype(np.float32))
    assert d["PixelSpacing"] == [1.5, 1.5]
    assert d["ImagePositionPatient"][2] == 10.0
    assert d["Modality"] == "MR"


def test_read_implicit_le_signed_with_rescale(tmp_path):
    px = (np.arange(-24, 24, dtype=np.int16).reshape(6, 8))
    p = str(tmp_path / "b.dcm")
    _write_dicom(p, px, implicit=True, slope=2.0, intercept=-100.0)
    d = read_dicom(p)
    np.testing.assert_allclose(d["pixel_array"],
                               px.astype(np.float32) * 2.0 - 100.0)


def test_not_dicom_raises(tmp_path):
    p = str(tmp_path / "x.dcm")
    with open(p, "wb") as f:
        f.write(b"not dicom" * 30)
    with pytest.raises(DicomError, match="Part-10"):
        read_dicom(p)


def test_series_orders_by_z_not_filename(tmp_path):
    rs = np.random.RandomState(0)
    imgs = [(rs.rand(4, 4) * 1000).astype(np.uint16) for _ in range(3)]
    # filenames shuffled vs z order; z spacing 2.5
    for fname, (i, z) in zip(("c.dcm", "a.dcm", "b.dcm"),
                             ((2, 5.0), (0, 0.0), (1, 2.5))):
        _write_dicom(str(tmp_path / fname), imgs[i], instance=i + 1,
                     zpos=z)
    vol, spacing = read_dicom_series(str(tmp_path))
    assert vol.shape == (3, 4, 4)
    for i in range(3):
        np.testing.assert_allclose(vol[i], imgs[i].astype(np.float32))
    np.testing.assert_allclose(spacing, [2.5, 1.5, 1.5])


def test_dicom_series_to_nifti_builtin_fallback(tmp_path):
    """dicom_series_to_nifti must work WITHOUT pydicom via the built-in
    reader (pydicom is not bundled in this environment)."""
    with pytest.raises(ImportError):
        import pydicom  # noqa: F401
        pytest.skip("pydicom installed; fallback path not exercised")

    from superresolution_aniso_mri_tpu.utils.image_misc import (
        dicom_series_to_nifti,
    )
    from superresolution_aniso_mri_tpu.utils import read_nifti

    rs = np.random.RandomState(1)
    for i in range(4):
        _write_dicom(str(tmp_path / f"s{i}.dcm"),
                     (rs.rand(5, 6) * 500).astype(np.uint16),
                     instance=i + 1, zpos=3.0 * i)
    out = str(tmp_path / "vol.nii.gz")
    dicom_series_to_nifti(str(tmp_path), out)
    arr, spacing, _ = read_nifti(out)
    assert arr.shape == (4, 5, 6)
    np.testing.assert_allclose(spacing, [3.0, 1.5, 1.5])


def test_nested_undefined_length_sequence_skipped(tmp_path):
    """An undefined-length sequence CONTAINING an undefined-length
    sequence must be skipped to the OUTER delimiter — stopping at the
    inner (FFFE,E0DD) would resume parsing mid-sequence."""
    px = (np.arange(16, dtype=np.uint16).reshape(4, 4) * 3)
    rows, cols = px.shape
    undef = struct.pack("<I", 0xFFFFFFFF)

    def sq_undefined(inner):
        # explicit SQ, undefined length, one undefined-length item
        return (struct.pack("<HH", 0x0008, 0x1140) + b"SQ\x00\x00" + undef
                + struct.pack("<HH", 0xFFFE, 0xE000) + undef
                + inner
                + struct.pack("<HH", 0xFFFE, 0xE00D) + b"\x00" * 4
                + struct.pack("<HH", 0xFFFE, 0xE0DD) + b"\x00" * 4)

    inner_sq = sq_undefined(_elem_explicit(0x0008, 0x0060, b"CS", b"MR"))
    body = sq_undefined(inner_sq)                      # nested!
    body += _elem_explicit(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += _elem_explicit(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += _elem_explicit(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += _elem_explicit(0x0028, 0x0030, b"DS", b"1.0\\1.0 ")
    body += _elem_explicit(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _elem_explicit(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += _elem_explicit(0x7FE0, 0x0010, b"OW", px.tobytes())
    meta = _elem_explicit(0x0002, 0x0010, b"UI", EXPLICIT_LE)
    p = str(tmp_path / "nested.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    d = read_dicom(p)
    np.testing.assert_allclose(d["pixel_array"], px.astype(np.float32))
