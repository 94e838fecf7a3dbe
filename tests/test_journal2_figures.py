"""Journal-2 figure page layouts render and save (Agg backend)."""
import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from superresolution_aniso_mri_tpu.evaluate import (  # noqa: E402
    boxplot_page, cardiac_lax_page, interpol_sequence_page, lambda_page,
    methods_comparison_page, reconstruction_page, upsample_factor_page,
)

RS = np.random.RandomState(0)


def _vals(n=8, lo=0.5, hi=1.0):
    return RS.uniform(lo, hi, n)


def _metrics(suffixes=("", "_synth")):
    return {m + s: _vals() for s in suffixes
            for m in ("ssim", "psnr", "vif")}


def test_upsample_factor_page(tmp_path):
    p = str(tmp_path / "k.png")
    model = {k: _metrics() for k in (2, 3, 4, 6)}
    conv = {m: {k: _metrics() for k in (2, 3, 4, 6)}
            for m in ("linear", "bspline")}
    fig = upsample_factor_page(model, conventional=conv, save_path=p)
    assert os.path.getsize(p) > 1000
    assert len(fig.axes) == 3


def test_lambda_page(tmp_path):
    p = str(tmp_path / "lam.png")
    res = {v: _metrics() for v in (0.001, 0.01, 0.1, 1.0)}
    fig = lambda_page(res, save_path=p)
    assert os.path.getsize(p) > 1000
    assert len(fig.axes) == 6  # 3 panels + 3 twin axes


def test_methods_comparison_page_with_diff_rows(tmp_path):
    p = str(tmp_path / "cmp.png")
    ref = RS.rand(9, 16, 16).astype(np.float32)
    methods = {"AISR": np.clip(ref + 0.02 * RS.randn(*ref.shape), 0, 1),
               "linear": np.clip(ref + 0.05 * RS.randn(*ref.shape), 0, 1)}
    fig = methods_comparison_page(ref, methods, save_path=p)
    assert os.path.getsize(p) > 1000
    # 1 ref row + 2x(image+diff) rows, 4 default slice columns
    assert len(fig.axes) == 5 * 4


def test_reconstruction_page_no_diff_rows(tmp_path):
    p = str(tmp_path / "rec.png")
    ref = RS.rand(9, 16, 16).astype(np.float32)
    fig = reconstruction_page(ref, {"AISR": ref.copy()}, save_path=p)
    assert len(fig.axes) == 2 * 4


def test_interpol_sequence_page(tmp_path):
    p = str(tmp_path / "seq.png")
    a, b = RS.rand(16, 16), RS.rand(16, 16)
    mids = RS.rand(3, 16, 16)
    fig = interpol_sequence_page(a, mids, b, save_path=p)
    assert os.path.getsize(p) > 1000
    # 5 panels; insets are child axes (counted by some mpl versions)
    assert len(fig.axes) >= 5
    n_insets = sum(len(ax.child_axes) for ax in fig.axes)
    assert n_insets == 5 or len(fig.axes) == 10


def test_boxplot_page(tmp_path):
    p = str(tmp_path / "box.png")
    res = {m: _metrics() for m in ("AISR", "linear", "lanczos")}
    fig = boxplot_page(res, save_path=p)
    assert os.path.getsize(p) > 1000
    assert len(fig.axes) == 6


def test_cardiac_lax_page(tmp_path):
    p = str(tmp_path / "lax.png")
    vols = {"reference": RS.rand(2, 20, 16, 16).astype(np.float32),
            "AISR": RS.rand(2, 20, 16, 16).astype(np.float32),
            "linear": RS.rand(20, 16, 16).astype(np.float32)}  # 3-D ok
    fig = cardiac_lax_page(vols, frame=1, save_path=p)
    assert os.path.getsize(p) > 1000
    assert len(fig.axes) == 3 * 3
