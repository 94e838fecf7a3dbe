"""Unit tests for tools/real_pipeline_quality.py helpers.

The end-to-end tool is exercised by hand (it trains for hours); these
pin the pure pieces: --reuse provenance overrides from the kept
experiment's settings.yaml and the training-timeout scaling.
"""
import argparse

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
