"""Regression tests for the round-3 session-4 review fixes
(sweep HBM bounds + prepare/evaluate split, shared kept-grid helper,
chunked combo predict, multi-channel patch helpers)."""
import warnings

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_kept_slice_grid_matches_manual_formula():
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        kept_slice_grid,
    )

    for s in (7, 8, 9, 25, 26):
        for ds in (2, 3, 4):
            img = np.arange(s * 4, dtype=np.float32).reshape(s, 2, 2)
            kept, remain = kept_slice_grid(img, ds)
            exp_remain = (s - 1) % ds
            exp = (img[:-exp_remain] if exp_remain else img)[::ds]
            assert remain == exp_remain
            np.testing.assert_array_equal(kept, exp)
            # kept grid always starts at slice 0 and keeps every ds-th
            assert kept.shape[0] == (s - 1) // ds + 1


def test_finite_mean_matches_masked_mean_semantics():
    """_finite_mean is the host twin of ops.masked_mean (drop non-finite,
    NaN on empty) — pin the two against each other so they cannot
    drift."""
    from superresolution_aniso_mri_tpu.evaluate.sweep import _finite_mean
    from superresolution_aniso_mri_tpu.ops import masked_mean

    vals = np.array([1.0, np.nan, 3.0, np.inf, -np.inf, 2.0], np.float32)
    got = _finite_mean(vals)
    ref = float(masked_mean(jnp.asarray(vals),
                            jnp.ones_like(jnp.asarray(vals))))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert np.isnan(_finite_mean(np.array([np.nan, np.inf], np.float32)))
    assert np.isnan(float(masked_mean(
        jnp.asarray([np.nan, np.inf]), jnp.ones((2,)))))


def test_predict_chunked_equals_unchunked():
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        _predict_chunked,
    )

    class _ArrayTrainer:
        def __init__(self):
            self.calls = []

        def predict(self, x):
            self.calls.append(int(x.shape[0]))
            return jnp.asarray(x) * 2.0

    kept = np.random.RandomState(0).rand(11, 4, 4, 1).astype(np.float32)
    t = _ArrayTrainer()
    out = _predict_chunked(t, kept, 4)
    assert t.calls == [4, 4, 3]  # bounded chunks, remainder last
    np.testing.assert_allclose(np.asarray(out), kept * 2.0, rtol=1e-6)
    # unchunked fast path: one call, same values
    t2 = _ArrayTrainer()
    out2 = _predict_chunked(t2, kept, None)
    assert t2.calls == [11]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))

    class _DictTrainer:
        def predict(self, x):
            x = jnp.asarray(x)
            return {"image": x * 0.5, "soft_probs": jnp.tile(x, (1, 1, 1, 3))}

    dt = _DictTrainer()
    d_chunk = _predict_chunked(dt, kept, 4)
    d_full = _predict_chunked(dt, kept, None)
    for k in ("image", "soft_probs"):
        np.testing.assert_allclose(np.asarray(d_chunk[k]),
                                   np.asarray(d_full[k]), rtol=1e-6)


def test_prepare_evaluate_split_reuses_prep_across_params():
    """prepare once, evaluate per checkpoint: the prep must be
    params-independent and two different param sets must actually score
    differently through the same prep."""
    from superresolution_aniso_mri_tpu.data import Volume
    from superresolution_aniso_mri_tpu.evaluate.sweep import (
        evaluate_prepared, evaluate_volumes_batched, prepare_sweep_batches,
    )
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4)
    model = VanillaACAI(cfg)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 16, 16, 1), jnp.float32)
    v1 = model.init(jax.random.PRNGKey(0), x, train=False)
    v2 = model.init(jax.random.PRNGKey(1), x, train=False)

    class _T:
        model_config = cfg

        def __init__(self, variables):
            self._v = variables

        def _ae_model(self):
            return model

        def _ae_params(self):
            return self._v["params"], self._v.get("batch_stats", {})

    vols = [Volume(patient_id=f"p{i}",
                   image=rs.rand(9, 16, 16).astype(np.float32),
                   spacing=np.ones(3, np.float32))
            for i in range(3)]
    t1, t2 = _T(v1), _T(v2)
    prep = prepare_sweep_batches(t1, vols, 2)
    r1 = evaluate_prepared(t1, prep)
    r2 = evaluate_prepared(t2, prep)
    assert set(r1) == {"p0", "p1", "p2"} and set(r2) == set(r1)
    # different weights → different scores through the SAME prep
    assert any(abs(r1[p]["ssim"] - r2[p]["ssim"]) > 1e-6 for p in r1)
    # and the one-shot wrapper agrees exactly with prepare+evaluate
    direct = evaluate_volumes_batched(t1, vols, 2)
    for p in r1:
        for k in r1[p]:
            np.testing.assert_allclose(direct[p][k], r1[p][k], rtol=1e-6,
                                       err_msg=f"{p}/{k}")


def test_patch_helpers_support_multichannel_models():
    from superresolution_aniso_mri_tpu.infer.patches import (
        reconstruct_in_patches,
    )

    class _Cfg:
        colors = 2

    class _T:
        model_config = _Cfg()

        def predict(self, x):
            # a colors=2 stem MUST receive 2 channels; decode returns the
            # MultiChannelAE-style dict
            assert x.shape[-1] == 2, x.shape
            # zero-padded label channel
            np.testing.assert_array_equal(np.asarray(x[..., 1]), 0.0)
            return {"image": jnp.asarray(x[..., :1]) * 0.5,
                    "soft_probs": jnp.zeros(x.shape[:-1] + (4,))}

    vol = np.random.RandomState(1).rand(3, 8, 8).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = reconstruct_in_patches(_T(), vol, patch=4)
    assert any("zeros" in str(x.message) for x in w)
    np.testing.assert_allclose(out, vol * 0.5, rtol=1e-6)
