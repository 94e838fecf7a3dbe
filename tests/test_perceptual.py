"""Encoder-backbone perceptual loss (ops/perceptual.py) — the
in-environment replacement for true pretrained-LPIPS (VERDICT r4 #2).

Reference hooks: lpips/networks_basic.py:19-100 (lin-over-backbone
mechanism), kwatsch/arguments.py:67-76 (the forced perceptual default
this loss makes meaningful again in a zero-egress environment).
"""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIPPED = os.path.join(REPO, "weights", "perceptual_enc.npz")


@pytest.fixture(scope="module")
def tiny_params():
    import jax
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
    from superresolution_aniso_mri_tpu.ops import perceptual as P

    cfg = AEConfig(width=64, latent_width=16, depth=8, latent=8,
                   colors=1, use_batchnorm=False, use_sigmoid=True)
    model = VanillaACAI(cfg)
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    return {
        "kind": "enc", "cfg": cfg,
        "variables": {"params": vars_["params"]["enc"]},
        "lins": P.uniform_lins(cfg), "meta": {},
    }, model, vars_


def test_feature_tap_preserves_latent(tiny_params):
    import jax
    import jax.numpy as jnp

    params, model, vars_ = tiny_params
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 1),
                    jnp.float32)
    z0 = model.apply(vars_, x, method=model.encode)
    z1, feats = model.apply(vars_, x, method=model.encode_features)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))
    # taps: both convs per scale + pre-head
    assert len(feats) == 2 * params["cfg"].scales + 1


def test_uniform_lins_match_tap_channels(tiny_params):
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.ops import perceptual as P

    params, model, vars_ = tiny_params
    x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    _, feats = model.apply(vars_, x, method=model.encode_features)
    assert [l.shape[0] for l in params["lins"]] == [
        f.shape[-1] for f in feats]


def test_distance_zero_on_identical_and_design_matrix_equivalence(
        tiny_params):
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.ops import perceptual as P

    params, _, _ = tiny_params
    rs = np.random.RandomState(1)
    a = jnp.asarray(rs.rand(2, 64, 64, 1), jnp.float32)
    b = jnp.asarray(np.clip(np.asarray(a) + 0.05 * rs.randn(2, 64, 64, 1),
                            0, 1), jnp.float32)
    d0 = np.asarray(P.enc_lpips_distance(params, a, a))
    np.testing.assert_allclose(d0, 0.0, atol=1e-8)
    d = np.asarray(P.enc_lpips_distance(params, a, b))
    assert (d > 0).all()
    V = np.asarray(P.enc_feature_diff_vectors(params, a, b))
    w = np.concatenate(params["lins"])
    np.testing.assert_allclose(V @ w, d, rtol=1e-4)


def test_save_load_roundtrip(tiny_params, tmp_path):
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.ops import perceptual as P

    params, _, _ = tiny_params
    path = str(tmp_path / "pe.npz")
    P.save_enc_perceptual(path, params["cfg"], params["variables"],
                          params["lins"], {"src": "test"})
    lp = P.load_enc_perceptual(path)
    assert lp["cfg"] == params["cfg"]
    assert lp["meta"]["src"] == "test"
    rs = np.random.RandomState(2)
    a = jnp.asarray(rs.rand(1, 64, 64, 1), jnp.float32)
    b = jnp.asarray(rs.rand(1, 64, 64, 1), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(P.enc_lpips_distance(params, a, b)),
        np.asarray(P.enc_lpips_distance(lp, a, b)), rtol=1e-6)


def test_gradient_finite_through_loss(tiny_params):
    import jax
    import jax.numpy as jnp

    from superresolution_aniso_mri_tpu.ops import perceptual as P

    params, _, _ = tiny_params
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 64, 64, 1), jnp.float32)
    # includes the all-zero-feature corner (black padding)
    y = jnp.concatenate([x[:1] * 0.0, x[1:] * 0.9], axis=0)
    g = jax.grad(lambda p: P.enc_perceptual_loss(params, p, x))(y)
    assert np.isfinite(np.asarray(g)).all()


def test_shipped_artifact_loads_and_is_calibrated():
    """weights/perceptual_enc.npz: loadable, MSE-magnitude-calibrated,
    provenance recorded."""
    from superresolution_aniso_mri_tpu.ops.perceptual import (
        get_enc_perceptual_params,
    )

    p = get_enc_perceptual_params(SHIPPED)
    assert p["meta"]["fit"]["mode"] in ("fitted", "uniform")
    assert p["meta"]["fit"].get("rank_accuracy", 1.0) > 0.85
    assert all((np.asarray(l) >= 0).all() for l in p["lins"])
    assert p["meta"]["seed_base"] == 1000  # fit set disjoint from gate


@pytest.mark.slow
def test_shipped_artifact_passes_quick_gate():
    """Quick-tier gap-study gate on the SHIPPED artifact: severity-
    monotone everywhere, tracks MS-SSIM strongly, and tracks VIF
    better than MSE does (the full-tier numbers — where it also beats
    MSE's MS-SSIM tracking 0.927 vs 0.914 — live in
    docs/lpips_gap.json)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from lpips_gap_study import run_study

    r = run_study(n_slices=3, size=96, seed=0, enc_npz=SHIPPED)
    for fam, frac in r["monotonic_families_enc"].items():
        assert frac == 1.0, (fam, r["monotonic_families_enc"])
    assert r["spearman"]["enc_vs_msssim"]["mean"] > 0.85
    assert (r["spearman"]["enc_vs_vif"]["mean"]
            > r["spearman"]["mse_vs_vif"]["mean"])
    assert (r["pairwise_agreement"]["enc_vs_vif"]["mean"]
            > r["pairwise_agreement"]["mse_vs_vif"]["mean"])


def test_trainer_wires_perceptual_enc(tmp_path):
    """image_mix_loss_func='perceptual_enc' loads the shipped artifact,
    records lpips_mode='encoder_backbone', and the jitted ae_combined
    step optimizes the loss."""
    import jax.random as jr

    from superresolution_aniso_mri_tpu.train.trainer import Trainer

    args = dict(model="ae_combined", dataset="OASIS", width=32,
                latent_width=16, depth=8, latent=8, batch_size=4,
                lr=1e-3, epochs=1, downsample_steps=2,
                image_mix_loss_func="perceptual_enc", use_batchnorm=0,
                output_dir=str(tmp_path), exper_id="s", seed=1)
    tr = Trainer(args)
    assert tr.args.get("lpips_mode") == "encoder_backbone"
    rs = np.random.RandomState(0)
    b = 4
    batch = {"image": rs.rand(2 * b, 32, 32, 1).astype(np.float32),
             "slice_between": rs.rand(b, 32, 32, 1).astype(np.float32),
             "alpha_from": np.full((b,), 0.5, np.float32),
             "alpha_to": np.full((b,), 0.5, np.float32)}
    losses = [float(tr.train(batch)["loss_ae"]) for _ in range(6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
