"""Regression tests for the round-2b reference-parity fixes in
train/steps.py (laplacian-with-perceptual, latent monitors, extra latent
loss for vae/acai, alpha-family gradient stops and weights, probe-aware
validation, alpha_features plumbing)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
from superresolution_aniso_mri_tpu.train import (
    LossConfig, Trainer, create_train_state, make_train_step,
)
from superresolution_aniso_mri_tpu.train.steps import make_eval_step


def _batch(b=4, w=16, seed=0, feats=False):
    rng = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(rng.rand(2 * b, w, w, 1), jnp.float32),
        "slice_between": jnp.asarray(rng.rand(b, w, w, 1), jnp.float32),
        "alpha_from": jnp.full((b,), 0.5), "alpha_to": jnp.full((b,), 0.5),
    }
    if feats:
        batch["alpha_features"] = jnp.asarray(rng.rand(b, 5), jnp.float32)
    return batch


def _model_state(use_batchnorm=False):
    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4, colors=1,
                   use_batchnorm=use_batchnorm, use_sigmoid=True)
    model = VanillaACAI(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 1)), lr=1e-3)
    return cfg, model, state


def test_laplacian_applies_with_perceptual_recon_loss():
    """Reference computes the laplacian term outside the perceptual/mse
    dispatch and always adds it (base_trainer.py:183-186)."""
    from superresolution_aniso_mri_tpu.ops import get_lpips_params

    cfg, model, state = _model_state()
    lp = get_lpips_params()
    batch = _batch()
    m_lap = make_train_step(model, LossConfig(
        model="ae", recon_loss="perceptual", use_laploss=True),
        lp, donate=False)(state, batch, jax.random.PRNGKey(1),
                          jnp.float32(0.01))[1]
    assert float(m_lap["loss_laploss"]) > 0
    np.testing.assert_allclose(
        float(m_lap["loss_ae"]),
        float(m_lap["loss_ae_dist"]) + float(m_lap["loss_laploss"]),
        rtol=1e-5)


@pytest.mark.parametrize("model_name", ["vae_combined", "acai_combined"])
def test_extra_latent_loss_engages_for_vae_and_acai(model_name):
    """--use_extra_latent_loss must change the trained objective for the
    vae/acai combined families (reference: both inherit
    AETrainerExtension1Brain.get_extra_loss)."""
    args = {
        "dataset": "MNIST3D", "model": model_name,
        "ae_class": "VanillaACAI", "width": 16, "latent_width": 8,
        "depth": 4, "latent": 4, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 1,
        "epoch_threshold": -1, "ex_loss_weight1": 0.05,
        "use_batchnorm": False, "use_sigmoid": True,
        "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
        "output_dir": None, "vae_beta": 1.0, "lamb": 1.0,
    }
    batch = _batch()
    m_off = Trainer(dict(args)).train(dict(batch))
    m_on = Trainer(dict(args, use_extra_latent_loss=True)).train(dict(batch))
    assert not np.isclose(float(m_on["loss_ae"]), float(m_off["loss_ae"]))
    assert "loss_latent_2" in m_on and "loss_latent_2" not in m_off
    # monitored latent signal is real (not a constant 0)
    assert float(m_off["loss_latent_1"]) > 0


def test_multichannel_logs_recon_only_loss_ae_and_latent():
    """loss_ae excludes the dice term (logged separately as loss_label,
    reference sr_multi_channel/trainer_ae.py:109-110) and loss_latent_1
    is a real monitor."""
    t = Trainer({
        "dataset": "ACDCLBL", "model": "ae_combined",
        "ae_class": "MultiChannelAE", "width": 16, "latent_width": 8,
        "depth": 4, "latent": 4, "colors": 2, "nclasses": 4, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 1,
        "epoch_threshold": -1, "ex_loss_weight1": 0.05,
        "use_batchnorm": False, "use_sigmoid": True,
        "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
        "output_dir": None,
    })
    rng = np.random.RandomState(0)
    b, w = 4, 16
    img = rng.rand(2 * b, w, w, 1).astype(np.float32)
    lbl = rng.randint(0, 4, (2 * b, w, w, 1)).astype(np.float32)
    batch = {
        "image": jnp.asarray(np.concatenate([img, lbl], -1)),
        "slice_between": jnp.asarray(
            np.concatenate([img[:b], lbl[:b]], -1)),
        "alpha_from": jnp.full((b,), 0.5), "alpha_to": jnp.full((b,), 0.5),
    }
    m = t.train(batch)
    # loss_ae == recon-only (dist + lap); the dice lives in loss_label
    np.testing.assert_allclose(
        float(m["loss_ae"]),
        float(m["loss_ae_dist"]) + float(m["loss_laploss"]), rtol=1e-5)
    # the reference dice loss is NEGATIVE soft dice (dice_loss.py:22)
    assert float(m["loss_label"]) != 0
    assert float(m["loss_latent_1"]) > 0


def _alpha_trainer(model_name, use_batchnorm=False):
    return Trainer({
        "dataset": "MNIST3D", "model": model_name,
        "ae_class": "VanillaACAI", "alpha_class": "AlphaProbe16v1",
        "width": 16, "latent_width": 8, "depth": 4, "latent": 4,
        "colors": 1, "lr": 1e-2, "weight_decay": 0.0, "batch_size": 4,
        "epochs": 1, "epoch_threshold": -1, "use_batchnorm": use_batchnorm,
        "use_sigmoid": True, "alpha_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": None,
    })


def test_alpha_variant_trains_encoder_via_latent_loss():
    """Variant 'alpha': z_mix keeps LIVE latents (only the probe input is
    detached, base_alpha_trainer.py:106), so the encoder receives the
    latent-loss gradient — its update must differ from a pure-recon
    'ae'-family step on the same batch."""
    cfg, model, state = _model_state()
    from superresolution_aniso_mri_tpu.models import make_alpha_probe
    from superresolution_aniso_mri_tpu.train.state import (
        SRTrainState, make_optimizer,
    )

    probe = make_alpha_probe("AlphaProbe16v1", cfg, additional_dims=5)
    v_probe = probe.init(jax.random.PRNGKey(1), jnp.zeros((2, 8, 8, 8)),
                         jnp.zeros((2, 5)))
    astate = SRTrainState.create(
        apply_fn=model.apply,
        params={"ae": state.params, "probe": v_probe["params"]},
        tx=make_optimizer(1e-2), batch_stats={"ae": {}, "probe": {}})
    batch = _batch(feats=True)

    step_alpha = make_train_step(
        {"ae": model, "probe": probe},
        LossConfig(model="alpha", recon_loss="mse",
                   image_mix_loss_func="mse", num_alphas=8, latent=4),
        donate=False)
    s1, _ = step_alpha(astate, batch, jax.random.PRNGKey(2),
                       jnp.float32(0.01))

    # same AE, same batch, recon-only objective
    step_ae = make_train_step(model, LossConfig(model="ae",
                                                recon_loss="mse"),
                              donate=False)
    s_ae, _ = step_ae(state.replace(tx=make_optimizer(1e-2),
                                    opt_state=make_optimizer(1e-2).init(
                                        state.params)),
                      batch, jax.random.PRNGKey(2), jnp.float32(0.01))

    enc_alpha = jax.tree_util.tree_leaves(s1.params["ae"])
    enc_ae = jax.tree_util.tree_leaves(s_ae.params)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-7
               for a, b in zip(enc_alpha, enc_ae)), \
        "latent loss must reach the encoder for variant 'alpha'"


def test_alpha_only_image_weight_is_0005():
    """loss_ae_extra = 0.005*image + 0.5*(latent1+latent2)
    (reference: trainer_alpha_only.py:84)."""
    t = _alpha_trainer("alpha_only")
    m = t.train(_batch(feats=True))
    np.testing.assert_allclose(
        float(m["loss_ae_extra"]),
        0.005 * float(m["loss_ae_dist_extra"])
        + 0.5 * (float(m["loss_latent_1"]) + float(m["loss_latent_2"])),
        rtol=1e-5)


def test_alpha_combined_decoder_mix_batchnorm_stats_update():
    """decoder_mix's mutated BN stats must be committed to the train
    state (they were silently dropped before)."""
    t = _alpha_trainer("alpha_combined", use_batchnorm=True)
    before = jax.tree_util.tree_leaves(
        t.state.batch_stats["decoder_mix"])
    before = [np.array(x) for x in before]
    t.train(_batch(feats=True))
    after = jax.tree_util.tree_leaves(t.state.batch_stats["decoder_mix"])
    assert any(np.abs(np.asarray(a) - b).max() > 1e-9
               for a, b in zip(after, before)), \
        "decoder_mix batch stats must advance during training"


def test_alpha_only_keeps_ae_batchnorm_stats_frozen():
    """alpha_only keeps the loaded AE in eval mode — its BN running
    stats must NOT drift (reference: trainer_alpha_only.py:22)."""
    t = _alpha_trainer("alpha_only", use_batchnorm=True)
    before = [np.array(x) for x in
              jax.tree_util.tree_leaves(t.state.batch_stats["ae"])]
    for _ in range(3):
        t.train(_batch(feats=True))
    after = jax.tree_util.tree_leaves(t.state.batch_stats["ae"])
    for a, b in zip(after, before):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_alpha_eval_measures_trained_probe():
    """Validation must route through the probe: perturbing ONLY the
    probe params must change the validation synthesis metric (the old
    eval used a fixed 0.5 mix, making caisr.models selection blind to
    the probe)."""
    t = _alpha_trainer("alpha_end_to_end")
    batch = _batch(feats=True)
    m1 = t.validate(batch)
    assert "pred_alphas" in t.test_predictions
    probe = jax.tree_util.tree_map(lambda x: x + 0.3,
                                   t.state.params["probe"])
    t.state = t.state.replace(params={**t.state.params, "probe": probe})
    m2 = t.validate(batch)
    assert not np.isclose(float(m1["loss_ae_dist_extra"]),
                          float(m2["loss_ae_dist_extra"])), \
        "probe params must influence the validation synthesis metric"


def test_sampler_emits_alpha_features():
    """create_add_features parity: [(s_from+1)/n, (s_to+1)/n,
    (frame+1)/n_frames, z-spacing, n_slices]."""
    from superresolution_aniso_mri_tpu.data import (
        TripletSampler, make_toy_dataset,
    )

    vols = make_toy_dataset(num_volumes=1, size=16, num_slices=9, seed=3)
    s = TripletSampler(vols, downsample_steps=2, seed=5)
    b = s.sample_batch(6)
    feats = b["alpha_features"]
    assert feats.shape == (6, 5)
    n = vols[0].num_slices
    assert np.all(feats[:, 0] > 0) and np.all(feats[:, 0] <= 1.0)
    np.testing.assert_allclose(feats[:, 3], vols[0].spacing[0])
    np.testing.assert_allclose(feats[:, 4], n)
