"""Regression tests for the round-2 core-code review findings."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.data import (
    TripletSampler, make_toy_dataset,
)
from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
from superresolution_aniso_mri_tpu.train import (
    LossConfig, create_train_state, make_train_step,
)


def _labeled_toys(n=2, size=32, slices=9, seed=0):
    vols = make_toy_dataset(n, size=size, num_slices=slices, seed=seed)
    for v in vols:
        v.labels = np.digitize(v.image, [0.25, 0.5, 0.75]).astype(np.int32)
    return vols


def test_acdclbl_trains_end_to_end(tmp_path):
    """ACDCLBL routes to labeled volumes and the 2-channel multichannel
    model actually trains (was a conv channel-mismatch crash)."""
    from superresolution_aniso_mri_tpu.cli import run_training

    t = run_training({
        "dataset": "ACDCLBL", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "latent": 8, "depth": 8, "batch_size": 4, "lr": 1e-3,
        "epochs": 1, "downsample_steps": 2, "epoch_threshold": -1,
        "image_mix_loss_func": "mse", "use_percept_loss": False,
        "seed": 0, "output_dir": str(tmp_path), "num_val_batches": 1,
        "volume_preview_interval": 0, "use_synthetic_data": True,
        "limited_load": True, "nclasses": 4,
    }, verbose=False)
    assert "loss_label" in t.mean_losses  # dice path engaged
    assert np.isfinite(t.mean_losses["loss_ae"][-1])


def test_get_masks_produces_loss_mask(tmp_path):
    """--get_masks emits a real loss_mask batch key (was a silent no-op)
    and errors clearly when volumes carry no labels."""
    vols = _labeled_toys()
    s = TripletSampler(vols, 2, "adjacent_plus", pad_size=32, seed=0,
                       use_masks=True)
    item = s.sample_item(0)
    # mask rides as the LAST triplet channel (3 image-slots x 2ch + 1)
    assert item["triplet"].shape[-1] == 3 * 2 + 1
    mask = item["triplet"][..., -1]
    assert set(np.unique(mask)) <= {0.0, 1.0}

    unlabeled = make_toy_dataset(1, 32, 9, seed=1)
    with pytest.raises(ValueError, match="get_masks"):
        TripletSampler(unlabeled, 2, use_masks=True)


def test_is_inbetween_weights_mix_loss():
    """Degenerate step-1 triplets (is_inbetween=0) are excluded from the
    synthesis loss; all-ones weights reproduce the unweighted loss."""
    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4,
                   use_batchnorm=False, use_sigmoid=True)
    model = VanillaACAI(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 1)), lr=1e-3)
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse")
    step = make_train_step(model, loss_cfg, donate=False)
    rng = np.random.RandomState(0)
    b = 4
    base = {
        "image": jnp.asarray(rng.rand(2 * b, 16, 16, 1), jnp.float32),
        "slice_between": jnp.asarray(rng.rand(b, 16, 16, 1), jnp.float32),
        "alpha_from": jnp.full((b,), 0.5),
        "alpha_to": jnp.full((b,), 0.5),
    }
    _, m_plain = step(state, dict(base), jax.random.PRNGKey(1),
                      jnp.float32(0.5))
    ones = dict(base, is_inbetween=jnp.ones((b,), jnp.float32))
    _, m_ones = step(state, ones, jax.random.PRNGKey(1), jnp.float32(0.5))
    np.testing.assert_allclose(float(m_ones["loss_ae"]),
                               float(m_plain["loss_ae"]), rtol=1e-6)
    half = dict(base, is_inbetween=jnp.asarray([1, 1, 0, 0], jnp.float32))
    _, m_half = step(state, half, jax.random.PRNGKey(1), jnp.float32(0.5))
    assert not np.isclose(float(m_half["loss_ae_dist_extra"]),
                          float(m_plain["loss_ae_dist_extra"]))


def test_alpha_only_freezes_autoencoder():
    """Variant 'alpha_only': the AE must receive NO gradient (frozen AE,
    probe-only training — reference alpha/trainer_alpha_only.py); the
    latent loss previously leaked into the encoder through z_mix."""
    from superresolution_aniso_mri_tpu.models import make_alpha_probe
    from superresolution_aniso_mri_tpu.train.state import (
        SRTrainState, make_optimizer,
    )

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4,
                   use_batchnorm=False, use_sigmoid=True)
    ae = VanillaACAI(cfg)
    probe = make_alpha_probe("AlphaProbe16v1", cfg, additional_dims=5)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    v_ae = ae.init(k1, jnp.zeros((2, 16, 16, 1)), train=False)
    v_probe = probe.init(k2, jnp.zeros((2, 8, 8, 8)), jnp.zeros((2, 5)))
    state = SRTrainState.create(
        apply_fn=ae.apply,
        params={"ae": v_ae["params"], "probe": v_probe["params"]},
        tx=make_optimizer(1e-2),
        batch_stats={"ae": {}, "probe": {}})
    step = make_train_step(
        {"ae": ae, "probe": probe},
        LossConfig(model="alpha_only", recon_loss="mse",
                   image_mix_loss_func="mse", num_alphas=8, latent=4),
        donate=False)
    rng = np.random.RandomState(2)
    b = 4
    batch = {
        "image": jnp.asarray(rng.rand(2 * b, 16, 16, 1), jnp.float32),
        "slice_between": jnp.asarray(rng.rand(b, 16, 16, 1), jnp.float32),
        "alpha_from": jnp.full((b,), 0.5), "alpha_to": jnp.full((b,), 0.5),
        "alpha_features": jnp.asarray(rng.rand(b, 5), jnp.float32),
    }
    new_state, _ = step(state, batch, jax.random.PRNGKey(1),
                        jnp.float32(0.01))
    for a, b_ in zip(jax.tree_util.tree_leaves(state.params["ae"]),
                     jax.tree_util.tree_leaves(new_state.params["ae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # and the probe DID move
    moved = any(np.abs(np.asarray(a) - np.asarray(b_)).max() > 0
                for a, b_ in zip(
                    jax.tree_util.tree_leaves(state.params["probe"]),
                    jax.tree_util.tree_leaves(new_state.params["probe"])))
    assert moved


def test_adjacent_slice_never_negative():
    from superresolution_aniso_mri_tpu.data.volume import (
        get_random_adjacent_slice,
    )

    rs = np.random.RandomState(0)
    for n in (4, 6, 8):
        for step in (1, 3, 5, 7):
            for sid in range(n):
                s2 = get_random_adjacent_slice(sid, n, rs, step=step)
                assert 0 <= s2 <= n - 1, (sid, n, step, s2)


def test_best_alias_saved_even_after_late_threshold(tmp_path):
    """ae.models must appear once val improves relative to the best seen
    AT SAVE TIME — a pre-threshold minimum can't block it forever."""
    import os

    from superresolution_aniso_mri_tpu.train import Trainer

    t = Trainer({
        "dataset": "MNIST3D", "model": "ae", "ae_class": "VanillaACAI",
        "width": 16, "latent_width": 8, "depth": 4, "latent": 4,
        "batch_size": 2, "lr": 1e-3, "epochs": 10, "downsample_steps": 2,
        "seed": 0, "output_dir": str(tmp_path), "epoch_threshold": 2,
        "use_batchnorm": False, "use_sigmoid": True})
    t.prepare_run()
    # simulate a val history whose global min is before the threshold
    for epoch, v in enumerate([0.1, 0.5, 0.6, 0.55]):
        t.mean_losses_test["loss_ae_dist"].append(v)
        t.epoch = epoch
        if epoch > 2:
            t.save_best_val_model()
    assert os.path.isfile(os.path.join(t.dir_models, "ae.models"))
