"""Tests: legacy block-AE family and the MNISTRoto-style sampler."""
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_aniso_mri_tpu.models import (
    LegacyAE, LegacyAEAdv, DiscriminatorSpatial, DiscriminatorFakeReal,
)
from superresolution_aniso_mri_tpu.data.synthetic import RotoTripletSampler
from superresolution_aniso_mri_tpu.data import prepare_batch_pairs
from superresolution_aniso_mri_tpu.train import Trainer


def test_legacy_ae_roundtrip():
    model = LegacyAE(channel_list=(8, 16), downsample_list=(True, True),
                     latent_dim=8)
    x = jnp.zeros((2, 32, 32, 1))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    z = model.apply(v, x, method=model.encode)
    assert z.shape == (2, 8, 8, 8)
    out = model.apply(v, x)
    assert out.shape == x.shape


def test_legacy_ae_adv_bottleneck():
    model = LegacyAEAdv(channel_list=(8, 16), downsample_list=(True, True),
                        latent_dim=8, latent_dim_chan=4)
    x = jnp.zeros((2, 32, 32, 1))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    z = model.apply(v, x, method=model.encode)
    assert z.shape == (2, 8, 8, 4)          # compressed channels
    out = model.apply(v, x)
    assert out.shape == x.shape


def test_legacy_discriminators():
    ds = DiscriminatorSpatial()
    z = jnp.zeros((3, 8, 8, 16))
    v = ds.init(jax.random.PRNGKey(0), z)
    assert ds.apply(v, z).shape == (3,)

    # reference architecture: stride-16 strided-conv encoder + ResBlocks
    # + bias-free 1x1 + sigmoid(mean) (ae_common.py:205-227)
    dfr = DiscriminatorFakeReal(channel=16, latent_dim_chan=8,
                                n_res_block=2, n_res_channel=8)
    x = jnp.zeros((3, 32, 32, 1))
    v = dfr.init(jax.random.PRNGKey(0), x, train=False)
    out = dfr.apply(v, x)
    assert out.shape == (3,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()
    # the head is parameter-free: no Dense layer anywhere in the tree
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = {"/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat}
    assert not any("Dense" in n for n in names)
    # the 1x1 projection is bias-free (reference disc_enc bias=False)
    conv_ids = sorted({int(n.split("/")[0].split("_")[1])
                       for n in names if n.startswith("Conv_")})
    assert f"Conv_{conv_ids[-1]}/kernel" in names
    assert f"Conv_{conv_ids[-1]}/bias" not in names


def test_roto_sampler_feeds_training():
    s = RotoTripletSampler(num_images=2, size=32, downsample_steps=2,
                           seed=1)
    raw = s.sample_batch(4)
    assert raw["triplet"].shape == (4, 32, 32, 3)
    np.testing.assert_allclose(raw["alpha_from"] + raw["alpha_to"], 1.0,
                               atol=1e-6)
    t = Trainer({
        "dataset": "MNISTRoto", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 2,
        "epoch_threshold": -1, "ex_loss_weight1": 0.01,
        "use_batchnorm": False, "use_sigmoid": True, "use_laploss": False,
        "use_percept_loss": False, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": None,
    })
    image, between = prepare_batch_pairs(jnp.asarray(raw["triplet"]))
    m = t.train({"image": image, "slice_between": between,
                 "alpha_from": jnp.asarray(raw["alpha_from"]),
                 "alpha_to": jnp.asarray(raw["alpha_to"])})
    assert np.isfinite(float(m["loss_ae"]))


def test_roto_sampler_feeds_alpha_training():
    """Review fix: RotoTripletSampler emits real slice-geometry
    alpha_features (virtual rotation grid), so alpha families train on
    MNISTRoto instead of hitting the missing-features KeyError. (The
    reference's MNISTRoto batches carry mismatched key names and crash
    its alpha trainers — data_roto.py:113 'slice_idx_from' vs
    base_alpha_trainer.py:182 'slice_id_from'.)"""
    s = RotoTripletSampler(num_images=2, size=32, downsample_steps=2,
                           seed=2)
    raw = s.sample_batch(4)
    feats = raw["alpha_features"]
    assert feats.shape == (4, 5) and np.isfinite(feats).all()
    # grid semantics: normalized from/to ids a downsample_steps gap
    # apart, spacing = grad_step, n = 360/grad_step
    n_virtual = 360.0 / s.grad_step
    np.testing.assert_allclose(
        (feats[:, 1] - feats[:, 0]) * n_virtual, 2.0, atol=1e-4)
    np.testing.assert_allclose(feats[:, 3], s.grad_step, atol=1e-6)
    np.testing.assert_allclose(feats[:, 4], n_virtual, atol=1e-4)

    t = Trainer({
        "dataset": "MNISTRoto", "model": "alpha",
        "ae_class": "VanillaACAI", "alpha_class": "AlphaProbe16v1",
        "width": 32, "latent_width": 16, "depth": 8, "latent": 8,
        "colors": 1, "lr": 1e-3, "weight_decay": 0.0, "batch_size": 4,
        "epochs": 2, "epoch_threshold": -1, "use_batchnorm": False,
        "use_sigmoid": True, "alpha_loss_func": "mse",
        "downsample_steps": 2, "seed": 0, "output_dir": None,
    })
    image, between = prepare_batch_pairs(jnp.asarray(raw["triplet"]))
    m = t.train({"image": image, "slice_between": between,
                 "alpha_from": jnp.asarray(raw["alpha_from"]),
                 "alpha_to": jnp.asarray(raw["alpha_to"]),
                 "is_inbetween": jnp.asarray(raw["is_inbetween"]),
                 "alpha_features": jnp.asarray(feats)})
    assert any(k.startswith("loss") for k in m)
    assert all(np.isfinite(float(v)) for v in m.values())
