"""Shape/behaviour tests for the model zoo.

Covers the encoder/decoder shape contract at every (width, latent_width)
combination the reference uses (SURVEY.md §4: 128/16, 64/16, 220?/55 is
not a power-of-two pair — the reference OASIS config is width=64/lw=16 —
plus 256/64 and 32/16).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.models import (
    AEConfig, VanillaACAI, Discriminator, VAE, VAE2, MultiChannelAE,
    LargerAE, VanillaACAIStrided, build_model, make_alpha_probe,
)

COMBOS = [(128, 16), (64, 16), (256, 64), (32, 16)]


@pytest.mark.parametrize("width,lw", COMBOS)
def test_acai_shapes(width, lw):
    cfg = AEConfig(width=width, latent_width=lw, depth=8, latent=16,
                   use_batchnorm=True, use_sigmoid=True)
    model = VanillaACAI(cfg)
    # RANDOM input: with all-zeros every activation is exactly 0 and the
    # [0,1] range check would pass with or without the sigmoid
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, width, width, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    z = model.apply(variables, x, method=model.encode)
    assert z.shape == (2, lw, lw, cfg.latent)
    out = model.apply(variables, z, method=model.decode)
    assert out.shape == x.shape
    # sigmoid output strictly inside (0, 1) for a real signal
    assert float(out.min()) > 0.0 and float(out.max()) < 1.0


def test_acai_train_mode_updates_batch_stats():
    cfg = AEConfig(width=32, latent_width=16, depth=8, latent=4,
                   use_batchnorm=True)
    model = VanillaACAI(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert out.shape == x.shape
    leaves_before = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves_after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
    )
    assert changed, "train=True must update BN running stats"


def test_discriminator_scalar_output():
    cfg = AEConfig(width=32, latent_width=16, depth=8, latent=4)
    disc = Discriminator(cfg)
    x = jnp.zeros((6, 32, 32, 1))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(variables, x)
    assert out.shape == (6,)


@pytest.mark.parametrize("cls", [VAE, VAE2])
def test_vae_roundtrip(cls):
    cfg = AEConfig(width=32, latent_width=16, depth=8, latent=4,
                   use_sigmoid=True)
    model = cls(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    out = model.apply(variables, x)
    assert out.shape == x.shape

    z_conv = model.apply(variables, x, method=model.encode)
    mu, logvar = model.apply(variables, z_conv, method=model.heads)
    expect = 4 * 16 * 16 if cls is VAE else 4
    assert mu.shape == (2, expect) and logvar.shape == (2, expect)
    dec = model.apply(variables, mu, method=model.decode)
    assert dec.shape == x.shape


def test_multichannel_heads():
    cfg = AEConfig(width=32, latent_width=16, depth=8, latent=4,
                   colors=2, nclasses=4, use_batchnorm=True)
    model = MultiChannelAE(cfg)
    x = jnp.zeros((2, 32, 32, 2))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x)
    assert out["image"].shape == (2, 32, 32, 1)
    assert out["soft_probs"].shape == (2, 32, 32, 4)
    np.testing.assert_allclose(np.sum(out["soft_probs"], axis=-1), 1.0,
                               rtol=1e-5)


@pytest.mark.parametrize("cls", [LargerAE, VanillaACAIStrided])
def test_variant_shapes(cls):
    cfg = AEConfig(width=64, latent_width=16, depth=8, latent=16,
                   use_batchnorm=True, use_sigmoid=True)
    model = cls(cfg)
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    z = model.apply(variables, x, method=model.encode)
    assert z.shape == (2, 16, 16, 16)
    out = model.apply(variables, z, method=model.decode)
    assert out.shape == x.shape


def test_registry():
    for name in ["VanillaACAI", "VAE", "VAE2", "MultiChannelAE",
                 "LargerAE", "VanillaACAIStrided"]:
        m = build_model(name, AEConfig(width=32, latent_width=16, depth=8,
                                       latent=4))
        assert m is not None
    with pytest.raises(ValueError):
        build_model("Nope", AEConfig())


@pytest.mark.parametrize("name,nout", [
    ("AlphaProbe", 2), ("AlphaProbev2", 2), ("AlphaProbe16v1", 8),
    ("AlphaProbe16v2", 8), ("AlphaProbe16Convex", 4),
    ("AlphaProbe16ExBN", 8), ("AlphaProbe256v1", 256),
])
def test_alpha_probes(name, nout):
    cfg = AEConfig(width=32, latent_width=16, depth=8, latent=4)
    probe = make_alpha_probe(name, cfg, additional_dims=3)
    z = jnp.zeros((2, 16, 16, 8))  # concat of two latents
    feats = jnp.zeros((2, 3))
    variables = probe.init(jax.random.PRNGKey(0), z, feats)
    out = probe.apply(variables, z, feats)
    assert out.shape == (2, nout)


def test_convtranspose_decoder_reproduces_resolution():
    """use_upsample=False (ConvTranspose decoder): output must return to
    the input resolution — review fix: torch-style padding (1,1) in flax
    yields 2n-2 per stage (16->30 instead of 16->32)."""
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI

    cfg = AEConfig(width=32, latent_width=8, depth=4, latent=4, colors=1,
                   use_upsample=False, use_sigmoid=True)
    model = VanillaACAI(cfg)
    x = jnp.zeros((2, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x)
    assert out.shape == (2, 32, 32, 1)
    # the decoder really is transposed-conv (params present)
    assert any(k.startswith("ConvTranspose")
               for k in variables["params"]["dec"])


def test_aeconfig_rejects_non_power_of_two_ratio():
    from superresolution_aniso_mri_tpu.models import AEConfig

    with pytest.raises(ValueError, match="power of 2"):
        AEConfig(width=96, latent_width=16, depth=4, latent=4)
