"""Cross-framework parity tests against torch (CPU) oracles.

Validates (a) the LPIPS weight converter end-to-end: a torch-format
VGG16 state dict converted by tools/convert_lpips_weights.py must make
our JAX feature extractor match a literal torch conv stack; (b) our
NHWC conv+LeakyReLU+BN building blocks against torch's NCHW equivalents
with identical weights — the numerical core of model parity with the
reference.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_CHANNELS = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                 (256, 256), (256, 256), (256, 512), (512, 512),
                 (512, 512), (512, 512), (512, 512), (512, 512)]
_POOL_BEFORE = {5, 10, 17, 24}
_SLICE_AFTER = {2, 7, 14, 21, 28}
_LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def _random_vgg_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for idx, (cin, cout) in zip(_VGG16_CONV_IDX, _VGG_CHANNELS):
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (cout,)).astype(np.float32))
    return sd


def _torch_vgg_features(sd, x_nchw):
    """Literal torch forward of the VGG16 conv stack → 5 slice outputs."""
    import torch.nn.functional as F

    feats = []
    h = x_nchw
    for idx in _VGG16_CONV_IDX:
        if idx in _POOL_BEFORE:
            h = F.max_pool2d(h, 2, 2)
        h = F.conv2d(h, sd[f"features.{idx}.weight"],
                     sd[f"features.{idx}.bias"], padding=1)
        h = F.relu(h)
        if idx in _SLICE_AFTER:
            feats.append(h)
    return feats


def test_lpips_converter_end_to_end(tmp_path):
    sd = _random_vgg_state_dict()
    vgg_path = str(tmp_path / "vgg16.pth")
    torch.save(sd, vgg_path)
    # lin weights in the LPIPS on-disk format (lin{k}.model.1.weight)
    rng = np.random.RandomState(1)
    lin_sd = {f"lin{k}.model.1.weight": torch.tensor(
        np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32))
        for k, c in enumerate(_LPIPS_CHANNELS)}
    lin_path = str(tmp_path / "lin.pth")
    torch.save(lin_sd, lin_path)
    out_path = str(tmp_path / "lpips.npz")

    r = subprocess.run(
        [sys.executable, "tools/convert_lpips_weights.py",
         "--vgg16", vgg_path, "--lin", lin_path, "--out", out_path],
        cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    import jax.numpy as jnp
    from superresolution_aniso_mri_tpu.ops.lpips import (
        load_lpips_params, _vgg_features, lpips_distance,
    )

    params = load_lpips_params(out_path)
    x = rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1
    feats_jax = _vgg_features(params, jnp.asarray(x))
    feats_torch = _torch_vgg_features(
        sd, torch.tensor(x.transpose(0, 3, 1, 2)))
    assert len(feats_jax) == len(feats_torch) == 5
    for fj, ft in zip(feats_jax, feats_torch):
        np.testing.assert_allclose(
            np.asarray(fj), ft.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-3)

    # full distance runs with the converted lin weights
    a = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    b = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    d = np.asarray(lpips_distance(params, a, b))
    assert np.isfinite(d).all() and d[0] > 0


def test_conv_block_parity_with_torch():
    """Our NHWC conv + LeakyReLU + BN(eval) must match torch NCHW with
    the same weights — the layer semantics underpinning model parity."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    cin, cout = 3, 8
    w = rng.normal(0, 0.2, (cout, cin, 3, 3)).astype(np.float32)
    b = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    x = rng.rand(2, 16, 16, cin).astype(np.float32)

    # HIGHEST precision isolates layout/padding/slope semantics (model
    # convs themselves run the faster default-precision path)
    conv = nn.Conv(cout, (3, 3), padding="SAME",
                   precision=jax.lax.Precision.HIGHEST)
    variables = {"params": {"kernel": jnp.asarray(
        w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    out_jax = nn.leaky_relu(conv.apply(variables, jnp.asarray(x)),
                            negative_slope=0.01)

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    out_torch = F.leaky_relu(
        F.conv2d(xt, torch.tensor(w), torch.tensor(b), padding=1), 0.01)
    np.testing.assert_allclose(np.asarray(out_jax),
                               out_torch.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)

    # BatchNorm eval-mode parity (running stats)
    bn_scale = rng.rand(cout).astype(np.float32) + 0.5
    bn_bias = rng.normal(0, 0.1, cout).astype(np.float32)
    r_mean = rng.normal(0, 0.1, cout).astype(np.float32)
    r_var = rng.rand(cout).astype(np.float32) + 0.5
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    vb = {"params": {"scale": jnp.asarray(bn_scale),
                     "bias": jnp.asarray(bn_bias)},
          "batch_stats": {"mean": jnp.asarray(r_mean),
                          "var": jnp.asarray(r_var)}}
    y_jax = bn.apply(vb, out_jax)
    y_torch = F.batch_norm(out_torch, torch.tensor(r_mean),
                           torch.tensor(r_var), torch.tensor(bn_scale),
                           torch.tensor(bn_bias), training=False, eps=1e-5)
    np.testing.assert_allclose(np.asarray(y_jax),
                               y_torch.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_avgpool_and_nearest_upsample_parity():
    """AvgPool2d(2) and nn.Upsample(nearest) parity — the spatial ops of
    the ACAI encoder/decoder (reference acai_vanilla.py:61,92)."""
    import jax.numpy as jnp
    import flax.linen as nn
    import torch.nn.functional as F
    from superresolution_aniso_mri_tpu.models.acai import _upsample2x

    rng = np.random.RandomState(3)
    x = rng.rand(2, 8, 8, 4).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))

    p_jax = nn.avg_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    p_torch = F.avg_pool2d(xt, 2)
    np.testing.assert_allclose(np.asarray(p_jax),
                               p_torch.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)

    u_jax = _upsample2x(jnp.asarray(x))
    u_torch = F.interpolate(xt, scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(u_jax),
                               u_torch.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_full_model_forward_parity_with_torch():
    """Full VanillaACAI encode→decode vs a functional torch chain with
    the SAME weights — composition-level cross-framework parity."""
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI

    cfg = AEConfig(width=32, latent_width=8, depth=4, latent=6,
                   use_batchnorm=False, use_sigmoid=True)
    model = VanillaACAI(cfg)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    out_jax = np.asarray(model.apply(variables, jnp.asarray(x)))

    p = variables["params"]

    def t_conv(h, params, padding):
        w = torch.tensor(np.transpose(np.asarray(params["kernel"]),
                                      (3, 2, 0, 1)))  # HWIO → OIHW
        b = torch.tensor(np.asarray(params["bias"]))
        return F.conv2d(h, w, b, padding=padding)

    lrelu = lambda h: F.leaky_relu(h, 0.01)
    h = torch.tensor(x.transpose(0, 3, 1, 2))
    # encoder: stem 1x1 → [conv3 lrelu ×2 → avgpool] per scale → pre-head → head
    h = t_conv(h, p["enc"]["stem"], 0)
    for scale in range(cfg.scales):
        h = lrelu(t_conv(h, p["enc"][f"Conv_{2 * scale}"], 1))
        h = lrelu(t_conv(h, p["enc"][f"Conv_{2 * scale + 1}"], 1))
        h = F.avg_pool2d(h, 2)
    h = lrelu(t_conv(h, p["enc"][f"Conv_{2 * cfg.scales}"], 1))
    z = t_conv(h, p["enc"]["head"], 1)
    # decoder: [conv3 lrelu ×2 → nearest 2x] per scale → conv lrelu → out → sigmoid
    h = z
    for scale in range(cfg.scales):
        h = lrelu(t_conv(h, p["dec"][f"Conv_{2 * scale}"], 1))
        h = lrelu(t_conv(h, p["dec"][f"Conv_{2 * scale + 1}"], 1))
        h = F.interpolate(h, scale_factor=2, mode="nearest")
    h = lrelu(t_conv(h, p["dec"][f"Conv_{2 * cfg.scales}"], 1))
    out_torch = torch.sigmoid(t_conv(h, p["dec"]["out"], 1))

    np.testing.assert_allclose(out_jax,
                               out_torch.numpy().transpose(0, 2, 3, 1),
                               atol=5e-3)  # default (bf16) conv precision
