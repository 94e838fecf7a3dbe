"""Regression tests for the round-3 core-training review findings."""
import numpy as np
import pytest

from tests.test_train import _toy_args
from superresolution_aniso_mri_tpu.train import Trainer


def test_best_val_seed_ignores_prethreshold_history(tmp_path):
    """Resume must seed best-val from POST-threshold entries only — a
    pre-threshold global minimum was never saved and must not freeze
    the best-model aliases (review finding)."""
    import os

    t = Trainer(_toy_args("ae_combined", tmp_path, epoch_threshold=2))
    # epochs 0..4 completed; global min 0.05 at epoch 1 (pre-threshold,
    # never compared at save time), post-threshold values 0.6/0.4
    t.loss_iters = [10, 20, 30, 40, 50]
    t.mean_losses["loss_ae"] = [1.0] * 5
    t.mean_losses_test["loss_ae_dist"] = [0.9, 0.05, 0.8, 0.6, 0.4]
    t.save_losses()
    ckpt = os.path.join(str(tmp_path), "4.models")
    t.save_models(ckpt, 5)

    t2 = Trainer(_toy_args("ae_combined", tmp_path, epoch_threshold=2))
    t2.load(ckpt)
    # best seeded from entries AFTER epoch_threshold=2: min(0.6, 0.4)
    np.testing.assert_allclose(t2._best_val["loss_ae_dist"], 0.4)


def test_lr_scheduler_flags():
    """--use_lr_scheduler is reachable and fails loudly without
    --lr_iter_max (was: KeyError / no flag at all)."""
    args = _toy_args("ae_combined", None, use_lr_scheduler=True,
                     lr_iter_max=100)
    t = Trainer(args)
    assert t is not None
    with pytest.raises(ValueError, match="lr_iter_max"):
        Trainer(_toy_args("ae_combined", None, use_lr_scheduler=True))
    # the flag exists on the CLI
    from superresolution_aniso_mri_tpu.config.arguments import parse_args
    import sys
    argv = ["-d", "MNIST3D", "-m", "ae_combined", "--downsample_steps",
            "2", "--use_lr_scheduler", "--lr_iter_max", "500"]
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        a, d = parse_args()
    finally:
        sys.argv = old
    assert d["use_lr_scheduler"] is True and d["lr_iter_max"] == 500


def test_alpha_mix_scheme_beats_count_collision():
    """With latent=2, the per-channel-convex count equals the
    scalar-pair count; the scheme name must select the right mixing."""
    import jax.numpy as jnp
    from superresolution_aniso_mri_tpu.train.steps import alpha_mix
    from superresolution_aniso_mri_tpu.train.trainer import (
        alpha_mix_scheme, alpha_num_coefficients,
    )

    latent = 2
    assert alpha_num_coefficients("AlphaProbe16Convex", latent, 4) == 2
    assert alpha_mix_scheme("AlphaProbe16Convex") == "convex"
    rs = np.random.RandomState(0)
    z1 = jnp.asarray(rs.rand(3, 4, 4, latent), jnp.float32)
    z3 = jnp.asarray(rs.rand(3, 4, 4, latent), jnp.float32)
    a = jnp.asarray(rs.rand(3, 2), jnp.float32)
    out = np.asarray(alpha_mix(a, z1, z3, 2, latent, scheme="convex"))
    expect = (np.asarray(a)[:, None, None, :] * np.asarray(z1)
              + (1 - np.asarray(a)[:, None, None, :]) * np.asarray(z3))
    np.testing.assert_allclose(out, expect, atol=1e-6)
    # the legacy count-only dispatch would have chosen the scalar-pair
    # scheme here — assert they differ so the test has teeth
    legacy = np.asarray(alpha_mix(a, z1, z3, 2, latent))
    assert not np.allclose(out, legacy)


def test_multichannel_eval_mix_metric_is_unmasked():
    """The multichannel synthesis metric at eval must match the trained
    (UNmasked) objective even when --get_masks supplies a loss_mask
    (review finding: selection optimized a metric training never saw)."""
    import jax
    import jax.numpy as jnp
    from superresolution_aniso_mri_tpu.models import AEConfig, MultiChannelAE
    from superresolution_aniso_mri_tpu.train.steps import (
        LossConfig, make_eval_step,
    )

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4, colors=2,
                   nclasses=3, use_sigmoid=True)
    model = MultiChannelAE(cfg)
    lc = LossConfig(model="multichannel_combined", use_masks=True,
                    image_mix_loss_func="mse", nclasses=3)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(4, 16, 16, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    batch = {
        "image": x,
        "slice_between": jnp.asarray(rs.rand(2, 16, 16, 2), jnp.float32),
        "alpha_from": jnp.full((2,), 0.5),
        "alpha_to": jnp.full((2,), 0.5),
        "loss_mask": jnp.asarray((rs.rand(2, 16, 16, 1) > 0.5)
                                 .astype(np.float32)),
    }
    ev = make_eval_step(model, lc, None)
    m_with, _ = ev(variables["params"], variables.get("batch_stats", {}),
                   batch)
    batch_nomask = {k: v for k, v in batch.items() if k != "loss_mask"}
    m_without, _ = ev(variables["params"],
                      variables.get("batch_stats", {}), batch_nomask)
    np.testing.assert_allclose(float(m_with["loss_ae_dist_extra"]),
                               float(m_without["loss_ae_dist_extra"]),
                               rtol=1e-6)
