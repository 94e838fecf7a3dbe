"""Training-layer tests: every family takes a step and reduces loss on
the toy dataset; checkpoints round-trip; experiment dir contract holds."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data import (
    TripletSampler, make_toy_dataset, prepare_batch_pairs,
)
from superresolution_aniso_mri_tpu.train import (
    Trainer, get_trainer, weight_annealing_schedule,
)


def _toy_args(model="ae_combined", tmpdir=None, **over):
    args = {
        "dataset": "MNIST3D",
        "model": model,
        "ae_class": "VanillaACAI",
        "width": 32,
        "latent_width": 16,
        "depth": 8,
        "latent": 8,
        "colors": 1,
        "lr": 1e-3,
        "weight_decay": 0.0,
        "batch_size": 4,
        "epochs": 4,
        "epoch_threshold": 0,
        "ex_loss_weight1": 0.01,
        "use_batchnorm": False,
        "use_sigmoid": True,
        "use_laploss": False,
        "use_percept_loss": False,
        "image_mix_loss_func": "mse",
        "downsample_steps": 2,
        "seed": 42,
        "output_dir": str(tmpdir) if tmpdir else None,
    }
    args.update(over)
    return args


def _device_batch(sampler, batch_size=4):
    raw = sampler.sample_batch(batch_size)
    triplet = jnp.asarray(raw["triplet"])
    image, between = prepare_batch_pairs(triplet)
    return {
        "image": image,
        "slice_between": between,
        "alpha_from": jnp.asarray(raw["alpha_from"]),
        "alpha_to": jnp.asarray(raw["alpha_to"]),
    }


@pytest.fixture(scope="module")
def toy_sampler():
    vols = make_toy_dataset(num_volumes=2, size=32, num_slices=9, seed=7)
    return TripletSampler(vols, downsample_steps=2, seed=11)


@pytest.mark.parametrize("model", ["ae", "ae_combined", "vae", "vae2",
                                   "acai", "acai_combined"])
def test_families_step_and_learn(model, toy_sampler, tmp_path):
    over = {}
    if model.startswith("vae"):
        over = {"vae_beta": 0.01, "lamb": 1.0}
    t = Trainer(_toy_args(model, tmp_path, **over))
    batch = _device_batch(toy_sampler)
    first = t.train(batch)
    for _ in range(15):
        metrics = t.train(batch)
    assert np.isfinite(float(metrics["loss_ae"]))
    assert float(metrics["loss_ae"]) < float(first["loss_ae"])
    # validation populates reference loss keys
    val = t.validate(batch)
    assert "loss_ae_dist" in val and np.isfinite(float(val["loss_ae_dist"]))


def test_multichannel_family(tmp_path):
    t = Trainer(_toy_args("ae_combined", tmp_path, dataset="ACDCLBL",
                          colors=2, nclasses=3))
    assert t.family == "multichannel_combined"
    rng = np.random.RandomState(0)
    img = rng.rand(8, 32, 32, 1).astype(np.float32)
    lbl = rng.randint(0, 3, (8, 32, 32, 1)).astype(np.float32)
    x = jnp.asarray(np.concatenate([img, lbl], axis=-1))
    between = x[:4]
    batch = {"image": x, "slice_between": between,
             "alpha_from": jnp.full((4,), 0.5),
             "alpha_to": jnp.full((4,), 0.5)}
    m1 = t.train(batch)
    for _ in range(5):
        m = t.train(batch)
    assert np.isfinite(float(m["loss_ae"]))
    assert "loss_label" in m


def test_checkpoint_roundtrip(toy_sampler, tmp_path):
    t = Trainer(_toy_args("ae_combined", tmp_path))
    t.prepare_run()
    batch = _device_batch(toy_sampler)
    t.train(batch)
    fname = os.path.join(t.dir_models, "3.models")
    t.save_models(fname, 3)

    t2 = Trainer(_toy_args("ae_combined", tmp_path))
    t2.load(fname)
    assert t2.epoch == 3
    # params identical after restore
    a = jax.tree_util.tree_leaves(t.state.params)
    b = jax.tree_util.tree_leaves(t2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # identical predictions
    x = batch["image"]
    np.testing.assert_allclose(np.asarray(t.predict(x)),
                               np.asarray(t2.predict(x)), atol=1e-6)


def test_experiment_dir_contract(toy_sampler, tmp_path):
    t = Trainer(_toy_args("ae_combined", tmp_path, epoch_threshold=-1))
    t.prepare_run()
    assert os.path.isfile(os.path.join(str(tmp_path), "settings.yaml"))
    batch = _device_batch(toy_sampler)
    for epoch in range(3):
        t.train(batch)
        t.show_loss_on_tensorboard("train")
        t.validate(batch)
        t.show_loss_on_tensorboard("test")
        t.reset_losses()
        t.end_epoch_processing()
    # numbered checkpoints + loss archives exist
    assert os.path.isfile(os.path.join(t.dir_models, "0.models"))
    assert os.path.isfile(os.path.join(str(tmp_path), "loss_iters.npz"))
    assert os.path.isfile(os.path.join(str(tmp_path), "losses_train.npz"))
    # best-model alias appears once test-loss history has 2+ entries
    assert os.path.isfile(os.path.join(t.dir_models, "ae.models")) or \
        os.path.isfile(os.path.join(t.dir_models, "caisr.models"))

    # rehydrate purely from the experiment dir (get_trainer parity);
    # N.models stores epoch N+1 = the NEXT epoch to run, so resume never
    # repeats the completed epoch
    t3 = get_trainer(str(tmp_path), model_nbr=1)
    assert t3.epoch == 2
    out = t3.predict(batch["image"])
    assert out.shape == batch["image"].shape


def test_weight_annealing_schedule():
    w = weight_annealing_schedule(10, 0.5)
    assert w.shape == (10,)
    assert w[0] > w[-1]              # reversed sigmoid: starts high
    assert abs(w[0] - 0.5 / (1 + np.exp(-5))) < 1e-6


def test_loss_reduction_on_toy_volume(toy_sampler, tmp_path):
    """End-to-end sanity: a few epochs of ae_combined reduces both the
    reconstruction and the synthesis loss on fresh batches."""
    t = Trainer(_toy_args("ae_combined", tmp_path, lr=2e-3))
    losses_first, losses_last = [], []
    for it in range(30):
        batch = _device_batch(toy_sampler)
        m = t.train(batch)
        if it < 5:
            losses_first.append(float(m["loss_ae_dist"]))
        if it >= 25:
            losses_last.append(float(m["loss_ae_dist"]))
    assert np.mean(losses_last) < np.mean(losses_first)


def test_perceptual_loss_training(toy_sampler, tmp_path):
    """ae_combined with the LPIPS perceptual loss (fallback weights)
    must train stably — the reference's default ACDC/dHCP config."""
    t = Trainer(_toy_args("ae_combined", tmp_path,
                          use_percept_loss=True,
                          image_mix_loss_func="perceptual"))
    assert t.lpips_params is not None
    batch = _device_batch(toy_sampler)
    first = t.train(batch)
    for _ in range(5):
        m = t.train(batch)
    assert np.isfinite(float(m["loss_ae"]))
    assert float(m["loss_ae"]) < float(first["loss_ae"])


def test_use_ssim_loss_flag(toy_sampler):
    """--use_ssim_loss adds 0.135*(1-SSIM(win=11)) to the MSE recon loss
    (reference semantics base_trainer.py:179-181; the reference disabled
    the flag — we implement it with the differentiable JAX SSIM)."""
    import jax
    from superresolution_aniso_mri_tpu.ops import ssim_volume, mse

    base = Trainer(_toy_args("ae", None))
    with_ssim = Trainer(_toy_args("ae", None, use_ssim_loss=True))
    batch = _device_batch(toy_sampler)
    m0 = base.validate(batch)
    m1 = with_ssim.validate(batch)
    # same weights (same seed): the SSIM term is the exact difference
    pred = np.asarray(base.test_predictions["reconstruction"])
    x = np.asarray(batch["image"])
    s = float(np.mean(np.asarray(ssim_volume(
        jnp.asarray(pred[..., 0]), jnp.asarray(x[..., 0]), 1.0, 11))))
    expected = float(m0["loss_ae_dist"]) + 0.135 * (1.0 - s)
    np.testing.assert_allclose(float(m1["loss_ae_dist"]), expected,
                               rtol=1e-4)
    # and it trains (gradients flow through the SSIM term)
    before = np.array(jax.tree_util.tree_leaves(
        with_ssim.state.params)[0])
    with_ssim.train(batch)
    after = np.array(jax.tree_util.tree_leaves(with_ssim.state.params)[0])
    assert np.abs(after - before).max() > 0


def test_multi_step_matches_sequential(toy_sampler):
    """lax.scan multi-step dispatch == N sequential single steps (exact:
    same rng split, same batches)."""
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
    from superresolution_aniso_mri_tpu.train import (
        LossConfig, create_train_state, make_multi_train_step,
        make_train_step,
    )

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4,
                   use_batchnorm=True, use_sigmoid=True)
    model = VanillaACAI(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 1)), lr=1e-3)
    loss_cfg = LossConfig(model="ae_combined", recon_loss="mse",
                          image_mix_loss_func="mse")
    rng = np.random.RandomState(0)
    n, b = 5, 4
    batches = [{
        "image": rng.rand(2 * b, 16, 16, 1).astype(np.float32),
        "slice_between": rng.rand(b, 16, 16, 1).astype(np.float32),
        "alpha_from": np.full((b,), 0.5, np.float32),
        "alpha_to": np.full((b,), 0.5, np.float32),
    } for _ in range(n)]

    key = jax.random.PRNGKey(7)
    single = make_train_step(model, loss_cfg, donate=False)
    s_seq = state
    keys = jax.random.split(key, n)
    for batch, k in zip(batches, keys):
        s_seq, m_seq = single(s_seq, {kk: jnp.asarray(v)
                                      for kk, v in batch.items()},
                              k, jnp.float32(0.01))

    multi = make_multi_train_step(model, loss_cfg, donate=False)
    stacked = {kk: jnp.asarray(np.stack([b_[kk] for b_ in batches]))
               for kk in batches[0]}
    s_multi, m_multi = multi(state, stacked, key, jnp.float32(0.01))

    assert m_multi["loss_ae"].shape == (n,)
    np.testing.assert_allclose(float(m_multi["loss_ae"][-1]),
                               float(m_seq["loss_ae"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_seq.params),
                     jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-7)


def test_lr_warmup_schedule():
    """--lr_warmup_steps ramps the LR linearly from 0 and composes with
    the cosine anneal (train/state.py make_optimizer). The warmup exists
    to rescue --use_batchnorm 0 runs whose sigmoid head collapses to
    exact-zero gradients at the full LR (measured on the cardiac
    production benchmark, docs/STATUS.md round-3)."""
    import jax
    import jax.numpy as jnp
    import optax

    from superresolution_aniso_mri_tpu.train import make_optimizer

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}

    def updates_over_steps(tx, n):
        opt_state = tx.init(params)
        sizes = []
        p = params
        for _ in range(n):
            upd, opt_state = tx.update(grads, opt_state, p)
            sizes.append(float(jnp.abs(upd["w"]).max()))
            p = optax.apply_updates(p, upd)
        return sizes

    lr = 1e-2
    warm = updates_over_steps(make_optimizer(lr, warmup_steps=10), 12)
    # step 0 is a zero-LR step; the ramp grows monotonically to ~lr
    assert warm[0] == 0.0
    assert all(b >= a for a, b in zip(warm[:10], warm[1:11]))
    # Adam's first full-LR step has |update| ~= lr (moment-normalized)
    assert abs(warm[11] - lr) / lr < 0.2

    # warmup + cosine: ramps up then decays back toward 0
    wc = updates_over_steps(
        make_optimizer(lr, cosine_steps=20, warmup_steps=5), 20)
    assert wc[0] == 0.0
    peak = max(wc)
    assert abs(peak - lr) / lr < 0.25
    assert wc[-1] < 0.2 * peak

    # no warmup: full LR from the first step (unchanged default path)
    plain = updates_over_steps(make_optimizer(lr), 2)
    assert abs(plain[0] - lr) / lr < 0.2


def test_lr_warmup_cli_flag_roundtrip(tmp_path):
    """The --lr_warmup_steps flag persists through settings.yaml and old
    experiments without the key default to 0 (config/settings.py)."""
    from superresolution_aniso_mri_tpu.config import apply_setting_defaults
    from superresolution_aniso_mri_tpu.config.arguments import parse_args

    _, args = parse_args(["-d", "OASIS", "--downsample_steps", "3",
                          "--lr_warmup_steps", "250"])
    assert args["lr_warmup_steps"] == 250
    assert apply_setting_defaults({})["lr_warmup_steps"] == 0
