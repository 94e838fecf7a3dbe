"""--max_grad_norm: the production guard against the bn=0 sigmoid-
collapse divergence (round-5 pilot: --aug_noise at the stock dHCP
recipe diverged at epoch 91 into a permanent constant-output basin).

Reference: kwatsch/trainer_ae.py:18 max_grad_norm via
acai_utils.clip_grad_norm (the reference exposes it on every trainer
but never from its CLI; ours is a CLI flag).
"""
import numpy as np


def test_cli_flag_parses_and_reaches_trainer_args():
    from superresolution_aniso_mri_tpu.config.arguments import parse_args

    _, args = parse_args(
        ["-d", "OASIS", "-m", "ae_combined", "--downsample_steps", "2",
         "--max_grad_norm", "1.5"])
    assert args["max_grad_norm"] == 1.5
    _, args0 = parse_args(["-d", "OASIS", "--downsample_steps", "2"])
    assert args0["max_grad_norm"] == 0.0


def test_make_optimizer_clips_global_norm():
    import jax.numpy as jnp
    import optax

    from superresolution_aniso_mri_tpu.train.state import make_optimizer

    tx = make_optimizer(1.0, max_grad_norm=1.0)
    params = {"w": jnp.zeros((4,))}
    huge = {"w": jnp.full((4,), 1e6)}
    state = tx.init(params)
    upd, _ = tx.update(huge, state, params)
    # adam normalises magnitudes anyway; the clip must make the update
    # identical to a scaled-down gradient of the same direction
    tx0 = make_optimizer(1.0, max_grad_norm=0.0)
    small = {"w": jnp.full((4,), 0.5)}  # norm 1.0 == the clipped norm
    upd_ref, _ = tx0.update(small, tx0.init(params), params)
    np.testing.assert_allclose(np.asarray(upd["w"]),
                               np.asarray(upd_ref["w"]), rtol=1e-5)


def test_trainer_step_applies_clipping(tmp_path):
    """A Trainer configured with max_grad_norm takes a bounded first
    step even from a pathological loss surface (huge targets)."""
    import jax

    from superresolution_aniso_mri_tpu.train.trainer import Trainer

    def build(clip):
        return Trainer(dict(
            model="ae_combined", dataset="OASIS", width=32,
            latent_width=16, depth=8, latent=8, batch_size=4, lr=0.1,
            epochs=1, downsample_steps=2, image_mix_loss_func="mse",
            use_batchnorm=0, max_grad_norm=clip,
            output_dir=str(tmp_path / f"c{clip}"), exper_id="s",
            seed=1))

    rs = np.random.RandomState(0)
    b = 4
    batch = {"image": rs.rand(2 * b, 32, 32, 1).astype(np.float32),
             "slice_between": rs.rand(b, 32, 32, 1).astype(np.float32),
             "alpha_from": np.full((b,), 0.5, np.float32),
             "alpha_to": np.full((b,), 0.5, np.float32)}
    t_clip = build(0.001)
    # materialise before train(): the step donates the state buffers
    leaves0 = [np.asarray(x).copy()
               for x in jax.tree_util.tree_leaves(t_clip.state.params)]
    t_clip.train(batch)
    leaves1 = jax.tree_util.tree_leaves(t_clip.state.params)
    # with adam, per-step movement is bounded by lr regardless — the
    # observable clip effect is that updates exist and are finite
    deltas = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
              for a, b in zip(leaves0, leaves1)]
    assert all(np.isfinite(d) for d in deltas)
    assert max(deltas) > 0
