"""Cubic (Catmull-Rom) latent interpolation — the 4-tap inference-side
alternative to the reference's 2-tap latent lerp
(kwatsch/img_interpolation.py:58-92). Pins the spline-weight math, the
edge-pad rule that keeps bucket padding out of the boundary taps, and
the plumbing through create_super_volume / create_hr_images / the CLI.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.data import make_toy_dataset
from superresolution_aniso_mri_tpu.infer import create_super_volume
from superresolution_aniso_mri_tpu.infer.super_volume import (
    catmull_rom_weights, make_volume_synthesizer,
)

from test_infer_eval import _toy_trainer


@pytest.fixture(scope="module")
def trainer():
    return _toy_trainer()


def test_catmull_rom_weight_properties():
    t = jnp.asarray([0.0, 0.25, 1.0 / 3.0, 0.5, 0.75, 1.0])
    w = np.asarray(catmull_rom_weights(t))          # [A, 4]
    # partition of unity
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    # endpoint interpolation: t=0 → z[i] (tap 1), t=1 → z[i+1] (tap 2)
    np.testing.assert_allclose(w[0], [0, 1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(w[-1], [0, 0, 1, 0], atol=1e-6)
    # linear precision: taps at positions (-1, 0, 1, 2) must average to t
    pos = np.array([-1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(w @ pos, np.asarray(t), atol=1e-6)


def test_cubic_linear_precision_on_latents(trainer):
    """Collinear equispaced latents: cubic must reproduce the lerp
    exactly (away from the clamped edges), so on a volume whose kept
    latents happen to be collinear the two modes decode identically.
    Build the collinear case directly at the synthesizer level."""
    p, bs = trainer._ae_params()
    model = trainer._ae_model()
    lin = make_volume_synthesizer(model, latent_interp="linear")
    cub = make_volume_synthesizer(model, latent_interp="cubic")

    # 6 kept slices whose ENCODINGS are not collinear in general — so
    # compare decoded mixes only through the weights' linear precision:
    # feed latents z_k = z0 + k*d by synthesizing from a crafted volume
    # is impossible without controlling encode; instead check the mixed
    # LATENTS directly through a tiny identity-free path: the weights
    # already guarantee it, so here we only pin that interior pairs of
    # a real volume agree between modes when alphas hit the endpoints.
    vol = make_toy_dataset(1, 32, 13, seed=3)[0].image
    kept = jnp.asarray(vol[::3])[..., None]
    alphas = jnp.asarray([0.0, 1.0], jnp.float32)
    out_l = lin(p, bs, kept, alphas, use_original=True)["interp"]
    out_c = cub(p, bs, kept, alphas, use_original=True)["interp"]
    # t=0 / t=1 decode the kept latents themselves in both modes
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_c),
                               atol=2e-5)


def test_cubic_super_volume_shapes_and_tails(trainer):
    vol = make_toy_dataset(1, 32, 12, seed=1)[0].image  # 2 tail slices
    res = create_super_volume(trainer, vol,
                              alpha_range=np.linspace(0, 1, 4)[1:-1],
                              downsample_steps=3,
                              generate_inbetween_slices=True,
                              latent_interp="cubic")
    up = res["upsampled_image"]
    assert up.shape == vol.shape
    assert up.min() >= 0.0 and up.max() <= 1.0
    # verbatim tail re-append is interpolation-scheme independent
    np.testing.assert_allclose(up[-2:], vol[-2:], atol=1e-6)


def test_cubic_bucket_padding_invariance(trainer):
    """Edge-replicated bucket padding: padded latents must NOT leak into
    the last real pair's z[i+2] tap — padded and unpadded runs are
    bit-identical. (Zero padding would fail this: encode(zeros) would
    contaminate the boundary tap.)"""
    vol = make_toy_dataset(1, 32, 13, seed=5)[0].image  # kept 5 → bucket 8
    kw = dict(alpha_range=[0.25, 0.5, 0.75], downsample_steps=4,
              generate_inbetween_slices=True, latent_interp="cubic")
    res_pad = create_super_volume(trainer, vol, pad_to_bucket=True, **kw)
    res_raw = create_super_volume(trainer, vol, pad_to_bucket=False, **kw)
    np.testing.assert_allclose(res_pad["upsampled_image"],
                               res_raw["upsampled_image"], atol=1e-6)


def test_cubic_use_original_keeps_grid_slices(trainer):
    vol = make_toy_dataset(1, 32, 13, seed=7)[0].image
    res = create_super_volume(trainer, vol, alpha_range=[0.5],
                              downsample_steps=2,
                              generate_inbetween_slices=True,
                              use_original=True, latent_interp="cubic")
    np.testing.assert_allclose(res["upsampled_image"][::2], vol[::2],
                               atol=1e-6)


def test_cubic_differs_from_linear_on_curved_latents(trainer):
    """On a generic volume the latent path is curved, so the two schemes
    must actually produce different in-between slices (guards against
    the cubic branch silently routing to the lerp)."""
    vol = make_toy_dataset(1, 32, 13, seed=9)[0].image
    kw = dict(alpha_range=[0.5], downsample_steps=2,
              generate_inbetween_slices=True, use_original=True)
    lin = create_super_volume(trainer, vol, latent_interp="linear", **kw)
    cub = create_super_volume(trainer, vol, latent_interp="cubic", **kw)
    diff = np.abs(lin["upsampled_image"][1::2]
                  - cub["upsampled_image"][1::2]).max()
    assert diff > 1e-5


def test_create_hr_images_accepts_latent_interp(trainer):
    from superresolution_aniso_mri_tpu.evaluate import create_hr_images

    vols = make_toy_dataset(2, 32, 13, seed=11)
    out = create_hr_images(trainer, vols, downsample_steps=3,
                           latent_interp="cubic")
    assert np.isfinite(out["aggregate"]["ssim"][0])


def test_batched_sweep_matches_per_volume_cubic(trainer):
    """The fused batched evaluator under cubic z-mixing agrees with the
    per-volume path (the linear equivalence test's cubic twin — also
    exercises the sweep's edge-replicated kept padding)."""
    from superresolution_aniso_mri_tpu.evaluate import (
        create_hr_images, evaluate_volumes_batched,
    )

    vols = make_toy_dataset(3, 32, 13, seed=21)  # (13-1)%3==0: no tails
    batched = evaluate_volumes_batched(trainer, vols, downsample_steps=3,
                                       latent_interp="cubic")
    ref = create_hr_images(trainer, vols, downsample_steps=3,
                           latent_interp="cubic")
    for vol in vols:
        b = batched[vol.patient_id]
        r = ref["per_volume"][vol.patient_id]
        for k in ("ssim", "psnr", "vif", "ssim_synth", "psnr_synth",
                  "vif_synth", "mse"):
            np.testing.assert_allclose(b[k], r[k], rtol=2e-4, atol=1e-5)


def test_find_best_sweep_latent_interp(tmp_path):
    """find_best_val_model(latent_interp='cubic') sweeps both paths and
    scores a different quantity than the linear sweep."""
    import os
    from superresolution_aniso_mri_tpu.evaluate import find_best_val_model

    t = _toy_trainer(tmp_path)
    t.prepare_run()
    t.save_models(os.path.join(t.dir_models, "1.models"), 1)
    vols = make_toy_dataset(2, 32, 13, seed=23)
    lin = find_best_val_model(str(tmp_path), vols, 3, epoch_range=[1],
                              batched=True)
    cub = find_best_val_model(str(tmp_path), vols, 3, epoch_range=[1],
                              batched=True, latent_interp="cubic")
    assert lin["history"]["ssim_synth"] != cub["history"]["ssim_synth"]


def test_invalid_latent_interp_rejected(trainer):
    vol = make_toy_dataset(1, 32, 13, seed=2)[0].image
    with pytest.raises(ValueError, match="latent_interp"):
        create_super_volume(trainer, vol, alpha_range=[0.5],
                            downsample_steps=2,
                            generate_inbetween_slices=True,
                            latent_interp="quintic")


def test_cli_flag_plumbs_through(tmp_path, trainer):
    """generate_hr_volumes --latent_interp cubic runs end to end and
    differs from the linear output on the synthesized slices."""
    from superresolution_aniso_mri_tpu.cli.entry import _densify_file
    from superresolution_aniso_mri_tpu.utils import read_image, write_nifti

    vol = make_toy_dataset(1, 32, 9, seed=13)[0].image
    src = str(tmp_path / "v.nii.gz")
    write_nifti(src, vol, spacing=np.array([3.0, 1.0, 1.0]))
    out_lin = str(tmp_path / "lin")
    out_cub = str(tmp_path / "cub")
    for od, li in ((out_lin, "linear"), (out_cub, "cubic")):
        import os
        os.makedirs(od, exist_ok=True)
        _densify_file(trainer, src, od, 2, "", latent_interp=li)
    a, _, _ = read_image(out_lin + "/v_ni02.nii.gz")
    b, _, _ = read_image(out_cub + "/v_ni02.nii.gz")
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 1e-5


# ---------------------------------------------------------------------------
# training-time cubic alignment (--train_latent_interp cubic)
# ---------------------------------------------------------------------------

def test_quintet_sampler_geometry():
    """latent_taps=4: outward neighbours continue the from→to direction
    one pair step beyond each end, clamped at the volume edges."""
    from superresolution_aniso_mri_tpu.data import TripletSampler

    vols = make_toy_dataset(2, 16, 9, seed=31)
    s = TripletSampler(vols, 3, "adjacent_plus", seed=5, latent_taps=4)
    for i in range(40):
        sp = s._item_spec(i % len(s))
        n = vols[sp["vi"]].num_slices
        d = sp["s_to"] - sp["s_from"]
        assert sp["s_outer_from"] == int(np.clip(sp["s_from"] - d, 0, n - 1))
        assert sp["s_outer_to"] == int(np.clip(sp["s_to"] + d, 0, n - 1))
    item = s.sample_item(0)
    assert item["triplet"].shape[-1] == 5  # from|to|outer_f|outer_t|between


def test_prepare_batch_quintets_layout():
    from superresolution_aniso_mri_tpu.data import prepare_batch_quintets

    q = jnp.arange(2 * 4 * 4 * 5, dtype=jnp.float32).reshape(2, 4, 4, 5)
    image, outer, between = prepare_batch_quintets(q)
    assert image.shape == (4, 4, 4, 1)
    assert outer.shape == (4, 4, 4, 1)
    assert between.shape == (2, 4, 4, 1)
    np.testing.assert_allclose(image[:2, ..., 0], q[..., 0])
    np.testing.assert_allclose(image[2:, ..., 0], q[..., 1])
    np.testing.assert_allclose(outer[:2, ..., 0], q[..., 2])
    np.testing.assert_allclose(outer[2:, ..., 0], q[..., 3])
    np.testing.assert_allclose(between[..., 0], q[..., 4])
    with pytest.raises(ValueError, match="5C"):
        prepare_batch_quintets(q[..., :3])


def test_latent_mix_cubic_linear_precision():
    """Collinear equispaced latents reproduce the lerp exactly, and the
    endpoint positions hit from/to."""
    from superresolution_aniso_mri_tpu.ops import (latent_mix,
                                                   latent_mix_cubic)

    rng = np.random.default_rng(0)
    base = rng.normal(size=(3, 4, 4, 2)).astype(np.float32)
    step = rng.normal(size=(3, 4, 4, 2)).astype(np.float32)
    # taps at positions -1, 0, 1, 2 along a latent line
    z = jnp.concatenate([jnp.asarray(base),            # from  (pos 0)
                         jnp.asarray(base + step)])    # to    (pos 1)
    z_outer = jnp.concatenate([jnp.asarray(base - step),    # outer_from
                               jnp.asarray(base + 2 * step)])  # outer_to
    t = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    cub = latent_mix_cubic(z, z_outer, t)
    lin = latent_mix(z, 1.0 - t, t)
    np.testing.assert_allclose(np.asarray(cub), np.asarray(lin),
                               rtol=1e-5, atol=1e-6)


def test_cubic_train_step_runs_and_uses_outer(tmp_path):
    """One ae_combined train step with train_latent_interp='cubic':
    runs, and perturbing ONLY the outer slices changes the loss (the
    spline actually reads the 4-tap neighbourhood)."""
    import jax
    from superresolution_aniso_mri_tpu.train import Trainer

    args = {
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 1,
        "epoch_threshold": -1, "ex_loss_weight1": 0.1,
        "use_batchnorm": False, "use_sigmoid": True,
        "use_laploss": False, "use_percept_loss": False,
        "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
        "output_dir": None, "train_latent_interp": "cubic",
    }
    trainer = Trainer(args)
    rng = np.random.default_rng(1)
    b = 4
    batch = {
        "image": jnp.asarray(rng.uniform(size=(2 * b, 32, 32, 1)),
                             jnp.float32),
        "outer": jnp.asarray(rng.uniform(size=(2 * b, 32, 32, 1)),
                             jnp.float32),
        "slice_between": jnp.asarray(rng.uniform(size=(b, 32, 32, 1)),
                                     jnp.float32),
        "alpha_from": jnp.full((b,), 0.5, jnp.float32),
        "alpha_to": jnp.full((b,), 0.5, jnp.float32),
    }
    m1 = {k: float(v) for k, v in trainer.validate(batch).items()
          if np.ndim(v) == 0}
    batch2 = dict(batch)
    batch2["outer"] = batch["outer"][::-1]
    m2 = {k: float(v) for k, v in trainer.validate(batch2).items()
          if np.ndim(v) == 0}
    assert m1["loss_ae_dist_extra"] != m2["loss_ae_dist_extra"]
    # and a real optimizer step executes
    out = trainer.train(batch)
    assert np.isfinite(float(out["loss_ae"]))


def test_cubic_train_step_requires_outer():
    import jax
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
    from superresolution_aniso_mri_tpu.train import create_train_state
    from superresolution_aniso_mri_tpu.train.steps import (LossConfig,
                                                           make_train_step)

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4, colors=1,
                   use_batchnorm=False, use_sigmoid=True)
    model = VanillaACAI(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((2, 16, 16, 1)), lr=1e-3)
    lc = LossConfig(model="ae_combined", recon_loss="mse",
                    image_mix_loss_func="mse",
                    train_latent_interp="cubic")
    step = make_train_step(model, lc, donate=False)
    batch = {
        "image": jnp.zeros((4, 16, 16, 1)),
        "slice_between": jnp.zeros((2, 16, 16, 1)),
        "alpha_from": jnp.full((2,), 0.5),
        "alpha_to": jnp.full((2,), 0.5),
    }
    with pytest.raises(ValueError, match="outer"):
        step(state, batch, jax.random.PRNGKey(0), jnp.float32(0.1))


def test_train_latent_interp_rejected_for_other_families():
    from superresolution_aniso_mri_tpu.train.trainer import (
        loss_config_from_args,
    )

    args = {"model": "vae", "dataset": "MNIST3D", "latent": 8,
            "latent_width": 16, "train_latent_interp": "cubic"}
    with pytest.raises(ValueError, match="ae/ae_combined"):
        loss_config_from_args(args)


def test_cubic_training_cli_end_to_end(tmp_path):
    """train_brain_aesr --train_latent_interp cubic trains, records the
    flag in settings.yaml, and the experiment serves volumes with
    cubic inference."""
    import subprocess
    import sys

    out = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, "train_brain_aesr.py", "-d", "MNIST3D",
         "-m", "ae_combined", "--downsample_steps", "2",
         "--width", "32", "--latent_width", "16", "--latent", "8",
         "--depth", "8", "-b", "4", "-e", "1", "--epoch_threshold", "-1",
         "--image_mix_loss_func", "mse", "--use_batchnorm", "0",
         "--volume_preview_interval", "0",
         "--train_latent_interp", "cubic",
         "-o", str(out), "-id", "exp"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    import yaml
    settings = yaml.safe_load(open(out / "exp" / "settings.yaml"))
    assert settings["train_latent_interp"] == "cubic"


# ---------------------------------------------------------------------------
# lanczos3 latent scheme (6-tap — the latent twin of the pixel baseline)
# ---------------------------------------------------------------------------

def test_lanczos3_weight_properties():
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        lanczos3_weights,
    )

    t = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    w = np.asarray(lanczos3_weights(t))           # [A, 6]
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)
    # integer positions are deltas: t=0 → tap at offset 0 (index 2),
    # t=1 → tap at offset 1 (index 3)
    np.testing.assert_allclose(w[0], [0, 0, 1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(w[-1], [0, 0, 0, 1, 0, 0], atol=1e-6)


def test_lanczos3_super_volume_runs_and_differs(trainer):
    vol = make_toy_dataset(1, 32, 13, seed=41)[0].image
    kw = dict(alpha_range=[0.5], downsample_steps=2,
              generate_inbetween_slices=True, use_original=True)
    lan = create_super_volume(trainer, vol, latent_interp="lanczos3", **kw)
    cub = create_super_volume(trainer, vol, latent_interp="cubic", **kw)
    assert lan["upsampled_image"].shape == vol.shape
    # on-grid slices verbatim; synthesized slices differ from cubic
    np.testing.assert_allclose(lan["upsampled_image"][::2], vol[::2],
                               atol=1e-6)
    assert np.abs(lan["upsampled_image"][1::2]
                  - cub["upsampled_image"][1::2]).max() > 1e-6


def test_lanczos3_bucket_padding_invariance(trainer):
    vol = make_toy_dataset(1, 32, 13, seed=43)[0].image  # kept 5 → pad 8
    kw = dict(alpha_range=[0.25, 0.5, 0.75], downsample_steps=4,
              generate_inbetween_slices=True, latent_interp="lanczos3")
    res_pad = create_super_volume(trainer, vol, pad_to_bucket=True, **kw)
    res_raw = create_super_volume(trainer, vol, pad_to_bucket=False, **kw)
    np.testing.assert_allclose(res_pad["upsampled_image"],
                               res_raw["upsampled_image"], atol=1e-6)


def test_cubic_gather_matches_reference_formula(trainer):
    """The generalized tap-gather implementation must reproduce the
    closed-form Catmull-Rom mix on interior pairs."""
    p, bs = trainer._ae_params()
    model = trainer._ae_model()
    synth = make_volume_synthesizer(model, latent_interp="cubic")
    vol = make_toy_dataset(1, 32, 13, seed=45)[0].image
    kept = jnp.asarray(vol[::2])[..., None]       # 7 kept slices
    alphas = jnp.asarray([0.3], jnp.float32)
    out = synth(p, bs, kept, alphas, use_original=True)["interp"]

    # hand-built interior pair j=2: taps z[1], z[2], z[3], z[4]
    import jax
    z = model.apply({"params": p, **({"batch_stats": bs} if bs else {})},
                    kept, method=model.encode)
    w = np.asarray(catmull_rom_weights(alphas))[0]
    z_mix = (w[0] * z[1] + w[1] * z[2] + w[2] * z[3] + w[3] * z[4])[None]
    dec = model.apply({"params": p, **({"batch_stats": bs} if bs else {})},
                      z_mix, method=model.decode)
    np.testing.assert_allclose(np.asarray(out[2, 0]), np.asarray(dec[0]),
                               atol=2e-5)


# ---------------------------------------------------------------------------
# training-time lanczos3 alignment (--train_latent_interp lanczos3)
# ---------------------------------------------------------------------------

def test_septet_sampler_geometry():
    """latent_taps=6: outer pairs at one and two pair steps beyond each
    end, clamped at the volume edges like the inference lanczos3 taps."""
    from superresolution_aniso_mri_tpu.data import TripletSampler

    vols = make_toy_dataset(2, 16, 9, seed=32)
    s = TripletSampler(vols, 3, "adjacent_plus", seed=6, latent_taps=6)
    for i in range(40):
        sp = s._item_spec(i % len(s))
        n = vols[sp["vi"]].num_slices
        d = sp["s_to"] - sp["s_from"]
        assert sp["s_outer_from"] == int(np.clip(sp["s_from"] - d, 0, n - 1))
        assert sp["s_outer_to"] == int(np.clip(sp["s_to"] + d, 0, n - 1))
        assert sp["s_outer2_from"] == int(np.clip(sp["s_from"] - 2 * d,
                                                  0, n - 1))
        assert sp["s_outer2_to"] == int(np.clip(sp["s_to"] + 2 * d,
                                                0, n - 1))
    item = s.sample_item(0)
    # from|to|outer_f|outer_t|outer2_f|outer2_t|between
    assert item["triplet"].shape[-1] == 7


def test_prepare_batch_septets_layout():
    from superresolution_aniso_mri_tpu.data import prepare_batch_septets

    q = jnp.arange(2 * 4 * 4 * 7, dtype=jnp.float32).reshape(2, 4, 4, 7)
    image, outer, outer2, between = prepare_batch_septets(q)
    assert image.shape == (4, 4, 4, 1)
    assert outer.shape == (4, 4, 4, 1)
    assert outer2.shape == (4, 4, 4, 1)
    assert between.shape == (2, 4, 4, 1)
    np.testing.assert_allclose(image[:2, ..., 0], q[..., 0])
    np.testing.assert_allclose(image[2:, ..., 0], q[..., 1])
    np.testing.assert_allclose(outer[:2, ..., 0], q[..., 2])
    np.testing.assert_allclose(outer[2:, ..., 0], q[..., 3])
    np.testing.assert_allclose(outer2[:2, ..., 0], q[..., 4])
    np.testing.assert_allclose(outer2[2:, ..., 0], q[..., 5])
    np.testing.assert_allclose(between[..., 0], q[..., 6])
    with pytest.raises(ValueError, match="7C"):
        prepare_batch_septets(q[..., :5])


def test_latent_mix_lanczos3_matches_inference_kernel():
    """The training mix must decode EXACTLY the inference scheme: for a
    z-stack with distinct latents, latent_mix_lanczos3 over the septet
    slots equals the [A, 6]-weight mix the serving core computes over
    taps (-2..3), endpoints reproduced at alpha 0/1."""
    from superresolution_aniso_mri_tpu.ops import (
        lanczos3_weights, latent_mix_lanczos3,
    )

    rng = np.random.default_rng(7)
    b, shape = 3, (2, 2, 4)
    zs = {o: jnp.asarray(rng.normal(size=(b,) + shape), jnp.float32)
          for o in (-2, -1, 0, 1, 2, 3)}
    z = jnp.concatenate([zs[0], zs[1]], axis=0)          # from || to
    z_outer = jnp.concatenate([zs[-1], zs[2]], axis=0)
    z_outer2 = jnp.concatenate([zs[-2], zs[3]], axis=0)
    alphas = jnp.asarray([0.0, 0.3, 0.5, 1.0], jnp.float32)
    w = np.asarray(lanczos3_weights(alphas))             # [A, 6]
    for ai, a in enumerate(np.asarray(alphas)):
        mixed = latent_mix_lanczos3(z, z_outer, z_outer2,
                                    jnp.full((b,), a, jnp.float32))
        expect = sum(w[ai, ti] * np.asarray(zs[o])
                     for ti, o in enumerate((-2, -1, 0, 1, 2, 3)))
        np.testing.assert_allclose(np.asarray(mixed), expect,
                                   rtol=0, atol=2e-6)
    # endpoint interpolation: alpha 0 -> from, alpha 1 -> to
    np.testing.assert_allclose(
        np.asarray(latent_mix_lanczos3(z, z_outer, z_outer2,
                                       jnp.zeros((b,), jnp.float32))),
        np.asarray(zs[0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(latent_mix_lanczos3(z, z_outer, z_outer2,
                                       jnp.ones((b,), jnp.float32))),
        np.asarray(zs[1]), atol=1e-6)


def test_lanczos3_weights_single_source():
    """infer.super_volume must serve through the SAME kernel function
    the training loss imports (no drift between the twins)."""
    from superresolution_aniso_mri_tpu.infer import super_volume as sv
    from superresolution_aniso_mri_tpu.ops import losses

    assert sv.lanczos3_weights is losses.lanczos3_weights


def test_lanczos3_train_step_runs_and_uses_outer2(tmp_path):
    """One ae_combined train step with train_latent_interp='lanczos3':
    runs, and perturbing ONLY the outer2 slices changes the loss (the
    kernel actually reads the 6-tap neighbourhood)."""
    from superresolution_aniso_mri_tpu.train import Trainer

    args = {
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 1,
        "epoch_threshold": -1, "ex_loss_weight1": 0.1,
        "use_batchnorm": False, "use_sigmoid": True,
        "use_laploss": False, "use_percept_loss": False,
        "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
        "output_dir": None, "train_latent_interp": "lanczos3",
    }
    trainer = Trainer(args)
    rng = np.random.default_rng(2)
    b = 4
    batch = {
        "image": jnp.asarray(rng.uniform(size=(2 * b, 32, 32, 1)),
                             jnp.float32),
        "outer": jnp.asarray(rng.uniform(size=(2 * b, 32, 32, 1)),
                             jnp.float32),
        "outer2": jnp.asarray(rng.uniform(size=(2 * b, 32, 32, 1)),
                              jnp.float32),
        "slice_between": jnp.asarray(rng.uniform(size=(b, 32, 32, 1)),
                                     jnp.float32),
        "alpha_from": jnp.full((b,), 0.5, jnp.float32),
        "alpha_to": jnp.full((b,), 0.5, jnp.float32),
    }
    m1 = {k: float(v) for k, v in trainer.validate(batch).items()
          if np.ndim(v) == 0}
    batch2 = dict(batch)
    batch2["outer2"] = batch["outer2"][::-1]
    m2 = {k: float(v) for k, v in trainer.validate(batch2).items()
          if np.ndim(v) == 0}
    assert m1["loss_ae_dist_extra"] != m2["loss_ae_dist_extra"]
    out = trainer.train(batch)
    assert np.isfinite(float(out["loss_ae"]))
    # missing outer2 -> hard error, not silent linear fallback
    bad = {k: v for k, v in batch.items() if k != "outer2"}
    with pytest.raises(ValueError, match="outer2"):
        trainer.validate(bad)


def test_lanczos3_training_cli_end_to_end(tmp_path):
    """train_brain_aesr --train_latent_interp lanczos3 trains (septet
    sampling through the full augmentation/device pipeline) and records
    the flag in settings.yaml."""
    import subprocess
    import sys

    out = tmp_path / "exp"
    r = subprocess.run(
        [sys.executable, "train_brain_aesr.py", "-d", "MNIST3D",
         "-m", "ae_combined", "--downsample_steps", "2",
         "--width", "32", "--latent_width", "16", "--latent", "8",
         "--depth", "8", "-b", "4", "-e", "1", "--epoch_threshold", "-1",
         "--image_mix_loss_func", "mse", "--use_batchnorm", "0",
         "--volume_preview_interval", "0",
         "--train_latent_interp", "lanczos3",
         "-o", str(out), "-id", "exp"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    import yaml
    settings = yaml.safe_load(open(out / "exp" / "settings.yaml"))
    assert settings["train_latent_interp"] == "lanczos3"
