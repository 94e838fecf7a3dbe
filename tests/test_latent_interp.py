"""Cubic (Catmull-Rom) latent interpolation — the 4-tap inference-side
alternative to the reference's 2-tap latent lerp
(kwatsch/img_interpolation.py:58-92). Pins the spline-weight math, the
edge-pad rule that keeps bucket padding out of the boundary taps, and
the plumbing through create_super_volume / create_hr_images / the CLI.
"""
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
