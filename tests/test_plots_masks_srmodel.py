"""Tests: plotting API, loss masks, elastic aug, AE+CAISR second model."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_aniso_mri_tpu.data.masks import (
    make_loss_mask, masks_for_volume,
)
from superresolution_aniso_mri_tpu.data.transforms import (
    AugmentConfig, augment_batch,
)
from superresolution_aniso_mri_tpu.evaluate.plots import (
    metric_boxplots, qualitative_comparison_figure, long_axis_strip,
    bland_altman_plot,
)
from superresolution_aniso_mri_tpu.data import make_toy_dataset
from superresolution_aniso_mri_tpu.infer import create_super_volume
from superresolution_aniso_mri_tpu.train import Trainer


def test_loss_masks():
    lbl = np.zeros((16, 16), np.int32)
    lbl[6:10, 6:10] = 2
    m = make_loss_mask(lbl, dilation_iters=2)
    assert m.shape == lbl.shape
    assert m.sum() > 16
    vol = np.zeros((3, 16, 16), np.int32)
    vol[1, 6:10, 6:10] = 3
    mv = masks_for_volume(vol, 2)
    assert mv[0].all() and mv[2].all()      # empty slices → ones
    assert 16 < mv[1].sum() < 256


def test_elastic_augmentation():
    rng = np.random.RandomState(0)
    triplet = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=32, random_crop=False, rot90=False,
                        intensity=False, elastic=True, elastic_alpha=3.0)
    out = augment_batch(jax.random.PRNGKey(0), triplet, cfg)
    assert out.shape == triplet.shape
    # deformation changes the image but geometric consistency holds
    assert not np.allclose(np.asarray(out), np.asarray(triplet))
    same = jnp.asarray(np.repeat(rng.rand(2, 32, 32, 1), 3, -1))
    outc = np.asarray(augment_batch(jax.random.PRNGKey(1), same, cfg))
    np.testing.assert_allclose(outc[..., 0], outc[..., 2], atol=1e-6)


def test_plots(tmp_path):
    rng = np.random.RandomState(0)
    res = {"model": {"ssim_synth": rng.rand(5) * 0.1 + 0.9,
                     "psnr_synth": rng.rand(5) + 30,
                     "vif_synth": rng.rand(5) * 0.1 + 0.8},
           "linear": {"ssim_synth": rng.rand(5) * 0.1 + 0.85,
                      "psnr_synth": rng.rand(5) + 28,
                      "vif_synth": rng.rand(5) * 0.1 + 0.75}}
    p1 = str(tmp_path / "box.png")
    metric_boxplots(res, save_path=p1)
    assert os.path.isfile(p1)

    vol = rng.rand(9, 16, 16).astype(np.float32)
    p2 = str(tmp_path / "qual.png")
    qualitative_comparison_figure(vol, {"m": vol}, save_path=p2)
    assert os.path.isfile(p2)

    p3 = str(tmp_path / "lax.png")
    long_axis_strip(vol, save_path=p3)
    assert os.path.isfile(p3)

    p4 = str(tmp_path / "ba.png")
    bland_altman_plot([50, 55, 60], [52, 54, 61], save_path=p4)
    assert os.path.isfile(p4)


def _toy_trainer(seed=0):
    return Trainer({
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 2,
        "epoch_threshold": -1, "ex_loss_weight1": 0.01,
        "use_batchnorm": False, "use_sigmoid": True, "use_laploss": False,
        "use_percept_loss": False, "image_mix_loss_func": "mse",
        "downsample_steps": 2, "seed": seed, "output_dir": None,
    })


def test_second_sr_model_combo(tmp_path):
    """AE reconstructions + CAISR synthesis (reference model_nbr_sr)."""
    t_ae = _toy_trainer(seed=0)
    t_sr = _toy_trainer(seed=99)          # different params
    ckpt = str(tmp_path / "caisr.models")
    t_sr.save_models(ckpt, 5)

    vol = make_toy_dataset(1, 32, 7, seed=2)[0]
    base = create_super_volume(t_ae, vol.image, alpha_range=[0.5],
                               downsample_steps=2,
                               generate_inbetween_slices=True)

    t_ae.load_caisr(ckpt)
    combo = create_super_volume(t_ae, vol.image, alpha_range=[0.5],
                                downsample_steps=2,
                                generate_inbetween_slices=True)
    # recon (even) slices identical (primary model), synth slices differ
    np.testing.assert_allclose(combo["upsampled_image"][::2],
                               base["upsampled_image"][::2], atol=1e-6)
    assert not np.allclose(combo["upsampled_image"][1::2],
                           base["upsampled_image"][1::2])
    # encode/decode honour the use_sr_model switch
    x = jnp.asarray(vol.image[:2])[..., None]
    z_ae = np.asarray(t_ae.encode(x))
    z_sr = np.asarray(t_ae.encode(x, use_sr_model=True))
    assert not np.allclose(z_ae, z_sr)


def test_figure_zoo(tmp_path):
    """Remaining reference figure families (journal2/spie2021 scripts)
    condensed into the plots API — each saves a non-empty png."""
    from superresolution_aniso_mri_tpu.evaluate.plots import (
        compare_methods_slices, interpolation_sequence_figure,
        lax_views_compare, orthogonal_views_figure, reconstructions_grid,
        upsample_factor_compare,
    )

    rng = np.random.RandomState(0)
    vol = rng.rand(8, 24, 24).astype(np.float32)
    paths = []

    p = str(tmp_path / "upsample.png")
    upsample_factor_compare(
        {"caisr": {2: [0.9, 0.92], 4: [0.85, 0.86], 6: [0.8, 0.81]},
         "linear": {2: [0.88, 0.89], 4: [0.8, 0.82], 6: [0.75, 0.74]}},
        save_path=p); paths.append(p)

    p = str(tmp_path / "seq.png")
    interpolation_sequence_figure(vol[0], vol[1:4], vol[4],
                                  ground_truth=vol[4:7], save_path=p)
    paths.append(p)

    p = str(tmp_path / "cmp.png")
    compare_methods_slices(vol[0], {"caisr": vol[1], "linear": vol[2]},
                           save_path=p); paths.append(p)

    p = str(tmp_path / "recon_grid.png")
    reconstructions_grid({"caisr": vol, "linear": vol}, [0, 3, 6],
                         save_path=p); paths.append(p)

    p = str(tmp_path / "ortho.png")
    orthogonal_views_figure(vol, save_path=p); paths.append(p)

    p = str(tmp_path / "lax.png")
    lax_views_compare({"caisr": vol, "linear": vol}, save_path=p)
    paths.append(p)

    for p in paths:
        assert os.path.isfile(p) and os.path.getsize(p) > 1000


def test_spie2021_pages(tmp_path):
    """SPIE-2021 per-paper layouts (evaluate/plots/spie2021/*,
    compare_methods.py): every page renders and saves non-empty files;
    the grid page returns the per-method RMSE book and the LAX pages
    use the reference filename pattern."""
    from superresolution_aniso_mri_tpu.evaluate.spie2021 import (
        interpol_example_page, lax_view_pages, methods_grid_page,
        presentation_slice_pages, spie_boxplot_page,
        two_method_slice_compare,
    )

    rng = np.random.RandomState(1)
    vol = rng.rand(8, 24, 24).astype(np.float32)

    p = str(tmp_path / "spie_box.png")
    labels = ["Linear", "B-spline", "Lanczos", "AE"]
    vecs = {k: [rng.rand(6) for _ in labels]
            for k in ("ssim", "psnr", "vif")}
    spie_boxplot_page(vecs, labels, save_path=p)
    assert os.path.getsize(p) > 1000

    lax_dir = str(tmp_path / "lax")
    method_dict = {
        "reference": {"p01": {"image": vol, "spacing": (5.0, 1.0, 1.0)}},
        "caisr": {"p01": {"image": vol, "spacing": (1.0, 1.0, 1.0)}},
    }
    cuts = lax_view_pages(method_dict, "p01", slice_id=10,
                          num_interpolations=4, with_diff_image=True,
                          fig_dir=lax_dir)
    assert set(cuts) == {"reference", "caisr"}
    assert cuts["caisr"].shape == (8, 24)
    assert os.path.isfile(os.path.join(lax_dir,
                                       "caisr_lax_pp01_s10_4x.png"))
    # x_crop = the reference's slice_info column window; figures close
    cuts2 = lax_view_pages(method_dict, "p01", slice_id=10,
                           num_interpolations=4, x_crop=(4, 20))
    assert cuts2["caisr"].shape == (8, 16)
    import matplotlib.pyplot as _mpl_plt
    assert len(_mpl_plt.get_fignums()) == 0, "figure leak"

    p = str(tmp_path / "grid.png")
    rmse = methods_grid_page({"original": vol, "caisr": vol + 0.01,
                              "linear": vol}, slice_id1=2, slice_id2=5,
                             save_path=p)
    assert os.path.getsize(p) > 1000
    assert abs(rmse["caisr"][2] - 0.01) < 1e-5
    assert rmse["linear"][5] == 0.0

    p = str(tmp_path / "interp.png")
    interpol_example_page(vol[:5], vol[5:8], save_path=p)
    assert os.path.getsize(p) > 1000

    pres_dir = str(tmp_path / "pres")
    written = presentation_slice_pages(
        {"reference": vol, "caisr": vol, "linear": vol}, "p01",
        slice_id=3, fig_dir=pres_dir)
    names = sorted(os.path.basename(w) for w in written)
    assert "reference_sax_pp01_s2.png" in names
    assert "caisr_sax_diff_pp01_s3.png" in names
    assert len(names) == 5   # 3 reference slices + 2 method diff pages
    # edge slice: out-of-volume neighbours are skipped, not wrapped
    written0 = presentation_slice_pages(
        {"reference": vol, "caisr": vol}, "p02", slice_id=0,
        fig_dir=pres_dir)
    names0 = [os.path.basename(w) for w in written0]
    assert not any("_s-1" in n for n in names0)
    assert len(names0) == 3  # slices 0,1 + 1 method diff page

    p = str(tmp_path / "two.png")
    two_method_slice_compare(vol, vol + 0.02, vol, slice_range=[1, 4],
                             m1_desc="caisr", m2_desc="linear",
                             save_path=p)
    assert os.path.getsize(p) > 1000


def test_seg_colormap_and_overlay(tmp_path):
    from superresolution_aniso_mri_tpu.evaluate.plots import (
        SegColorMap, label_overlay_figure,
    )

    cm = SegColorMap()
    lbl = np.array([[0, 1], [2, 3]])
    rgba = cm.convert_multi_labels(lbl)
    assert rgba.shape == (2, 2, 4)
    assert rgba[0, 0, -1] == 0.0      # background transparent
    assert rgba[0, 1, -1] > 0.5
    p = str(tmp_path / "overlay.png")
    img = np.random.RandomState(0).rand(24, 24)
    label_overlay_figure(img, np.random.RandomState(1).randint(
        0, 4, (24, 24)), acdc=True, save_path=p)
    assert os.path.getsize(p) > 1000


def test_animate_volume(tmp_path):
    from superresolution_aniso_mri_tpu.evaluate.plots import animate_volume

    vol = np.random.RandomState(0).rand(4, 16, 16).astype(np.float32)
    p = animate_volume(vol, str(tmp_path / "vol.gif"), interval_ms=50)
    assert os.path.isfile(p) and os.path.getsize(p) > 500
