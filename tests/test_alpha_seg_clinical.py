"""Tests: alpha-probe trainer family, segmentation metrics, clinical
metrics, sax→lax resampling, AE+CAISR combiner."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.train import Trainer
from superresolution_aniso_mri_tpu.train.steps import alpha_mix
from superresolution_aniso_mri_tpu.evaluate import seg_metrics as sm
from superresolution_aniso_mri_tpu.evaluate import (
    volumes_over_time, compute_phase_volumes, peak_rates,
    exchange_base_apex, bland_altman_arrays, combine_volumes,
    grid_sample_3d, make_identity_grid,
)


def _alpha_args(model="alpha", alpha_class="AlphaProbe16v1", **over):
    args = {
        "dataset": "MNIST3D", "model": model, "ae_class": "VanillaACAI",
        "alpha_class": alpha_class, "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 2,
        "epoch_threshold": -1, "use_batchnorm": False, "use_sigmoid": True,
        "alpha_loss_func": "mse", "downsample_steps": 2, "seed": 0,
        "output_dir": None,
    }
    args.update(over)
    return args


def _alpha_batch(b=3, w=32):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.rand(2 * b, w, w, 1), jnp.float32),
        "slice_between": jnp.asarray(rng.rand(b, w, w, 1), jnp.float32),
        "alpha_from": jnp.full((b,), 0.5),
        "alpha_to": jnp.full((b,), 0.5),
        "alpha_features": jnp.asarray(rng.rand(b, 5), jnp.float32),
    }


@pytest.mark.parametrize("model", ["alpha", "alpha_end_to_end",
                                   "alpha_only", "alpha_combined"])
def test_alpha_variants_step(model):
    t = Trainer(_alpha_args(model))
    batch = _alpha_batch()
    for _ in range(4):
        m = t.train(batch)
    assert np.isfinite(float(m["loss_ae"]))
    assert "pred_alpha_mean" in m and np.isfinite(float(m["pred_alpha_mean"]))
    val = t.validate(batch)
    assert np.isfinite(float(val["loss_ae"]))


def test_alpha_only_freezes_ae():
    t = Trainer(_alpha_args("alpha_only"))
    batch = _alpha_batch()
    before = jax.tree_util.tree_leaves(t.state.params["ae"])
    before = [np.array(x) for x in before]
    first = t.train(batch)
    for _ in range(14):
        last = t.train(batch)
    # probe learns on the FROZEN latent space → its loss must decrease
    assert float(last["loss_ae"]) < float(first["loss_ae"])
    after = jax.tree_util.tree_leaves(t.state.params["ae"])
    assert len(before) == len(after) > 0
    for x, y in zip(before, after):
        np.testing.assert_array_equal(x, np.array(y))  # frozen = EXACT
    # but the probe moved
    # (compare against a freshly initialised trainer's probe)
    t2 = Trainer(_alpha_args("alpha_only"))
    p_new = jax.tree_util.tree_leaves(t2.state.params["probe"])
    p_cur = jax.tree_util.tree_leaves(t.state.params["probe"])
    assert any(not np.allclose(a, b) for a, b in zip(p_new, p_cur))


@pytest.mark.parametrize("alpha_class,nout", [
    ("AlphaProbe", 2), ("AlphaProbe16Convex", 8),
    ("AlphaProbe16v1", 16), ("AlphaProbe256v1", 256),
])
def test_alpha_probe_classes_in_trainer(alpha_class, nout):
    t = Trainer(_alpha_args("alpha", alpha_class=alpha_class))
    # coefficient-count routing must match the probe class
    # (reference: base_alpha_trainer.py:141-154)
    assert t.num_alphas == nout
    m = t.train(_alpha_batch())
    assert np.isfinite(float(m["loss_ae"]))


def test_alpha_mix_schemes():
    rng = np.random.RandomState(0)
    z1 = jnp.asarray(rng.rand(2, 4, 4, 8), jnp.float32)
    z3 = jnp.asarray(rng.rand(2, 4, 4, 8), jnp.float32)
    # per-channel convex (num_alphas == latent)
    a = jnp.asarray(rng.rand(2, 8), jnp.float32)
    out = np.asarray(alpha_mix(a, z1, z3, 8, 8))
    expect = (np.asarray(a)[:, None, None, :] * np.asarray(z1)
              + (1 - np.asarray(a)[:, None, None, :]) * np.asarray(z3))
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    # two halves
    a2 = jnp.asarray(rng.rand(2, 16), jnp.float32)
    out2 = np.asarray(alpha_mix(a2, z1, z3, 16, 8))
    expect2 = (np.asarray(a2)[:, None, None, :8] * np.asarray(z1)
               + np.asarray(a2)[:, None, None, 8:] * np.asarray(z3))
    np.testing.assert_allclose(out2, expect2, rtol=1e-6)
    # spatial
    a3 = jnp.asarray(rng.rand(2, 16), jnp.float32)
    out3 = np.asarray(alpha_mix(a3, z1, z3, 16 * 16 // 16, 99))
    assert out3.shape == z1.shape


# ---------------------------------------------------------------------------
# segmentation metrics
# ---------------------------------------------------------------------------

def _sphere(shape, center, radius):
    grid = np.indices(shape).astype(float)
    d = np.sqrt(sum((g - c) ** 2 for g, c in zip(grid, center)))
    return d <= radius


def test_dice_jaccard_identical():
    a = _sphere((20, 20, 20), (10, 10, 10), 6)
    assert sm.dc(a, a) == 1.0
    assert sm.jc(a, a) == 1.0
    assert sm.precision(a, a) == 1.0
    assert sm.recall(a, a) == 1.0


def test_dice_known_value():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[:, :6] = True   # 60
    b[:, 4:] = True   # 60, overlap 20
    np.testing.assert_allclose(sm.dc(a, b), 2 * 20 / 120)
    np.testing.assert_allclose(sm.jc(a, b), 20 / 100)


def test_hausdorff_shifted_boxes():
    a = np.zeros((20, 20), bool)
    b = np.zeros((20, 20), bool)
    a[5:10, 5:10] = True
    b[5:10, 8:13] = True  # shifted 3 in x
    assert sm.hd(a, b) == 3.0
    assert sm.hd95(a, b) <= 3.0
    assert 0 < sm.assd(a, b) <= 3.0
    assert sm.asd(a, a[:]) == 0.0


def test_hd_voxelspacing():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[5, 5] = True
    b[5, 7] = True
    assert sm.hd(a, b, voxelspacing=(1.0, 2.0)) == 4.0


def test_ravd_and_volume_correlation():
    a = np.zeros((10, 10), bool); a[:5] = True
    b = np.zeros((10, 10), bool); b[:4] = True
    np.testing.assert_allclose(sm.ravd(a, b), (50 - 40) / 40)
    r, p = sm.volume_correlation([a, b, a], [a, b, a])
    np.testing.assert_allclose(r, 1.0)


# ---------------------------------------------------------------------------
# clinical metrics
# ---------------------------------------------------------------------------

def test_clinical_pipeline():
    # synthetic label cine: LV shrinks from frame 0 (ED) to frame 2 (ES)
    t_frames, z, y, x = 5, 4, 16, 16
    labels = np.zeros((t_frames, z, y, x), np.int32)
    sizes = [6, 5, 3, 4, 6]
    for t, r in enumerate(sizes):
        for zz in range(z):
            labels[t, zz][_sphere((y, x), (8, 8), r)] = 3  # LV
            labels[t, zz][_sphere((y, x), (3, 3), 2)] = 1  # RV constant
    curves = volumes_over_time(labels, voxel_volume_ml=0.001)
    pv = compute_phase_volumes(curves)
    assert pv["ed_frame"] in (0, 4) and pv["es_frame"] == 2
    assert pv["LV"]["EDV"] > pv["LV"]["ESV"]
    assert 0 < pv["LV"]["EF"] < 100
    rates = peak_rates(curves["LV"])
    assert rates["peak_ejection_rate"] > 0
    assert rates["peak_filling_rate"] > 0

    ba = bland_altman_arrays([50, 60, 55], [52, 58, 54])
    assert ba["loa_low"] < ba["bias"] < ba["loa_high"]

    ex = exchange_base_apex(labels[0], labels[2], num_slices=1)
    np.testing.assert_array_equal(ex[0], labels[2][0])
    np.testing.assert_array_equal(ex[-1], labels[2][-1])
    np.testing.assert_array_equal(ex[1], labels[0][1])


# ---------------------------------------------------------------------------
# sax→lax grid sampling + combiner
# ---------------------------------------------------------------------------

def test_grid_sample_identity():
    vol = np.random.RandomState(0).rand(6, 8, 10).astype(np.float32)
    d, h, w = vol.shape
    grid = make_identity_grid((d, h, w))  # (x, y, z) voxel coords
    norm = grid / ((np.array([w, h, d], np.float32) - 1) / 2) - 1.0
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(norm)))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_combine_volumes():
    ds = 3
    ae = np.zeros((13, 4, 4), np.float32)
    caisr = np.ones((13, 4, 4), np.float32)
    out = combine_volumes(ae, caisr, ds)
    # grid slices (0,3,6,9,12) come from ae (zeros), rest from caisr
    assert out[::3].sum() == 0
    assert out.sum() == (13 - 5) * 16
    # 4d variant
    out4 = combine_volumes(ae[None], caisr[None], ds)
    assert out4.shape == (1, 13, 4, 4)


def test_latent_space_interp_pred_alpha():
    """Probe-predicted mixing at inference
    (reference: kwatsch/alpha/img_interpolation.py:44-92)."""
    from superresolution_aniso_mri_tpu.infer import (
        latent_space_interp_pred_alpha, synthesize_cardiac_features,
    )
    from superresolution_aniso_mri_tpu.train import Trainer

    t = Trainer({
        "dataset": "ACDC", "model": "alpha_end_to_end",
        "ae_class": "VanillaACAI", "alpha_class": "AlphaProbe16v1",
        "width": 32, "latent_width": 16, "depth": 4, "latent": 4,
        "batch_size": 2, "lr": 1e-3, "epochs": 1, "downsample_steps": 2,
        "seed": 0, "output_dir": None, "use_batchnorm": False,
        "use_sigmoid": True,
    })
    feats = synthesize_cardiac_features(0.5, 9, 5.0, downsample_steps=2)
    assert feats.shape == (4, 5)
    np.testing.assert_allclose(feats[:, 2], 0.5)

    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(4, 32, 32, 1), jnp.float32)
    img2 = jnp.asarray(rng.rand(4, 32, 32, 1), jnp.float32)
    decoded, alphas = latent_space_interp_pred_alpha(
        t, img1, img2, downsample_steps=2,
        feature_dict={"anatomy": "cardiac", "norm_frame_id": 0.5,
                      "orig_num_slices": 9, "spacing": 5.0})
    assert decoded.shape == (4, 32, 32, 1)
    assert alphas.shape == (4, 2 * 4)  # AlphaProbe16v1 → 2*latent
    assert np.isfinite(np.asarray(decoded)).all()


def test_alpha_batch_without_features_raises():
    """Round-3 review: a missing 'alpha_features' key must raise at
    trace time (train AND validate), never silently train the probe on
    zeros — inference feeds real slice-geometry features
    (infer/alpha_interp.get_alpha_probe_features raises likewise)."""
    t = Trainer(_alpha_args("alpha"))
    batch = {k: v for k, v in _alpha_batch().items()
             if k != "alpha_features"}
    with pytest.raises(KeyError, match="alpha_features"):
        t.train(batch)
    with pytest.raises(KeyError, match="alpha_features"):
        t.validate(batch)
