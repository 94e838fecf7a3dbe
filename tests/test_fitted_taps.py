"""Fitted latent tap weights (infer/latent_taps.py) — the learned
z-mixing scheme: table save/load, alpha-row interpolation, synthesis-core
wiring (a table holding the lanczos3 rows must decode bit-identically to
the analytic mode), the optimizer actually improving on its analytic
init, and the CLI/serving plumbing end to end.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.data import make_toy_dataset
from superresolution_aniso_mri_tpu.infer import (
    create_super_volume, fit_latent_taps, fitted_tap_weights,
    load_latent_taps, resolve_latent_interp, save_latent_taps,
)
from superresolution_aniso_mri_tpu.infer.super_volume import (
    lanczos3_weights, make_volume_synthesizer,
)

from test_infer_eval import _toy_trainer

OFFSETS = (-2, -1, 0, 1, 2, 3)


@pytest.fixture(scope="module")
def trainer():
    return _toy_trainer()


def _lanczos3_table(path, alphas):
    w = np.asarray(lanczos3_weights(jnp.asarray(alphas)), np.float32)
    save_latent_taps(path, OFFSETS, np.asarray(alphas, np.float32), w,
                     meta={"downsample_steps": len(alphas) + 1})
    return path


def test_save_load_roundtrip_and_boundary_rows(tmp_path):
    path = str(tmp_path / "taps.npz")
    alphas = np.array([1 / 3, 2 / 3], np.float32)
    w = np.asarray(lanczos3_weights(jnp.asarray(alphas)), np.float32)
    save_latent_taps(path, OFFSETS, alphas, w, meta={"downsample_steps": 3})
    t = load_latent_taps(path)
    # boundary rows alpha=0/1 added as exact deltas on the pair taps
    np.testing.assert_allclose(t["alphas"], [0.0, 1 / 3, 2 / 3, 1.0],
                               atol=1e-6)
    np.testing.assert_allclose(t["weights"][0], [0, 0, 1, 0, 0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(t["weights"][-1], [0, 0, 0, 1, 0, 0],
                               atol=1e-6)
    np.testing.assert_allclose(t["weights"][1:3], w, atol=1e-6)
    assert int(t["meta_downsample_steps"]) == 3

    # shape mismatch rejected
    with pytest.raises(ValueError, match="weights"):
        save_latent_taps(path, OFFSETS, alphas, w[:1])
    # non-table npz rejected
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(ValueError, match="latent-taps"):
        load_latent_taps(bad)


def test_fitted_tap_weights_interpolation():
    alphas = np.array([0.25, 0.75], np.float32)
    w = np.asarray(lanczos3_weights(jnp.asarray(alphas)), np.float32)
    grid = np.concatenate([[0.0], alphas, [1.0]])
    deltas = np.zeros((2, 6), np.float32)
    deltas[0, 2] = deltas[1, 3] = 1.0
    table_w = np.concatenate([deltas[:1], w, deltas[1:]], axis=0)
    # exact at grid rows
    got = np.asarray(fitted_tap_weights(grid, table_w,
                                        jnp.asarray([0.25, 0.75])))
    np.testing.assert_allclose(got, w, atol=1e-6)
    # linear blend between rows
    got_mid = np.asarray(fitted_tap_weights(grid, table_w,
                                            jnp.asarray([0.5])))
    np.testing.assert_allclose(got_mid[0], (w[0] + w[1]) / 2, atol=1e-6)
    # beyond the grid: clamps to the boundary deltas
    got_edge = np.asarray(fitted_tap_weights(grid, table_w,
                                             jnp.asarray([0.0, 1.0])))
    np.testing.assert_allclose(got_edge, deltas, atol=1e-6)


def test_fitted_table_equals_analytic_lanczos3(tmp_path, trainer):
    """A fitted table holding the lanczos3 rows must synthesize
    identically to latent_interp='lanczos3' — pins the whole fitted
    code path (load, row interp, gather, decode) against the analytic
    twin."""
    alphas = np.linspace(0, 1, 4)[1:-1]
    path = _lanczos3_table(str(tmp_path / "taps.npz"), alphas)
    vol = make_toy_dataset(1, 32, 13, seed=3)[0].image
    kw = dict(alpha_range=alphas, downsample_steps=3,
              generate_inbetween_slices=True)
    ref = create_super_volume(trainer, vol, latent_interp="lanczos3", **kw)
    fit = create_super_volume(trainer, vol,
                              latent_interp=f"fitted:{path}", **kw)
    np.testing.assert_allclose(fit["upsampled_image"],
                               ref["upsampled_image"], atol=1e-6)


def test_fitted_bucket_padding_invariance(tmp_path, trainer):
    alphas = [0.25, 0.5, 0.75]
    path = _lanczos3_table(str(tmp_path / "taps.npz"), alphas)
    vol = make_toy_dataset(1, 32, 13, seed=5)[0].image  # kept 5 → pad 8
    kw = dict(alpha_range=alphas, downsample_steps=4,
              generate_inbetween_slices=True,
              latent_interp=f"fitted:{path}")
    res_pad = create_super_volume(trainer, vol, pad_to_bucket=True, **kw)
    res_raw = create_super_volume(trainer, vol, pad_to_bucket=False, **kw)
    np.testing.assert_allclose(res_pad["upsampled_image"],
                               res_raw["upsampled_image"], atol=1e-6)


def test_bare_fitted_mode_errors_guide_the_user(tmp_path, trainer):
    vol = make_toy_dataset(1, 32, 9, seed=7)[0].image
    with pytest.raises(ValueError, match="fit_latent_taps"):
        create_super_volume(trainer, vol, alpha_range=[0.5],
                            downsample_steps=2,
                            generate_inbetween_slices=True,
                            latent_interp="fitted")
    # resolve: no table yet → actionable FileNotFoundError
    with pytest.raises(FileNotFoundError, match="fit_latent_taps"):
        resolve_latent_interp("fitted", str(tmp_path))
    # resolve with a table present → expanded spec; others pass through
    os.makedirs(tmp_path / "models", exist_ok=True)
    path = _lanczos3_table(str(tmp_path / "models" / "latent_taps.npz"),
                           [0.5])
    assert resolve_latent_interp("fitted", str(tmp_path)) == f"fitted:{path}"
    assert resolve_latent_interp("cubic", None) == "cubic"


def test_fit_improves_on_lanczos3_init(trainer):
    """The optimizer must lower the val synthesis MSE below the analytic
    lanczos3 init on toy volumes (and report consistent diagnostics)."""
    vols = make_toy_dataset(2, 32, 13, seed=11)
    res = fit_latent_taps(trainer, vols, 3, steps=60, lr=0.02,
                          batch_pairs=8, seed=0)
    assert res["weights"].shape == (2, 6)
    assert res["loss_final"] <= res["loss_init"]
    assert res["loss_final"] < res["loss_init"] * 0.999  # actually moved
    assert res["n_pairs"] == 2 * 4  # two volumes, (13-1)/3 = 4 pairs each


def test_fit_never_ships_worse_than_init(trainer, monkeypatch):
    """If optimization diverges (e.g. absurd LR), the analytic init is
    returned instead of a degraded table."""
    vols = make_toy_dataset(1, 32, 13, seed=13)
    res = fit_latent_taps(trainer, vols, 3, steps=8, lr=1e3,
                          batch_pairs=4, seed=0)
    assert res["loss_final"] == res["loss_init"]
    np.testing.assert_allclose(
        res["weights"],
        np.asarray(lanczos3_weights(jnp.asarray(res["alphas"]))),
        atol=1e-6)


def test_l2_to_init_trust_region(trainer):
    """A dominant trust-region penalty keeps the table near the
    analytic init (within Adam's ~lr-scale oscillation — Adam
    normalizes gradient magnitude, so 'pinned' means small, not zero),
    while a zero penalty moves substantially further."""
    vols = make_toy_dataset(1, 32, 13, seed=19)
    w0 = None
    dists = {}
    for lam in (0.0, 1e6):
        res = fit_latent_taps(trainer, vols, 3, steps=40, lr=0.02,
                              batch_pairs=4, seed=0, l2_to_init=lam)
        if w0 is None:
            w0 = np.asarray(lanczos3_weights(jnp.asarray(res["alphas"])))
        dists[lam] = float(np.abs(res["weights"] - w0).max())
    assert dists[1e6] < 0.05          # a few lr-sized steps from init
    assert dists[0.0] > 2 * dists[1e6]


def test_fitted_synthesis_beats_analytic_after_fit(tmp_path, trainer):
    """End to end: fit on toy val volumes, save, synthesize with
    'fitted:<path>' — the fitted scheme's synthesis MSE on the fitting
    set must beat analytic lanczos3 (it was optimized for exactly
    this)."""
    vols = make_toy_dataset(2, 32, 13, seed=17)
    ds = 3
    res = fit_latent_taps(trainer, vols, ds, steps=80, lr=0.02,
                          batch_pairs=8, seed=1)
    path = str(tmp_path / "taps.npz")
    save_latent_taps(path, res["offsets"], res["alphas"], res["weights"])

    def synth_mse(latent_interp):
        errs = []
        for v in vols:
            out = create_super_volume(
                trainer, v.image, alpha_range=np.linspace(0, 1, ds + 1)[1:-1],
                downsample_steps=ds, generate_inbetween_slices=True,
                latent_interp=latent_interp)["upsampled_image"]
            n = ((v.image.shape[0] - 1) // ds) * ds + 1
            mask = np.ones(n, bool)
            mask[::ds] = False
            errs.append(np.mean((out[:n][mask] - v.image[:n][mask]) ** 2))
        return float(np.mean(errs))

    assert synth_mse(f"fitted:{path}") < synth_mse("lanczos3")


def test_refit_invalidates_synthesizer_cache(tmp_path, trainer):
    """Re-writing the tap table must not serve the stale compiled
    synthesizer: the cache keys on the file's mtime/size."""
    path = str(tmp_path / "taps.npz")
    alphas = [0.5]
    _lanczos3_table(path, alphas)
    vol = make_toy_dataset(1, 32, 9, seed=33)[0].image
    kw = dict(alpha_range=alphas, downsample_steps=2,
              generate_inbetween_slices=True, use_original=True,
              latent_interp=f"fitted:{path}")
    out1 = create_super_volume(trainer, vol, **kw)["upsampled_image"]
    # overwrite with a visibly different table (pure 2-tap average)
    w = np.zeros((1, 6), np.float32)
    w[0, 2] = w[0, 3] = 0.5
    save_latent_taps(path, OFFSETS, np.asarray(alphas, np.float32), w)
    out2 = create_super_volume(trainer, vol, **kw)["upsampled_image"]
    assert np.abs(out1[1::2] - out2[1::2]).max() > 1e-6

    # unsorted hand-built tables are rejected at load
    import numpy.lib.format  # noqa: F401  (np.savez path)
    bad = str(tmp_path / "unsorted.npz")
    np.savez(bad, offsets=np.asarray(OFFSETS, np.int32),
             alphas=np.array([0.75, 0.25], np.float32),
             weights=np.zeros((2, 6), np.float32))
    with pytest.raises(ValueError, match="ascending"):
        load_latent_taps(bad)


def test_fit_handles_ragged_inplane_shapes(trainer, capsys):
    """Mixed in-plane sizes (ACDC-style): the fitter uses the dominant
    shape and warns about the rest instead of dying in a concatenate."""
    vols = make_toy_dataset(2, 32, 13, seed=29)
    odd = make_toy_dataset(1, 48, 13, seed=31)
    res = fit_latent_taps(trainer, vols + odd, 3, steps=10,
                          batch_pairs=4, seed=0)
    assert res["n_pairs"] == 2 * 4          # only the dominant 32x32 pairs
    assert "ragged" in capsys.readouterr().out


def test_fit_latent_taps_cli(tmp_path):
    """fit_latent_taps CLI over a real (toy) experiment dir: writes
    models/latent_taps.npz with fitting metadata, and find_best_model
    --latent_interp fitted consumes it."""
    from superresolution_aniso_mri_tpu.cli.entry import (
        fit_latent_taps as fit_cli,
    )

    t = _toy_trainer(tmp_path)
    t.prepare_run()
    t.save_models(os.path.join(t.dir_models, "1.models"), 1)
    res = fit_cli(["--exper_dir", str(tmp_path), "--model_nbr", "1",
                   "--downsample_steps", "3", "--steps", "30",
                   "--batch_pairs", "4"])
    out = os.path.join(str(tmp_path), "models", "latent_taps.npz")
    assert os.path.isfile(out)
    table = load_latent_taps(out)
    assert int(table["meta_downsample_steps"]) == 3
    assert str(np.asarray(table["meta_model_nbr"])) == "1"
    assert res["loss_final"] <= res["loss_init"]

    # the sweep accepts the fitted scheme against the same exper dir
    from superresolution_aniso_mri_tpu.evaluate import find_best_val_model
    from superresolution_aniso_mri_tpu.infer import resolve_latent_interp

    vols = make_toy_dataset(2, 32, 13, seed=23)
    li = resolve_latent_interp("fitted", str(tmp_path))
    swept = find_best_val_model(str(tmp_path), vols, 3, epoch_range=[1],
                                batched=True, latent_interp=li)
    assert np.isfinite(swept["history"]["ssim_synth"][0])
