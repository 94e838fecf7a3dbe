"""Regression tests for the round-3 session-4 review fixes
(sweep HBM bounds + prepare/evaluate split, shared kept-grid helper,
chunked combo predict, multi-channel patch helpers)."""
import warnings

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_kept_slice_grid_matches_manual_formula():
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        kept_slice_grid,
    )

    for s in (7, 8, 9, 25, 26):
        for ds in (2, 3, 4):
            img = np.arange(s * 4, dtype=np.float32).reshape(s, 2, 2)
            kept, remain = kept_slice_grid(img, ds)
            exp_remain = (s - 1) % ds
            exp = (img[:-exp_remain] if exp_remain else img)[::ds]
            assert remain == exp_remain
            np.testing.assert_array_equal(kept, exp)
            # kept grid always starts at slice 0 and keeps every ds-th
            assert kept.shape[0] == (s - 1) // ds + 1


def test_finite_mean_matches_masked_mean_semantics():
    """_finite_mean is the host twin of ops.masked_mean (drop non-finite,
    NaN on empty) — pin the two against each other so they cannot
    drift."""
    from superresolution_aniso_mri_tpu.evaluate.sweep import _finite_mean
    from superresolution_aniso_mri_tpu.ops import masked_mean

    vals = np.array([1.0, np.nan, 3.0, np.inf, -np.inf, 2.0], np.float32)
    got = _finite_mean(vals)
    ref = float(masked_mean(jnp.asarray(vals),
                            jnp.ones_like(jnp.asarray(vals))))
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    assert np.isnan(_finite_mean(np.array([np.nan, np.inf], np.float32)))
    assert np.isnan(float(masked_mean(
        jnp.asarray([np.nan, np.inf]), jnp.ones((2,)))))


def test_predict_chunked_equals_unchunked():
    from superresolution_aniso_mri_tpu.infer.super_volume import (
        _predict_chunked,
    )

    class _ArrayTrainer:
        def __init__(self):
            self.calls = []

        def predict(self, x):
            self.calls.append(int(x.shape[0]))
            return jnp.asarray(x) * 2.0

    kept = np.random.RandomState(0).rand(11, 4, 4, 1).astype(np.float32)
    t = _ArrayTrainer()
    out = _predict_chunked(t, kept, 4)
    assert t.calls == [4, 4, 3]  # bounded chunks, remainder last
    np.testing.assert_allclose(np.asarray(out), kept * 2.0, rtol=1e-6)
    # unchunked fast path: one call, same values
    t2 = _ArrayTrainer()
    out2 = _predict_chunked(t2, kept, None)
    assert t2.calls == [11]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))

    class _DictTrainer:
        def predict(self, x):
            x = jnp.asarray(x)
            return {"image": x * 0.5, "soft_probs": jnp.tile(x, (1, 1, 1, 3))}

    dt = _DictTrainer()
    d_chunk = _predict_chunked(dt, kept, 4)
    d_full = _predict_chunked(dt, kept, None)
    for k in ("image", "soft_probs"):
        np.testing.assert_allclose(np.asarray(d_chunk[k]),
                                   np.asarray(d_full[k]), rtol=1e-6)


def test_prepare_evaluate_split_reuses_prep_across_params():
    """prepare once, evaluate per checkpoint: the prep must be
    params-independent and two different param sets must actually score
    differently through the same prep."""
    from superresolution_aniso_mri_tpu.data import Volume
    from superresolution_aniso_mri_tpu.evaluate.sweep import (
        evaluate_prepared, evaluate_volumes_batched, prepare_sweep_batches,
    )
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4)
    model = VanillaACAI(cfg)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 16, 16, 1), jnp.float32)
    v1 = model.init(jax.random.PRNGKey(0), x, train=False)
    v2 = model.init(jax.random.PRNGKey(1), x, train=False)

    class _T:
        model_config = cfg

        def __init__(self, variables):
            self._v = variables

        def _ae_model(self):
            return model

        def _ae_params(self):
            return self._v["params"], self._v.get("batch_stats", {})

    vols = [Volume(patient_id=f"p{i}",
                   image=rs.rand(9, 16, 16).astype(np.float32),
                   spacing=np.ones(3, np.float32))
            for i in range(3)]
    t1, t2 = _T(v1), _T(v2)
    prep = prepare_sweep_batches(t1, vols, 2)
    r1 = evaluate_prepared(t1, prep)
    r2 = evaluate_prepared(t2, prep)
    assert set(r1) == {"p0", "p1", "p2"} and set(r2) == set(r1)
    # different weights → different scores through the SAME prep
    assert any(abs(r1[p]["ssim"] - r2[p]["ssim"]) > 1e-6 for p in r1)
    # and the one-shot wrapper agrees exactly with prepare+evaluate
    direct = evaluate_volumes_batched(t1, vols, 2)
    for p in r1:
        for k in r1[p]:
            np.testing.assert_allclose(direct[p][k], r1[p][k], rtol=1e-6,
                                       err_msg=f"{p}/{k}")


def test_patch_helpers_support_multichannel_models():
    from superresolution_aniso_mri_tpu.infer.patches import (
        reconstruct_in_patches,
    )

    class _Cfg:
        colors = 2

    class _T:
        model_config = _Cfg()

        def predict(self, x):
            # a colors=2 stem MUST receive 2 channels; decode returns the
            # MultiChannelAE-style dict
            assert x.shape[-1] == 2, x.shape
            # zero-padded label channel
            np.testing.assert_array_equal(np.asarray(x[..., 1]), 0.0)
            return {"image": jnp.asarray(x[..., :1]) * 0.5,
                    "soft_probs": jnp.zeros(x.shape[:-1] + (4,))}

    vol = np.random.RandomState(1).rand(3, 8, 8).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = reconstruct_in_patches(_T(), vol, patch=4)
    assert any("zeros" in str(x.message) for x in w)
    np.testing.assert_allclose(out, vol * 0.5, rtol=1e-6)


def test_console_mains_return_zero(monkeypatch):
    """pip console wrappers run sys.exit(fn()): the *_main adapters must
    return 0 even though the library functions return useful objects."""
    from superresolution_aniso_mri_tpu.cli import entry

    for main_name, fn_name in (
            ("train_cardiac_main", "train_cardiac"),
            ("train_brain_main", "train_brain"),
            ("generate_hr_volumes_main", "generate_hr_volumes"),
            ("find_best_model_main", "find_best_model"),
            ("serve_hr_volumes_main", "serve_hr_volumes")):
        monkeypatch.setattr(entry, fn_name, lambda *a, **k: object())
        assert getattr(entry, main_name)() == 0


def test_pyproject_scripts_point_at_main_adapters():
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "pyproject.toml")).read()
    for name in ("train_cardiac", "train_brain", "generate_hr_volumes",
                 "find_best_model", "serve_hr_volumes"):
        assert f"cli.entry:{name}_main" in text


def test_mhd_signature_watches_external_payload(tmp_path):
    from superresolution_aniso_mri_tpu.cli.entry import (
        _file_signature, _mhd_payload_path,
    )

    hdr = tmp_path / "vol.mhd"
    hdr.write_text("ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
                   "ElementType = MET_FLOAT\nElementDataFile = vol.raw\n")
    assert _mhd_payload_path(str(hdr)) == str(tmp_path / "vol.raw")
    # payload missing: the signature must never stabilize (two calls
    # differ), so the serving daemon keeps the file pending
    assert _file_signature(str(hdr), "") != _file_signature(str(hdr), "")
    # payload present: signature is stable and covers the payload
    (tmp_path / "vol.raw").write_bytes(b"\0" * 32)
    s1 = _file_signature(str(hdr), "")
    s2 = _file_signature(str(hdr), "")
    assert s1 == s2
    (tmp_path / "vol.raw").write_bytes(b"\0" * 64)  # payload grows
    assert _file_signature(str(hdr), "") != s1
    # .mha / LOCAL data: no payload to watch
    mha = tmp_path / "v.mha"
    mha.write_text("ObjectType = Image\nElementDataFile = LOCAL\n")
    assert _mhd_payload_path(str(mha)) is None


def test_strict_labels_excludes_orphan_label_files(tmp_path):
    import pytest as _pytest

    from superresolution_aniso_mri_tpu.cli.entry import _load_image_paths

    # a label companion lands BEFORE its image (polling daemon race)
    (tmp_path / "a_gt.nii.gz").write_bytes(b"x")
    # default (batch CLI): a suffix-matching file WITHOUT a sibling is a
    # standalone volume and stays included
    assert _load_image_paths(str(tmp_path), "_gt") == [
        str(tmp_path / "a_gt.nii.gz")]
    # strict (daemon): never densify a declared label as an image
    with _pytest.raises(SystemExit):
        _load_image_paths(str(tmp_path), "_gt", strict_labels=True)
    # once the image arrives, only the image is served in both modes
    (tmp_path / "a.nii.gz").write_bytes(b"x")
    for strict in (False, True):
        assert _load_image_paths(str(tmp_path), "_gt",
                                 strict_labels=strict) == [
            str(tmp_path / "a.nii.gz")]


def test_id_uniquifier_convention():
    from superresolution_aniso_mri_tpu.evaluate.metrics_driver import (
        IdUniquifier,
    )

    u = IdUniquifier()
    assert [u.take(p) for p in ("a", "b", "a", "a", "b")] == [
        "a", "b", "a#2", "a#3", "b#2"]


def test_rescale_intensities_removes_nan_voxels():
    from superresolution_aniso_mri_tpu.data import rescale_intensities

    im = np.random.RandomState(0).rand(4, 8, 8).astype(np.float32) * 100
    im[0, :2, :2] = np.nan  # registration fill
    out = rescale_intensities(im, percs=(1, 99))
    assert np.isfinite(out).all(), "NaN voxels must not reach batches"
    assert out.min() >= 0.0 and out.max() <= 1.0
    # NaN fill maps to background (the low percentile → 0 after clip)
    np.testing.assert_allclose(out[0, :2, :2], 0.0, atol=1e-6)
    # NaN-free input unchanged vs before
    im2 = np.random.RandomState(1).rand(4, 8, 8).astype(np.float32)
    out2 = rescale_intensities(im2, percs=(0, 100))
    assert np.isfinite(out2).all()


def test_triplet_sampler_rejects_empty_volume_list():
    from superresolution_aniso_mri_tpu.data import TripletSampler

    with pytest.raises(ValueError, match="no volumes"):
        TripletSampler([], downsample_steps=2)


def test_read_nifti_many_nonstrict_keeps_good_decodes(tmp_path):
    nl = pytest.importorskip(
        "superresolution_aniso_mri_tpu.data.native_loader")
    if not nl.available():
        pytest.skip("native loader unavailable")
    from superresolution_aniso_mri_tpu.utils import write_nifti

    good = str(tmp_path / "good.nii.gz")
    write_nifti(good, np.random.RandomState(0).rand(3, 8, 8)
                .astype(np.float32), spacing=np.ones(3))
    bad = str(tmp_path / "bad.nii.gz")
    open(bad, "wb").write(b"garbage" * 50)
    # strict (default): raises
    with pytest.raises(IOError):
        nl.read_nifti_many([good, bad])
    # non-strict: good decode kept, failed entry None, warning emitted
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = nl.read_nifti_many([good, bad], strict=False)
    assert any("falling back" in str(x.message) for x in w)
    assert res[1] is None and res[0] is not None
    arr, sp, _ = res[0]
    assert arr.shape == (3, 8, 8)


def test_paired_helpers_exported_and_deterministic():
    from superresolution_aniso_mri_tpu.data import (
        get_paired_frames, get_paired_slices,
    )

    rs = np.random.RandomState(0)
    f_from, f_to = get_paired_frames(5, rs)
    assert len(f_from) == len(f_to) == 5
    s1, s2 = get_paired_slices(6, np.random.RandomState(3))
    # n-1 adjacent pairs + one joker self-pair
    assert len(s1) == len(s2) == 6
    assert sum(a == b for a, b in zip(s1.tolist(), s2.tolist())) == 1


def test_rigid_rotation_driver_rotates_hr_and_rejects_4d():
    from superresolution_aniso_mri_tpu.data import Volume
    from superresolution_aniso_mri_tpu.evaluate.drivers import (
        test_interpolation_with_rigid_transformations as rigid,
    )

    class _Cfg:
        colors = 1
        depth = 4

    rs = np.random.RandomState(0)

    class _T:
        model_config = _Cfg()
        params_sr = None

        def _ae_model(self):
            raise AssertionError("not used")

    # 4D volumes must be rejected (rotate would spin the z-y plane)
    v4 = Volume(image=rs.rand(2, 5, 8, 8).astype(np.float32),
                spacing=np.ones(3))
    with pytest.raises(ValueError, match="3D"):
        rigid(_T(), v4, 2, angles=(0,))


def test_reconstruction_eval_supports_multichannel_and_duplicate_ids():
    from superresolution_aniso_mri_tpu.data import Volume
    from superresolution_aniso_mri_tpu.evaluate.reconstruction import (
        evaluate_model_reconstruction,
    )
    from superresolution_aniso_mri_tpu.models.multi_channel import (
        MultiChannelAE,
    )
    from superresolution_aniso_mri_tpu.models import AEConfig

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4, colors=2,
                   nclasses=3, use_sigmoid=True)
    model = MultiChannelAE(cfg)
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(2, 16, 16, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    class _T:
        model_config = cfg

        def _ae_model(self):
            return model

        def predict(self, xx):
            return model.apply(variables, xx, train=False,
                               method=lambda m, a, train: m.decode(
                                   m.encode(a, train=train), train=train))

    vols = [Volume(image=rs.rand(5, 16, 16).astype(np.float32),
                   labels=rs.randint(0, 3, (5, 16, 16)).astype(np.float32),
                   spacing=np.ones(3), patient_id="p") for _ in range(2)]
    res = evaluate_model_reconstruction(_T(), vols)
    # dict decode handled AND both same-id volumes kept
    assert set(res["per_volume"]) == {"p", "p#2"}
    for m in res["per_volume"].values():
        assert np.isfinite(m["ssim"])


def test_phase_volumes_with_explicit_frames_no_lv_needed():
    from superresolution_aniso_mri_tpu.evaluate.clinical import (
        compute_phase_volumes,
    )

    curve = np.array([10.0, 12.0, 8.0, 11.0])
    out = compute_phase_volumes({"RV": curve}, ed_frame=1, es_frame=2)
    assert out["RV"]["EDV"] == 12.0 and out["RV"]["ESV"] == 8.0
    # detection still requires LV
    with pytest.raises(KeyError):
        compute_phase_volumes({"RV": curve})


def test_quantitative_npz_roundtrip_without_pickle(tmp_path):
    from superresolution_aniso_mri_tpu.evaluate.quantitative_comparison \
        import load_results

    f = str(tmp_path / "res.npz")
    np.savez(f, patient_ids=np.array(["a", "b"]),
             ssim=np.array([0.9, 0.8]))
    out = load_results(f)
    assert list(out["patient_ids"]) == ["a", "b"]


def test_nifti_scl_slope_zero_means_no_scaling(tmp_path):
    """NIfTI-1: scl_slope == 0 → no scaling at all; a stale nonzero
    scl_inter must not shift the voxels."""
    import struct

    from superresolution_aniso_mri_tpu.utils.nifti import (
        read_nifti, write_nifti,
    )

    p = str(tmp_path / "v.nii")
    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    write_nifti(p, data, spacing=np.ones(3))
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, 0.0)   # scl_slope = 0
    struct.pack_into("<f", raw, 116, 7.0)   # stale scl_inter
    open(p, "wb").write(bytes(raw))
    arr, _, _ = read_nifti(p)
    np.testing.assert_allclose(arr, data)   # NOT +7
    # slope 2 / inter 1 still applies
    struct.pack_into("<f", raw, 112, 2.0)
    struct.pack_into("<f", raw, 116, 1.0)
    open(p, "wb").write(bytes(raw))
    arr2, _, _ = read_nifti(p)
    np.testing.assert_allclose(arr2, data * 2.0 + 1.0)


def test_nifti_writes_no_contradictory_qform(tmp_path):
    import struct

    from superresolution_aniso_mri_tpu.utils.nifti import write_nifti

    p = str(tmp_path / "v.nii")
    aff = np.eye(4)
    aff[:3, 3] = [5.0, -3.0, 2.0]
    write_nifti(p, np.zeros((2, 2, 2), np.float32), spacing=np.ones(3),
                affine=aff)
    raw = open(p, "rb").read()
    qform, sform = struct.unpack_from("<hh", raw, 252)
    assert qform == 0 and sform == 1  # quaternions are never filled


def test_metaimage_native_byteorder_and_channels_guard(tmp_path):
    from superresolution_aniso_mri_tpu.utils.nifti import read_metaimage

    data = np.arange(8, dtype=">f4").reshape(2, 2, 2)
    p = tmp_path / "be.mha"
    hdr = ("ObjectType = Image\nNDims = 3\nBinaryData = True\n"
           "BinaryDataByteOrderMSB = True\nDimSize = 2 2 2\n"
           "ElementType = MET_FLOAT\nElementDataFile = LOCAL\n")
    p.write_bytes(hdr.encode() + data.tobytes())
    arr, _, _ = read_metaimage(str(p))
    assert arr.dtype == np.float32
    assert arr.dtype == arr.dtype.newbyteorder("=")  # native order out
    np.testing.assert_allclose(arr, data.astype(np.float32))

    pc = tmp_path / "mc.mha"
    pc.write_bytes(("ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
                    "ElementNumberOfChannels = 2\n"
                    "ElementType = MET_FLOAT\nElementDataFile = LOCAL\n"
                    ).encode() + b"\0" * 64)
    with pytest.raises(ValueError, match="Channels"):
        read_metaimage(str(pc))


def test_metaimage_affine_roundtrip(tmp_path):
    from superresolution_aniso_mri_tpu.utils.nifti import (
        read_metaimage, write_metaimage,
    )

    rs = np.random.RandomState(0)
    vol = rs.rand(3, 4, 5).astype(np.float32)
    # rotation about z + translation, columns scaled by (x,y,z) spacing
    c, s = np.cos(0.3), np.sin(0.3)
    aff = np.eye(4)
    aff[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    sp_zyx = np.array([2.0, 1.0, 1.0])
    aff[:3, 0] *= 1.0   # x spacing
    aff[:3, 2] *= 2.0   # z spacing
    aff[:3, 3] = [10.0, -4.0, 2.5]
    p = str(tmp_path / "t.mha")
    write_metaimage(p, vol, spacing=sp_zyx, affine=aff)
    arr, sp, aff2 = read_metaimage(p)
    np.testing.assert_allclose(arr, vol)
    np.testing.assert_allclose(sp, sp_zyx)
    np.testing.assert_allclose(aff2, aff, atol=1e-6)

    # int64 labels get a clear error, not a bare KeyError
    with pytest.raises(ValueError, match="dtype"):
        write_metaimage(str(tmp_path / "l.mha"),
                        np.zeros((2, 2, 2), dtype=bool))
    # MET_LONG_LONG covers int64 labels
    write_metaimage(str(tmp_path / "l64.mha"),
                    np.arange(8).reshape(2, 2, 2))  # int64
    arr64, _, _ = read_metaimage(str(tmp_path / "l64.mha"))
    assert arr64.dtype == np.int64


def test_metaimage_headersize_skip(tmp_path):
    from superresolution_aniso_mri_tpu.utils.nifti import read_metaimage

    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    raw = tmp_path / "v.raw"
    raw.write_bytes(b"JUNK" * 4 + data.tobytes())  # 16-byte prefix
    hdr = tmp_path / "v.mhd"
    hdr.write_text("ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
                   "ElementType = MET_FLOAT\nHeaderSize = 16\n"
                   "ElementDataFile = v.raw\n")
    arr, _, _ = read_metaimage(str(hdr))
    np.testing.assert_allclose(arr, data)
    # HeaderSize = -1: payload is the LAST count*itemsize bytes
    hdr.write_text("ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
                   "ElementType = MET_FLOAT\nHeaderSize = -1\n"
                   "ElementDataFile = v.raw\n")
    arr2, _, _ = read_metaimage(str(hdr))
    np.testing.assert_allclose(arr2, data)


def test_alpha_probe_raw_fallback_normalizes_like_training():
    from superresolution_aniso_mri_tpu.infer.alpha_interp import (
        get_alpha_probe_features,
    )

    feats = get_alpha_probe_features(
        {"spacing": 2.0, "norm_frame_id": 0.5},
        {"slice_id_from": np.array([4]), "slice_id_to": np.array([6]),
         "num_slices": np.array([10])})
    # training rows are ((id+1)/n, ..., n) — data/pairs.py:128-132
    np.testing.assert_allclose(feats[0], [0.5, 0.7, 0.5, 2.0, 10.0],
                               rtol=1e-6)


def test_seg_metric_pair_helpers_match_direct():
    from superresolution_aniso_mri_tpu.evaluate.seg_metrics import (
        assd, assd_from_pair, hd95, hd95_from_pair, surface_distance_pair,
    )

    rs = np.random.RandomState(0)
    a = rs.rand(12, 12, 12) > 0.6
    b = rs.rand(12, 12, 12) > 0.6
    d1, d2 = surface_distance_pair(a, b, voxelspacing=(2.0, 1.0, 1.0))
    np.testing.assert_allclose(hd95_from_pair(d1, d2),
                               hd95(a, b, voxelspacing=(2.0, 1.0, 1.0)))
    np.testing.assert_allclose(assd_from_pair(d1, d2),
                               assd(a, b, voxelspacing=(2.0, 1.0, 1.0)))


def test_use_upsample_flag_reaches_every_decoder_family():
    """config.use_upsample=False (ConvTranspose decoder) must shape the
    param tree of EVERY family embedding a Decoder, not just
    VanillaACAI."""
    from superresolution_aniso_mri_tpu.models import AEConfig, build_model

    for ae_class in ("VanillaACAI", "VAE", "VAE2", "VanillaACAIStrided"):
        cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4,
                       use_upsample=False)
        model = build_model(ae_class, cfg)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 16, 16, 1)), train=False)

        def _has_convtranspose(tree):
            for k, sub in tree.items():
                if k.startswith("ConvTranspose"):
                    return True
                if isinstance(sub, dict) and _has_convtranspose(sub):
                    return True
            return False

        assert _has_convtranspose(v["params"]), \
            f"{ae_class}: use_upsample=False ignored"


def test_aeconfig_swapped_widths_error_is_informative():
    from superresolution_aniso_mri_tpu.models import AEConfig

    with pytest.raises(ValueError, match="power of 2"):
        AEConfig(width=16, latent_width=64)  # swapped — not shift error


def test_mnist_split_guards_and_empty_file(tmp_path):
    from superresolution_aniso_mri_tpu.data.synthetic import (
        load_mnist_images, make_toy_dataset,
    )

    one = str(tmp_path / "one.npy")
    np.save(one, np.random.RandomState(0).rand(1, 28, 28)
            .astype(np.float32))
    with pytest.raises(ValueError, match="at least 2"):
        make_toy_dataset(2, 32, 7, seed=0, mnist_path=one,
                         mnist_split="val")
    empty = str(tmp_path / "none.npy")
    np.save(empty, np.zeros((0, 28, 28), np.float32))
    with pytest.raises(ValueError, match="zero images"):
        load_mnist_images(empty)


def test_augment_batch_accepts_typed_prng_keys():
    from superresolution_aniso_mri_tpu.data import (
        AugmentConfig, augment_batch,
    )

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3),
                    jnp.float32)
    cfg = AugmentConfig(patch_size=16)
    out_legacy = augment_batch(jax.random.PRNGKey(0), x, cfg)
    out_typed = augment_batch(jax.random.key(0), x, cfg)
    # same fold-in stream → identical augmentation
    np.testing.assert_allclose(np.asarray(out_legacy),
                               np.asarray(out_typed), atol=1e-6)


def test_roto_sample_item_honors_idx():
    from superresolution_aniso_mri_tpu.data.synthetic import (
        RotoTripletSampler,
    )

    s = RotoTripletSampler(num_images=3, size=32, downsample_steps=2,
                           seed=5)
    a = s.sample_item(1)
    b = s.sample_item(1)
    # deterministic base image selection (rotations remain stochastic):
    # both items derive from images[1]; cheapest observable contract is
    # that idx does not raise and the random-path default still works
    assert a["triplet"].shape == b["triplet"].shape
    assert s.sample_item()["triplet"].shape == a["triplet"].shape


def test_registry_checkpoint_zero_and_null():
    """checkpoint: 0 is the valid epoch-0 checkpoint; only None/missing
    falls back to the caisr alias."""
    import superresolution_aniso_mri_tpu.evaluate.model_registry as mr

    captured = {}

    def fake_get_trainer(path, model_nbr=None, eval_mode=True):
        captured["nbr"] = model_nbr
        return None

    import superresolution_aniso_mri_tpu.train as train_pkg
    orig = train_pkg.get_trainer
    train_pkg.get_trainer = fake_get_trainer
    try:
        mr.get_trainer_for_spec({"path": "/x", "checkpoint": 0})
        assert captured["nbr"] == 0
        mr.get_trainer_for_spec({"path": "/x", "checkpoint": None})
        assert captured["nbr"] == "caisr"
        mr.get_trainer_for_spec({"path": "/x"})
        assert captured["nbr"] == "caisr"
    finally:
        train_pkg.get_trainer = orig


def test_mhd_payload_path_skips_list_and_patterns(tmp_path):
    from superresolution_aniso_mri_tpu.cli.entry import _mhd_payload_path

    for val in ("LIST", "slice%03d.raw", "LOCAL"):
        p = tmp_path / f"{val.replace('%', 'x')}.mhd"
        p.write_text(f"ObjectType = Image\nElementDataFile = {val}\n")
        assert _mhd_payload_path(str(p)) is None, val


def test_metaimage_headersize_with_compression(tmp_path):
    import zlib

    from superresolution_aniso_mri_tpu.utils.nifti import read_metaimage

    data = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    comp = zlib.compress(data.tobytes())
    raw = tmp_path / "c.raw"
    raw.write_bytes(b"HDRJUNK!" + comp)  # 8-byte on-disk prefix
    hdr = tmp_path / "c.mhd"
    hdr.write_text("ObjectType = Image\nNDims = 3\nDimSize = 2 2 2\n"
                   "ElementType = MET_FLOAT\nCompressedData = True\n"
                   "HeaderSize = 8\nElementDataFile = c.raw\n")
    arr, _, _ = read_metaimage(str(hdr))
    np.testing.assert_allclose(arr, data)


def test_checkpoint_loads_across_optimizer_layout_change(tmp_path):
    """Weights must survive an optimizer-layout change (e.g. the ACAI
    per-model optimizer split): opt moments restart fresh with a
    warning instead of the whole load crashing."""
    import warnings

    import optax
    from superresolution_aniso_mri_tpu.models import AEConfig, VanillaACAI
    from superresolution_aniso_mri_tpu.train.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    from superresolution_aniso_mri_tpu.train.state import (
        SRTrainState, make_optimizer,
    )

    cfg = AEConfig(width=16, latent_width=8, depth=4, latent=4)
    model = VanillaACAI(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                   train=False)
    s_old = SRTrainState.create(apply_fn=model.apply, params=v["params"],
                                tx=make_optimizer(1e-3),
                                batch_stats=v.get("batch_stats", {}))
    path = str(tmp_path / "old.models")
    save_checkpoint(path, s_old, epoch=3)

    # a NEW optimizer layout (multi_transform over the same tree)
    tx_new = optax.multi_transform(
        {"all": make_optimizer(1e-3)},
        lambda p: jax.tree_util.tree_map(lambda _: "all", p))
    s_new = SRTrainState.create(apply_fn=model.apply, params=v["params"],
                                tx=tx_new,
                                batch_stats=v.get("batch_stats", {}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loaded, epoch = load_checkpoint(path, s_new)
    assert epoch == 3
    assert any("optimizer" in str(x.message) for x in w)
    for a, b in zip(jax.tree_util.tree_leaves(loaded.params),
                    jax.tree_util.tree_leaves(s_old.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
