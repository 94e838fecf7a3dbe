"""ACDC auxiliary datasets/tools + crop/perspective transforms
(synthetic fixtures — VERDICT r1 item 9)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from superresolution_aniso_mri_tpu.data import (
    ACDCSRSegImage, acdc_sr_seg_fold, center_4d_volume,
    create_centered_dataset, get_acdc_fold_patient_ids,
    load_acdc_sr_seg_slices, load_uncertainty_data,
)
from superresolution_aniso_mri_tpu.utils import write_image


def test_fold_split_matches_reference_mask():
    """tile(arange(4)[::-1].repeat(5), 5): fold 0 validates patients
    16-20, 36-40, ... (mask==0 positions)."""
    val0 = get_acdc_fold_patient_ids(0, "validation")
    assert len(val0) == 25
    assert list(val0[:5]) == [16, 17, 18, 19, 20]
    tr0 = get_acdc_fold_patient_ids(0, "training")
    assert len(tr0) == 75 and not set(val0) & set(tr0)
    assert len(get_acdc_fold_patient_ids(1, "full")) == 100


@pytest.fixture()
def sr_seg_root(tmp_path):
    """Synthetic SR-seg layout: images_sr/patientNNN.nii.gz [2,z,y,x]
    (ED=0, ES=1), ref_labels/ with integer labels."""
    rng = np.random.RandomState(0)
    root = tmp_path / "acdc_sr"
    (root / "images_sr").mkdir(parents=True)
    (root / "ref_labels").mkdir()
    for num in (16, 17, 18):  # first 3 fold-0 validation patients
        img = rng.rand(2, 6, 24, 24).astype(np.float32)
        lbl = rng.randint(0, 4, (2, 6, 24, 24)).astype(np.int32)
        write_image(str(root / "images_sr" / f"patient{num:03d}.nii.gz"),
                    img, spacing=[5.0, 1.4, 1.4])
        write_image(str(root / "ref_labels" / f"patient{num:03d}.nii.gz"),
                    lbl, spacing=[5.0, 1.4, 1.4])
    return str(root)


def test_acdc_sr_seg_fold_generator(sr_seg_root):
    items = list(acdc_sr_seg_fold(0, sr_seg_root, limited_load=True))
    # 3 patients x 2 phases
    assert len(items) == 6
    phases = [d["cardiac_phase"] for d in items]
    assert phases == ["ED", "ES"] * 3
    d = items[0]
    assert d["image"].shape == (6, 24, 24)
    assert d["reference"].shape == (6, 24, 24)
    assert d["patient_id"] == "patient016"
    assert 0.0 <= d["image"].min() and d["image"].max() <= 1.0  # rescaled


def test_acdc_sr_seg_slices(sr_seg_root):
    samples = load_acdc_sr_seg_slices(0, sr_seg_root, limited_load=True)
    assert len(samples) == 6 * 6
    s = samples[0]
    assert s["image"].shape == (24, 24)
    assert s["cardiac_phase"] == "ED" and s["patient_id"] == "patient016"


def test_acdc_sr_seg_resample(sr_seg_root):
    img = ACDCSRSegImage(16, sr_seg_root, rescale=True, resample=True)
    d = img.ed()
    # 1.4mm→1.4mm: resample is identity here, but spacing bookkeeping
    np.testing.assert_allclose(d["spacing"], [5.0, 1.4, 1.4])
    assert d["image"].shape == (6, 24, 24)


def test_uncertainty_loaders(tmp_path):
    rng = np.random.RandomState(1)
    for kind in ("pred_labels", "umaps", "pred_probs"):
        (tmp_path / kind).mkdir()
    for pid in ("patient016", "patient017"):
        write_image(str(tmp_path / "pred_labels" / f"{pid}_ES.nii.gz"),
                    rng.randint(0, 4, (6, 24, 24)).astype(np.int32),
                    spacing=[5.0, 1.4, 1.4])
        write_image(str(tmp_path / "umaps" / f"{pid}_ES.nii.gz"),
                    rng.rand(6, 24, 24).astype(np.float32),
                    spacing=[5.0, 1.4, 1.4])
        write_image(str(tmp_path / "pred_probs" / f"{pid}_ES.nii.gz"),
                    rng.rand(4, 6, 24, 24).astype(np.float32),
                    spacing=[5.0, 1.4, 1.4])
    d = load_uncertainty_data(str(tmp_path), "ES",
                              ["pred_labels", "umaps", "pred_probs"],
                              one_hot=True)
    assert set(d["pred_labels"]) == {"patient016", "patient017"}
    assert d["pred_labels"]["patient016"].shape == (4, 6, 24, 24)  # one-hot
    assert d["umaps"]["patient017"].shape == (6, 24, 24)
    assert d["pred_probs"]["patient016"].shape == (4, 6, 24, 24)
    single = load_uncertainty_data(str(tmp_path), "ES", "umaps",
                                   patient_id="patient016", meta_info=True)
    assert list(single["umaps"]) == ["patient016"]
    np.testing.assert_allclose(single["umaps"]["patient016"]["spacing"],
                               [5.0, 1.4, 1.4])


def _blob_labels(shape, lv_center, rv_center):
    lbl = np.zeros(shape, np.int32)
    y, x = np.ogrid[:shape[1], :shape[2]]
    lv = (y - lv_center[0]) ** 2 + (x - lv_center[1]) ** 2 < 9
    rv = (y - rv_center[0]) ** 2 + (x - rv_center[1]) ** 2 < 9
    lbl[:, lv] = 3
    lbl[:, rv] = 1
    return lbl


def test_center_4d_volume_moves_midpoint_to_center():
    lbl = _blob_labels((4, 48, 48), lv_center=(30, 34), rv_center=(30, 20))
    img4d = np.zeros((2, 4, 48, 48), np.float32)
    # paint the midpoint neighbourhood so we can find it after warping
    img4d[:, :, 28:33, 25:30] = 1.0
    out = center_4d_volume(img4d, lbl)
    ys, xs = np.nonzero(out[0, 0] > 0.5)
    cy, cx = ys.mean(), xs.mean()
    assert abs(cy - 23.5) < 3 and abs(cx - 23.5) < 3, (cy, cx)


def test_create_centered_dataset(tmp_path):
    src = tmp_path / "src"
    pid = "patient001"
    (src / pid).mkdir(parents=True)
    rng = np.random.RandomState(2)
    img4d = rng.rand(2, 4, 48, 48).astype(np.float32)
    lbl = _blob_labels((4, 48, 48), (30, 34), (30, 20))
    write_image(str(src / pid / f"{pid}_4d.nii.gz"), img4d,
                spacing=[5.0, 1.4, 1.4])
    write_image(str(src / pid / f"{pid}_frame01_gt.nii.gz"), lbl,
                spacing=[5.0, 1.4, 1.4])
    written = create_centered_dataset(str(src), str(tmp_path / "out"))
    assert len(written) == 1 and os.path.isfile(written[0])


# ---------------------------------------------------------------------------
# transforms: crop-next-to-center + perspective
# ---------------------------------------------------------------------------

def test_crop_next_to_center():
    from superresolution_aniso_mri_tpu.data import AugmentConfig, augment_batch

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=32, random_crop=False, rot90=False,
                        intensity=False, crop_next_to_center=True,
                        max_translation=8)
    out = augment_batch(jax.random.PRNGKey(0), x, cfg)
    assert out.shape == (4, 32, 32, 3)
    # window must come from within ±8 px of the center crop: compare with
    # the set of all possible translated center crops
    src = np.asarray(x[0])
    got = np.asarray(out[0])
    found = any(
        np.allclose(src[16 + dy:48 + dy, 16 + dx:48 + dx], got)
        for dy in range(-8, 9) for dx in range(-8, 9))
    assert found


def test_perspective_warp_exact_matrices():
    """Homography warp correctness: identity M is the identity; a pure
    translation M shifts by exactly that many pixels."""
    from superresolution_aniso_mri_tpu.data.transforms import (
        _perspective_warp,
    )

    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(16, 16, 1), jnp.float32)
    out_id = _perspective_warp(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out_id), np.asarray(img),
                               atol=1e-6)
    # dst←src translation by (+2, +3): out[y, x] = in[y-3, x-2]
    m = jnp.asarray([[1.0, 0.0, 2.0], [0.0, 1.0, 3.0], [0.0, 0.0, 1.0]])
    out_t = _perspective_warp(img, m)
    np.testing.assert_allclose(np.asarray(out_t)[3:, 2:],
                               np.asarray(img)[:-3, :-2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t)[:3], 0.0, atol=1e-6)
    # shifted-in COLUMNS must be zero-filled too (a clamp/wrap bug on
    # the x border would leave rows 3+ cols <2 corrupted)
    np.testing.assert_allclose(np.asarray(out_t)[:, :2], 0.0, atol=1e-6)


def test_random_perspective_in_pipeline():
    from superresolution_aniso_mri_tpu.data import AugmentConfig, augment_batch

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=32, random_crop=False, rot90=False,
                        intensity=False, perspective=True)
    out = augment_batch(jax.random.PRNGKey(1), x, cfg)
    assert out.shape == x.shape
    b = np.asarray(out)
    assert np.isfinite(b).all() and not np.allclose(np.asarray(x), b)
    # deterministic per key
    out2 = augment_batch(jax.random.PRNGKey(1), x, cfg)
    np.testing.assert_array_equal(b, np.asarray(out2))


def test_load_acdc_label_volumes(tmp_path):
    from superresolution_aniso_mri_tpu.data import (
        load_acdc_label_volumes, normalize_cardiac_label,
    )
    from superresolution_aniso_mri_tpu.utils import write_image

    rng = np.random.RandomState(0)
    for num in (16, 17):
        pid = f"patient{num:03d}"
        (tmp_path / pid).mkdir()
        for fr in ("01", "12"):
            lbl = rng.randint(0, 4, (6, 20, 20)).astype(np.int32)
            write_image(str(tmp_path / pid / f"{pid}_frame{fr}_gt.nii.gz"),
                        lbl, spacing=[5.0, 1.4, 1.4])
    vols = load_acdc_label_volumes(str(tmp_path), fold=0,
                                   dataset="validation", cardiac_label=3,
                                   resample=False)
    assert len(vols) == 4
    v = vols[0]
    assert set(np.unique(v["image"])) <= {0.0, 2.0}
    assert v["patient_id"] == "patient016" and v["frame_id"] == 1
    # cardiac_label=None keeps all labels
    all_lbl = normalize_cardiac_label(v["labels"], None)
    assert all_lbl.max() == v["labels"].max()


def test_evaluate_sr_segmentation(sr_seg_root, tmp_path):
    """SR-segmentation scoring workflow: predictions in the get_data.py
    layout scored against the SR-seg fold's reference labels."""
    from superresolution_aniso_mri_tpu.evaluate import (
        evaluate_sr_segmentation, score_segmentation,
    )
    from superresolution_aniso_mri_tpu.utils import read_image, write_image

    pred_dir = tmp_path / "preds"
    (pred_dir / "pred_labels").mkdir(parents=True)
    # perfect predictions for patient016, shifted for patient017
    for num in (16, 17):
        pid = f"patient{num:03d}"
        ref, _, _ = read_image(os.path.join(
            sr_seg_root, "ref_labels", f"{pid}.nii.gz"))
        ed = np.asarray(ref, np.int32)[0]
        if num == 17:
            ed = np.roll(ed, 2, axis=1)
        write_image(str(pred_dir / "pred_labels" / f"{pid}_ED.nii.gz"),
                    ed, spacing=[5.0, 1.4, 1.4])

    res = evaluate_sr_segmentation(str(pred_dir), sr_seg_root, fold=0,
                                   cardiac_phases=("ED",),
                                   limited_load=True)
    assert ("patient016", "ED") in res["per_case"]
    perfect = res["per_case"][("patient016", "ED")]
    assert perfect["LV"]["dice"] == 1.0 and perfect["RV"]["dice"] == 1.0
    shifted = res["per_case"][("patient017", "ED")]
    assert shifted["LV"]["dice"] < 1.0
    assert "LV" in res["aggregate"] and "dice" in res["aggregate"]["LV"]

    # direct scorer: empty structures yield nan distances, dice 0
    s = score_segmentation(np.zeros((4, 8, 8), np.int32),
                           np.ones((4, 8, 8), np.int32) * 3)
    assert s["LV"]["dice"] == 0.0 and np.isnan(s["LV"]["hd95"])


def test_centering_flattens_all_quadrants():
    """The LV-RV axis must end horizontal with RV LEFT of LV for every
    quadrant configuration (the reference's abs-delta formula only
    handled two of four)."""
    import scipy.ndimage
    from superresolution_aniso_mri_tpu.data.acdc_aux import (
        center_4d_volume,
    )

    def axis_after(lv, rv):
        lbl = np.zeros((1, 48, 48), np.int32)
        lbl[0, lv[0]-2:lv[0]+2, lv[1]-2:lv[1]+2] = 3
        lbl[0, rv[0]-2:rv[0]+2, rv[1]-2:rv[1]+2] = 1
        out = center_4d_volume(lbl[None].astype(np.float32), lbl)[0, 0]
        lv_c = np.array(scipy.ndimage.center_of_mass(np.abs(out - 3) < 0.6))
        rv_c = np.array(scipy.ndimage.center_of_mass(np.abs(out - 1) < 0.4))
        v = rv_c - lv_c
        return np.degrees(np.arctan2(v[0], v[1]))

    for lv, rv in [((30, 30), (14, 18)), ((14, 18), (30, 30)),
                   ((30, 18), (14, 30)), ((14, 30), (30, 18))]:
        ang = axis_after(lv, rv)
        assert abs(abs(ang) - 180.0) < 6.0, (lv, rv, ang)


def test_center_of_mass_missing_structure_raises():
    from superresolution_aniso_mri_tpu.data.acdc_aux import (
        center_of_mass_segmentation,
    )

    lbl = np.zeros((4, 8, 8), np.int32)
    lbl[1, 2:4, 2:4] = 3  # LV only, no RV
    with pytest.raises(ValueError, match="RV"):
        center_of_mass_segmentation(lbl)


def test_frame_index_handles_1based_info_cfg(tmp_path):
    """Raw ACDC Info.cfg frame ids are 1-based; ES == NbFrame must index
    the LAST frame instead of raising."""
    from superresolution_aniso_mri_tpu.data.acdc_aux import ACDCSRSegImage
    from superresolution_aniso_mri_tpu.utils import write_nifti

    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "images_sr")
    os.makedirs(tmp_path / "info" / "patient077")
    img = rng.rand(30, 4, 8, 8).astype(np.float32)
    write_nifti(str(tmp_path / "images_sr" / "patient077.nii.gz"), img)
    (tmp_path / "info" / "patient077" / "Info.cfg").write_text(
        "ED: 1\nES: 30\nNbFrame: 30\n")
    im = ACDCSRSegImage(77, str(tmp_path), label_dir=None)
    np.testing.assert_allclose(im.ed()["image"], img[0])
    np.testing.assert_allclose(im.es()["image"], img[29])


def test_find_bbox_clamps_padding_at_edges():
    from superresolution_aniso_mri_tpu.data.masi import find_bbox

    m = np.zeros((8, 8), np.float32)
    m[2:5, 0:3] = 1.0  # touches the left edge
    box = find_bbox(m, padding=2)
    assert not box["empty"]
    assert box["slice_x"].start == 0 and box["slice_x"].stop == 5
    crop = m[box["slice_y"], box["slice_x"]]
    assert crop.size > 0 and crop.sum() == m.sum()


def test_sr_seg_slices_carry_reference_labels(tmp_path):
    from superresolution_aniso_mri_tpu.data.acdc_aux import (
        load_acdc_sr_seg_slices, get_acdc_fold_patient_ids,
    )
    from superresolution_aniso_mri_tpu.utils import write_nifti

    rng = np.random.RandomState(1)
    os.makedirs(tmp_path / "images_sr")
    os.makedirs(tmp_path / "ref_labels")
    pat = int(get_acdc_fold_patient_ids(0, "validation")[0])
    img = rng.rand(2, 4, 8, 8).astype(np.float32)
    lbl = rng.randint(0, 4, (2, 4, 8, 8)).astype(np.int16)
    write_nifti(str(tmp_path / "images_sr" / f"patient{pat:03d}.nii.gz"),
                img)
    write_nifti(str(tmp_path / "ref_labels" / f"patient{pat:03d}.nii.gz"),
                lbl, dtype=np.int16)
    samples = load_acdc_sr_seg_slices(0, str(tmp_path), patid=pat)
    assert samples and samples[0]["reference"] is not None
    assert samples[0]["reference"].shape == samples[0]["image"].shape


def test_elastic_runs_after_intensity_zero_border():
    """Ordering invariant (round-3 review): elastic is a zero-fill
    bilinear warp and must run AFTER intensity, so pulled-in border
    pixels stay exactly 0 instead of being pushed through the sigmoid
    intensity map (sigmoid(-gain*cutoff) > 0)."""
    from superresolution_aniso_mri_tpu.data import AugmentConfig, augment_batch

    cfg = AugmentConfig(patch_size=32, random_crop=False, rot90=False,
                        intensity=True, elastic=True, elastic_alpha=20.0)
    x = jnp.ones((4, 32, 32, 3), jnp.float32)
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), x, cfg))
    # intensity was applied (ones remapped below 1)…
    assert out.max() < 1.0
    # …and the elastic zero border survived it untouched
    assert (out == 0.0).sum() > 0
    assert out.min() == 0.0
