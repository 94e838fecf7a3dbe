"""Batched multi-volume synthesis (create_super_volumes) must be the
single-volume path, exactly: same grouping semantics the sweep
evaluator pins for scoring, but for the SERVING outputs
(reference serves one volume per python loop iteration,
generate_hr_volumes.py:159-209 — here same-shaped volumes share one
vmapped device program)."""
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.infer import (
    create_super_volume, create_super_volumes,
)
from superresolution_aniso_mri_tpu.train import Trainer


def _toy_trainer(**over):
    args = {
        "dataset": "MNIST3D", "model": "ae_combined",
        "ae_class": "VanillaACAI", "width": 32, "latent_width": 16,
        "depth": 8, "latent": 8, "colors": 1, "lr": 1e-3,
        "weight_decay": 0.0, "batch_size": 4, "epochs": 2,
        "epoch_threshold": -1, "ex_loss_weight1": 0.01,
        "use_batchnorm": False, "use_sigmoid": True,
        "use_laploss": False, "use_percept_loss": False,
        "image_mix_loss_func": "mse", "downsample_steps": 2, "seed": 0,
        "output_dir": None,
    }
    args.update(over)
    return Trainer(args)


@pytest.fixture(scope="module")
def trainer():
    return _toy_trainer()


def _rand_volumes(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.rand(*s).astype(np.float32) for s in shapes]


def _assert_results_match(batched, singles):
    assert len(batched) == len(singles)
    for rb, rs in zip(batched, singles):
        np.testing.assert_allclose(rb["upsampled_image"],
                                   rs["upsampled_image"],
                                   rtol=0, atol=2e-5)
        np.testing.assert_allclose(rb["pred_alphas"], rs["pred_alphas"])
        if rs["upsampled_labels"] is None:
            assert rb["upsampled_labels"] is None
        else:
            np.testing.assert_allclose(rb["upsampled_labels"],
                                       rs["upsampled_labels"], atol=2e-5)


def test_batched_matches_single_mixed_shapes(trainer):
    """Three shape groups incl. a tail-bearing slice count (10 kept
    from 21 at ds=2 vs 11 exact) in one call."""
    vols = _rand_volumes([(13, 32, 32), (21, 32, 32), (13, 32, 32),
                          (13, 24, 24)])
    kwargs = dict(alpha_range=[0.5], downsample_steps=2)
    batched = create_super_volumes(trainer, vols, **kwargs)
    singles = [create_super_volume(trainer, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)


def test_batched_inbetween_mode_with_labels(trainer):
    vols = _rand_volumes([(9, 32, 32), (9, 32, 32), (8, 32, 32)], seed=1)
    rng = np.random.RandomState(2)
    lbls = [rng.randint(0, 3, v.shape).astype(np.int32) for v in vols]
    kwargs = dict(alpha_range=[0.5], generate_inbetween_slices=True,
                  downsample_steps=2)
    batched = create_super_volumes(trainer, vols, labels_list=lbls,
                                   **kwargs)
    singles = [create_super_volume(trainer, v, labels=l, **kwargs)
               for v, l in zip(vols, lbls)]
    _assert_results_match(batched, singles)


def test_batched_use_original(trainer):
    vols = _rand_volumes([(7, 32, 32), (7, 32, 32)], seed=3)
    kwargs = dict(alpha_range=[0.25, 0.5, 0.75], use_original=True)
    batched = create_super_volumes(trainer, vols, **kwargs)
    singles = [create_super_volume(trainer, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)
    # originals survive verbatim in both
    np.testing.assert_allclose(batched[0]["upsampled_image"][::4],
                               np.clip(vols[0], 0, 1), atol=1e-6)


def test_batched_latent_interp_cubic(trainer):
    """Multi-tap scheme: edge-replicated bucket padding must match the
    single path's boundary-tap semantics."""
    vols = _rand_volumes([(11, 32, 32), (11, 32, 32)], seed=4)
    kwargs = dict(alpha_range=[0.5], downsample_steps=2,
                  latent_interp="cubic")
    batched = create_super_volumes(trainer, vols, **kwargs)
    singles = [create_super_volume(trainer, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)


def test_batched_chunk_padding(trainer, monkeypatch):
    """Force max_b=1-sized... rather: a tiny batch budget so the group
    splits into padded chunks — outputs must still match per-volume."""
    from superresolution_aniso_mri_tpu.infer import super_volume as sv
    monkeypatch.setattr(sv, "_BATCH_ACT_BUDGET_BYTES", 1)
    vols = _rand_volumes([(9, 32, 32)] * 3, seed=5)
    kwargs = dict(alpha_range=[0.5], downsample_steps=2)
    batched = sv.create_super_volumes(trainer, vols, **kwargs)
    singles = [create_super_volume(trainer, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)


def test_batched_single_volume_falls_back(trainer):
    vols = _rand_volumes([(9, 32, 32)], seed=6)
    kwargs = dict(alpha_range=[0.5], downsample_steps=2)
    batched = create_super_volumes(trainer, vols, **kwargs)
    singles = [create_super_volume(trainer, vols[0], **kwargs)]
    _assert_results_match(batched, singles)


def test_batched_tta_falls_back(trainer):
    vols = _rand_volumes([(9, 32, 32), (9, 32, 32)], seed=7)
    kwargs = dict(alpha_range=[0.5], downsample_steps=2, tta="flips")
    batched = create_super_volumes(trainer, vols, **kwargs)
    singles = [create_super_volume(trainer, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)


def test_batched_multichannel_decoded_labels():
    """MultiChannelAE: decoded class ids ride through the batched
    interleave identically to the single path."""
    t = _toy_trainer(dataset="ACDCLBL", ae_class="MultiChannelAE",
                     colors=2, nclasses=3, width=16, latent_width=8,
                     depth=4, latent=4)
    vols = _rand_volumes([(9, 16, 16), (9, 16, 16), (7, 16, 16)], seed=8)
    rng = np.random.RandomState(9)
    lbls = [rng.randint(0, 3, v.shape).astype(np.float32) for v in vols]
    kwargs = dict(alpha_range=[0.5], downsample_steps=2)
    batched = create_super_volumes(t, vols, labels_list=lbls, **kwargs)
    singles = [create_super_volume(t, v, labels=l, **kwargs)
               for v, l in zip(vols, lbls)]
    _assert_results_match(batched, singles)
    assert batched[0]["upsampled_labels"] is not None


def test_batched_vae_routes_bottleneck():
    t = _toy_trainer(model="vae", ae_class="VAE", width=16,
                     latent_width=8, depth=4, latent=4)
    vols = _rand_volumes([(9, 16, 16), (9, 16, 16)], seed=10)
    kwargs = dict(alpha_range=[0.5], downsample_steps=2)
    batched = create_super_volumes(t, vols, **kwargs)
    singles = [create_super_volume(t, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)


def test_batched_labels_list_length_mismatch(trainer):
    vols = _rand_volumes([(9, 32, 32), (9, 32, 32)], seed=11)
    with pytest.raises(ValueError, match="labels_list"):
        create_super_volumes(trainer, vols, labels_list=[None],
                             alpha_range=[0.5], downsample_steps=2)


def test_batch_volume_cap_honors_explicit_chunk():
    """max_b must be sized from the caller's decode_batch in-flight
    bytes: an explicit None (unchunked) keeps the WHOLE decode stack in
    flight per volume, so fewer volumes fit than under the auto chunk."""
    from superresolution_aniso_mri_tpu.infer import super_volume as sv
    k_pad, a_n, h, w, depth = 128, 5, 128, 128, 64
    auto_db, auto_b = sv._batch_volume_cap(k_pad, a_n, h, w, depth)
    assert auto_db is not None  # this shape is big enough to auto-chunk
    none_db, none_b = sv._batch_volume_cap(k_pad, a_n, h, w, depth,
                                           decode_batch=None)
    assert none_db is None
    assert none_b < auto_b
    # explicit chunk smaller than auto → at least as many volumes fit
    small_db, small_b = sv._batch_volume_cap(k_pad, a_n, h, w, depth,
                                             decode_batch=32)
    assert small_db == 32 and small_b >= auto_b
    # ...but never unboundedly many: the chunk only bounds decode
    # activations, while the per-volume OUTPUT stack (and kept input /
    # latents) stays resident regardless — a tiny chunk must not let
    # B * output bytes overcommit the budget (review finding: the old
    # sizing charged nothing chunk-independent, so decode_batch=8 on
    # 512-slice 256^2 volumes admitted 16 volumes ~ 12 GB of outputs)
    n_dec = k_pad + (k_pad - 1) * a_n
    out_bytes = n_dec * h * w * 4
    tiny_db, tiny_b = sv._batch_volume_cap(k_pad, a_n, h, w, depth,
                                           decode_batch=8)
    assert tiny_b * out_bytes <= sv._BATCH_ACT_BUDGET_BYTES


def test_batched_explicit_decode_batch_matches_single(trainer):
    vols = _rand_volumes([(9, 32, 32), (9, 32, 32)], seed=12)
    kwargs = dict(alpha_range=[0.5], downsample_steps=2)
    batched = create_super_volumes(trainer, vols, decode_batch=None,
                                   **kwargs)
    singles = [create_super_volume(trainer, v, **kwargs) for v in vols]
    _assert_results_match(batched, singles)


def test_batched_chunked_decode_matches_single(trainer):
    """decode_batch small enough that chunking ENGAGES in the batched
    program (kept=5, n_dec=9 > chunk=2): the per-volume slice-axis
    chunking (_chunked_call_pervol) must reproduce the unchunked
    per-volume outputs, including the edge-padded multi-tap scheme."""
    vols = _rand_volumes([(9, 32, 32), (9, 32, 32), (9, 32, 32)],
                         seed=13)
    for li in ("linear", "lanczos3"):
        kwargs = dict(alpha_range=[0.5], downsample_steps=2,
                      latent_interp=li)
        batched = create_super_volumes(trainer, vols, decode_batch=2,
                                       **kwargs)
        singles = [create_super_volume(trainer, v, decode_batch=None,
                                       **kwargs) for v in vols]
        _assert_results_match(batched, singles)


def test_batch_volume_cap_channel_scaling():
    """Multichannel (image+label) serving: the resident term scales
    with the channel count, so 2-channel volumes admit fewer per
    program than 1-channel ones."""
    from superresolution_aniso_mri_tpu.infer import super_volume as sv
    k_pad, a_n, h, w, depth = 512, 5, 256, 256, 64
    _, b1 = sv._batch_volume_cap(k_pad, a_n, h, w, depth, channels=1)
    _, b2 = sv._batch_volume_cap(k_pad, a_n, h, w, depth, channels=2)
    assert b2 <= b1


def test_lanczos3_offsets_single_source():
    """The serving gather offsets and the weight kernel's tap positions
    must come from ONE tuple (ops.losses.LANCZOS3_OFFSETS)."""
    from superresolution_aniso_mri_tpu.infer import super_volume as sv
    from superresolution_aniso_mri_tpu.ops.losses import LANCZOS3_OFFSETS

    assert sv._LATENT_TAP_OFFSETS["lanczos3"] is LANCZOS3_OFFSETS
