"""Device-resident dataset cache (data/device_cache.py): the cached
sampler must produce bit-identical batches to the host path (same RNG
draw order, same pixel assembly) and the auto gating must respect the
HBM budget / multi-device constraints."""
import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data import (
    TripletSampler, Volume, make_toy_dataset,
)
from superresolution_aniso_mri_tpu.data.device_cache import (
    DeviceCachedSampler, cache_nbytes, maybe_device_cache,
)


def _samplers(seed=3, use_masks=False, labeled=False, het=False):
    vols = make_toy_dataset(num_volumes=3, size=24, num_slices=7)
    if het:  # heterogeneous in-plane sizes pad to one common shape
        v = vols[1]
        vols[1] = Volume(image=np.ascontiguousarray(v.image[:, :20, :16]),
                         spacing=v.spacing, patient_id=v.patient_id)
    if labeled:
        vols = [Volume(image=v.image, spacing=v.spacing,
                       patient_id=v.patient_id,
                       labels=(v.image > 0.5).astype(np.float32))
                for v in vols]
    host = TripletSampler(vols, 3, "adjacent_plus", pad_size=24, seed=seed,
                          use_masks=use_masks)
    dev = DeviceCachedSampler(
        TripletSampler(vols, 3, "adjacent_plus", pad_size=24, seed=seed,
                       use_masks=use_masks))
    return host, dev


def _assert_batches_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_sample_batch_identical_to_host_path():
    host, dev = _samplers()
    for _ in range(3):
        _assert_batches_equal(host.sample_batch(6), dev.sample_batch(6))


def test_epoch_batches_identical_to_host_path():
    host, dev = _samplers(seed=11)
    hb = list(host.epoch_batches(5))
    db = list(dev.epoch_batches(5))
    assert len(hb) == len(db) == len(host) // 5
    for a, b in zip(hb, db):
        _assert_batches_equal(a, b)


def test_labeled_channel_layout_matches():
    host, dev = _samplers(seed=5, labeled=True)
    a, b = host.sample_batch(4), dev.sample_batch(4)
    assert np.asarray(b["triplet"]).shape[-1] == 6  # (img+lbl) x 3 slots
    _assert_batches_equal(a, b)


def test_heterogeneous_shapes_padded_identically():
    host, dev = _samplers(seed=7, het=True)
    _assert_batches_equal(host.sample_batch(8), dev.sample_batch(8))


def test_facade_surface():
    host, dev = _samplers()
    assert len(dev) == len(host)
    assert dev.pad_size == host.pad_size
    assert dev.has_labels == host.has_labels
    assert dev.use_masks == host.use_masks
    assert dev.volumes is dev.s.volumes


def test_maybe_device_cache_gating(monkeypatch):
    host, _ = _samplers()
    # off
    assert maybe_device_cache(host, "0") is host
    # forced on, even multi-device
    assert isinstance(maybe_device_cache(host, "1", multi_device=True),
                      DeviceCachedSampler)
    # auto: fits the default budget
    assert isinstance(maybe_device_cache(host, "auto"),
                      DeviceCachedSampler)
    # auto: budget exceeded -> host path
    kb = cache_nbytes(host) / 2 ** 20
    monkeypatch.setenv("SR_DEVICE_CACHE_MB", str(kb / 2))
    assert maybe_device_cache(host, "auto") is host
    monkeypatch.delenv("SR_DEVICE_CACHE_MB")
    # auto: multi-device -> host path
    assert maybe_device_cache(host, "auto", multi_device=True) is host
    # non-TripletSampler sources pass through
    sentinel = object()
    assert maybe_device_cache(sentinel, "auto") is sentinel


@pytest.mark.slow
def test_training_trajectory_identical_with_cache(tmp_path):
    """Two short CLI trainings, host path vs device cache, must record
    the same loss curves (the cache changes WHERE pixels are assembled,
    never the values)."""
    from superresolution_aniso_mri_tpu.cli.train_loop import run_training

    def run(tag, cache):
        args = dict(dataset="MNIST3D", model="ae_combined",
                    downsample_steps=2, width=28, latent_width=7,
                    latent=16, depth=8, batch_size=8, lr=0.001, epochs=2,
                    epoch_threshold=99, ex_loss_weight1=0.001,
                    volume_preview_interval=0, seed=3,
                    image_mix_loss_func="mse", use_batchnorm=0,
                    device_data_cache=cache,
                    output_dir=str(tmp_path / tag), exper_id="t")
        run_training(args, verbose=False)
        # run_training uses output_dir verbatim (the CLI entry joins
        # output_dir/exper_id before calling it)
        return np.load(tmp_path / tag / "losses_train.npz")

    a, b = run("host", "0"), run("dev", "1")
    for k in a.files:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0,
                                   err_msg=k)


def test_septet_sample_batch_identical_to_host_path():
    """latent_taps=6 (lanczos3-aligned training): the device cache must
    gather BOTH outward-pair slots so cached septet batches equal the
    host sampler's bit-for-bit."""
    from superresolution_aniso_mri_tpu.data import (
        TripletSampler, make_toy_dataset,
    )
    from superresolution_aniso_mri_tpu.data.device_cache import (
        DeviceCachedSampler,
    )

    vols = make_toy_dataset(3, 24, 9, seed=21)
    host = TripletSampler(vols, 3, "adjacent_plus", pad_size=24, seed=9,
                          latent_taps=6)
    dev = DeviceCachedSampler(
        TripletSampler(vols, 3, "adjacent_plus", pad_size=24, seed=9,
                       latent_taps=6))
    for _ in range(3):
        a, b = host.sample_batch(6), dev.sample_batch(6)
        assert np.asarray(a["triplet"]).shape[-1] == 7
        _assert_batches_equal(a, b)
