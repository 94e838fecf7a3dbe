"""Data-layer tests: sampling contract, transforms, synthetic volumes,
NIfTI/MetaImage round trips."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.ndimage

from superresolution_aniso_mri_tpu.data import (
    Volume, TripletSampler, AugmentConfig, augment_batch,
    prepare_batch_pairs, make_toy_dataset, simulate_thick_slices,
    create_lr_volume, rescale_intensities, determine_interpol_coefficients,
    pad_to_size, center_crop, apply_2d_zoom_3d,
)
from superresolution_aniso_mri_tpu.utils import (
    read_nifti, write_nifti, read_metaimage, write_metaimage,
)


def test_toy_dataset_structure():
    vols = make_toy_dataset(num_volumes=2, size=32, num_slices=9)
    assert len(vols) == 2
    for v in vols:
        assert v.image.shape == (9, 32, 32)
        assert v.image.dtype == np.float32
        assert 0.0 <= v.image.min() and v.image.max() <= 1.0
    # adjacent slices correlated (smooth through-plane structure)
    a, b = vols[0].image[0], vols[0].image[1]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.8


def test_simulate_thick_slices_matches_reference_loop():
    rng = np.random.RandomState(0)
    img = rng.rand(12, 6, 6).astype(np.float32)
    got = simulate_thick_slices(img, 4.0)
    # the reference's per-column loop (common_brains.py:37-44)
    sigma = 4.0 / 2.355
    expect = np.zeros_like(img)
    for y in range(img.shape[1]):
        for x in range(img.shape[2]):
            expect[:, y, x] = scipy.ndimage.gaussian_filter1d(img[:, y, x], sigma)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_create_lr_volume_subsample():
    img = np.random.RandomState(1).rand(13, 8, 8).astype(np.float32)
    lr = create_lr_volume(img, 3, subsample=True)
    assert lr.shape == (5, 8, 8)


def test_interpol_coefficients():
    # between exactly halfway in a gap of 2
    af, at = determine_interpol_coefficients(0, 2, 1)
    assert af == 0.5 and at == 0.5
    # gap 4, between at 1 → closer to 'from'
    af, at = determine_interpol_coefficients(0, 4, 1)
    assert af == 0.75 and at == 0.25
    # reversed direction
    af, at = determine_interpol_coefficients(4, 0, 1)
    assert af == 0.25 and at == 0.75


def test_sampler_contract():
    vols = make_toy_dataset(num_volumes=2, size=32, num_slices=9)
    s = TripletSampler(vols, downsample_steps=2, slice_selection="adjacent_plus",
                       seed=3)
    batch = s.sample_batch(6)
    assert batch["triplet"].shape == (6, 32, 32, 3)
    assert batch["alpha_from"].shape == (6,)
    np.testing.assert_allclose(batch["alpha_from"] + batch["alpha_to"], 1.0,
                               atol=1e-6)
    # adjacent_plus with ds=2 → between slice strictly inside the gap
    assert batch["is_inbetween"].all()

    # epoch iteration covers all indices in full batches
    n_batches = sum(1 for _ in s.epoch_batches(4))
    assert n_batches == len(s) // 4


def test_prepare_batch_pairs_contract():
    rng = np.random.RandomState(0)
    triplet = jnp.asarray(rng.rand(3, 8, 8, 3), jnp.float32)
    image, between = prepare_batch_pairs(triplet)
    assert image.shape == (6, 8, 8, 1)
    assert between.shape == (3, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(image[:3, ..., 0]),
                               np.asarray(triplet[..., 0]))
    np.testing.assert_allclose(np.asarray(image[3:, ..., 0]),
                               np.asarray(triplet[..., 1]))
    np.testing.assert_allclose(np.asarray(between[..., 0]),
                               np.asarray(triplet[..., 2]))


def test_pad_and_center_crop():
    x = np.ones((3, 10, 12), np.float32)
    p = pad_to_size(x, 16)
    assert p.shape == (3, 16, 16)
    assert p.sum() == x.sum()  # zero padding
    c = center_crop(jnp.asarray(p.transpose(1, 2, 0))[None], 8)
    assert c.shape == (1, 8, 8, 3)


def test_augment_batch_shapes_and_determinism():
    rng = np.random.RandomState(0)
    triplet = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    cfg = AugmentConfig(patch_size=16, aug_patch_size=24, random_crop=True,
                        rot90=True, intensity=True, rotate_any=True,
                        max_degree=30)
    key = jax.random.PRNGKey(0)
    out1 = augment_batch(key, triplet, cfg)
    out2 = augment_batch(key, triplet, cfg)
    assert out1.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    out3 = augment_batch(jax.random.PRNGKey(1), triplet, cfg)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # intensity keeps range
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0


def test_augment_geometry_consistency_across_triplet():
    """Geometric augs must apply identically to all 3 triplet channels."""
    rng = np.random.RandomState(0)
    base = rng.rand(2, 32, 32, 1).astype(np.float32)
    triplet = jnp.asarray(np.repeat(base, 3, axis=-1))
    cfg = AugmentConfig(patch_size=16, random_crop=True, rot90=True,
                        intensity=False, rotate_any=True, max_degree=40)
    out = np.asarray(augment_batch(jax.random.PRNGKey(2), triplet, cfg))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 0], out[..., 2], atol=1e-6)


def test_apply_2d_zoom_3d():
    img = np.random.RandomState(0).rand(3, 20, 20).astype(np.float32)
    out = apply_2d_zoom_3d(img, (1.0, 1.0), (2.0, 2.0))
    assert out.shape == (3, 10, 10)


def test_rescale_intensities():
    img = np.linspace(-5, 10, 100).reshape(10, 10)
    out = rescale_intensities(img, percs=(1, 99))
    assert out.min() == 0.0 and out.max() == 1.0


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_nifti_roundtrip(tmp_path, suffix):
    arr = np.random.RandomState(0).rand(5, 7, 9).astype(np.float32)
    spacing = np.array([3.0, 1.5, 1.25])
    path = str(tmp_path / f"vol{suffix}")
    write_nifti(path, arr, spacing=spacing)
    back, sp, affine = read_nifti(path)
    np.testing.assert_allclose(back, arr, atol=1e-7)
    np.testing.assert_allclose(sp, spacing, atol=1e-6)
    assert affine is not None


def test_nifti_4d_roundtrip(tmp_path):
    arr = np.random.RandomState(1).rand(2, 4, 6, 8).astype(np.float32)
    path = str(tmp_path / "vol4d.nii.gz")
    write_nifti(path, arr, spacing=np.array([5.0, 1.0, 1.0]))
    back, sp, _ = read_nifti(path)
    np.testing.assert_allclose(back, arr, atol=1e-7)


def test_metaimage_roundtrip(tmp_path):
    arr = (np.random.RandomState(2).rand(4, 5, 6) * 100).astype(np.float32)
    path = str(tmp_path / "vol.mha")
    write_metaimage(path, arr, spacing=np.array([2.0, 1.0, 0.5]))
    back, sp, _ = read_metaimage(path)
    np.testing.assert_allclose(back, arr)
    np.testing.assert_allclose(sp, [2.0, 1.0, 0.5])


def test_prefetch_iterator():
    from superresolution_aniso_mri_tpu.data.prefetch import (
        PrefetchIterator, prefetch_epoch,
    )
    vols = make_toy_dataset(num_volumes=1, size=16, num_slices=9, seed=0)
    s = TripletSampler(vols, downsample_steps=2, seed=0)
    seen = list(prefetch_epoch(s, 4, lambda raw: raw["triplet"].sum()))
    direct_count = sum(1 for _ in s.epoch_batches(4))
    assert len(seen) == direct_count

    # exceptions propagate
    def bad_iter():
        yield 1
        raise RuntimeError("boom")
    it = PrefetchIterator(bad_iter(), lambda x: x)
    assert next(it) == 1
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        next(it)


def test_prefetch_abandoned_iterator_is_collectable():
    """The worker must not close over self: a running thread is a GC
    root, so a self-capturing closure would keep an abandoned iterator
    alive forever and __del__ (which stops the worker) could never
    fire."""
    import gc
    import weakref

    from superresolution_aniso_mri_tpu.data.prefetch import (
        PrefetchIterator,
    )

    def slow_iter():
        for i in range(1000):
            yield i

    it = PrefetchIterator(slow_iter(), lambda x: x)
    assert next(it) == 0  # worker alive, queue full, put() blocking
    thread = it._thread
    ref = weakref.ref(it)
    del it
    gc.collect()
    assert ref() is None, "abandoned iterator must be collectable"
    thread.join(timeout=5.0)
    assert not thread.is_alive(), "__del__ must have stopped the worker"


def test_prefetch_close_leaves_queue_empty():
    """close() must not strand a device batch enqueued by a put() that
    completed after the first drain (drain-after-join contract)."""
    from superresolution_aniso_mri_tpu.data.prefetch import (
        PrefetchIterator,
    )

    for _ in range(20):  # stress the put()-completes-after-drain race
        it = PrefetchIterator(iter(range(100)), lambda x: x)
        next(it)
        it.close()
        assert it._queue.qsize() == 0, "close() stranded a queued batch"
        assert not it._thread.is_alive()
