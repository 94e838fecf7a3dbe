"""Local-MNIST ingest: a user-provided idx3-ubyte / npz file replaces
the procedural phantoms, reproducing the reference's MNIST3D rotation
construction (datasets/MNIST/data.py:11-45) bit-for-bit offline."""
import gzip
import struct

import numpy as np
import pytest

from superresolution_aniso_mri_tpu.data.synthetic import (
    RotoTripletSampler, load_mnist_images, make_toy_dataset,
)


def _write_idx(path, images, compress=False):
    n, h, w = images.shape
    payload = struct.pack(">IIII", 0x803, n, h, w) + images.tobytes()
    opener = gzip.open if compress else open
    with opener(path, "wb") as f:
        f.write(payload)


@pytest.fixture()
def idx_file(tmp_path):
    rs = np.random.RandomState(0)
    imgs = (rs.rand(10, 28, 28) * 255).astype(np.uint8)
    p = str(tmp_path / "train-images-idx3-ubyte.gz")
    _write_idx(p, imgs, compress=True)
    return p, imgs


def test_load_idx_gz(idx_file):
    p, imgs = idx_file
    out = load_mnist_images(p)
    assert out.shape == (10, 28, 28) and out.dtype == np.float32
    np.testing.assert_allclose(out, imgs.astype(np.float32) / 255.0)


def test_load_idx_plain_and_npz(tmp_path, idx_file):
    _, imgs = idx_file
    plain = str(tmp_path / "imgs-idx3-ubyte")
    _write_idx(plain, imgs)
    np.testing.assert_allclose(load_mnist_images(plain),
                               imgs.astype(np.float32) / 255.0)
    npz = str(tmp_path / "imgs.npz")
    np.savez(npz, images=imgs.astype(np.float32) / 255.0)
    np.testing.assert_allclose(load_mnist_images(npz),
                               imgs.astype(np.float32) / 255.0)


def test_bad_magic_raises(tmp_path):
    p = str(tmp_path / "bad-idx3-ubyte")
    with open(p, "wb") as f:
        f.write(struct.pack(">IIII", 0x801, 1, 28, 28) + b"\0" * 784)
    with pytest.raises(ValueError, match="magic"):
        load_mnist_images(p)


def test_toy_dataset_uses_real_digits(idx_file):
    p, imgs = idx_file
    vols = make_toy_dataset(3, size=32, num_slices=9, seed=1,
                            mnist_path=p)
    assert len(vols) == 3
    for vol in vols:
        assert vol.image.shape == (9, 32, 32)
        # slice 0 is the unrotated digit centered into 32x32: its 28x28
        # interior must equal one of the train-pool digits exactly
        inner = vol.image[0][2:30, 2:30]
        pool = imgs[:5].astype(np.float32) / 255.0  # train half
        assert any(np.allclose(inner, d) for d in pool), \
            "slice 0 is not a verbatim train-pool digit"
    # val pool is disjoint from the train pool
    vval = make_toy_dataset(2, size=32, num_slices=9, seed=1,
                            mnist_path=p, mnist_split="val")
    vpool = imgs[5:].astype(np.float32) / 255.0
    for vol in vval:
        inner = vol.image[0][2:30, 2:30]
        assert any(np.allclose(inner, d) for d in vpool)
        assert not any(np.allclose(inner, d) for d in pool)


def test_roto_sampler_uses_digits(idx_file):
    p, imgs = idx_file
    s = RotoTripletSampler(num_images=4, size=32, seed=0, mnist_path=p)
    assert len(s.images) == 4
    all_digits = imgs.astype(np.float32) / 255.0
    for im in s.images:
        inner = im[2:30, 2:30]
        assert any(np.allclose(inner, d) for d in all_digits)
    batch = s.sample_batch(3)
    assert batch["triplet"].shape == (3, 32, 32, 3)


def test_get_datasets_routes_mnist_path(idx_file):
    p, _ = idx_file
    from superresolution_aniso_mri_tpu.data.datasets import get_datasets
    train, val = get_datasets({"dataset": "MNIST3D", "width": 32,
                               "downsample_steps": 2, "seed": 0,
                               "limited_load": True, "mnist_path": p})
    assert len(train) == 4 and len(val) == 2
    assert train[0].image.shape == (17, 32, 32)


def test_roto_sampler_split_pools_disjoint(idx_file):
    """Train/val RotoTripletSampler digit pools must be disjoint halves
    (val digits leaking into training would inflate best-val)."""
    p, imgs = idx_file
    tr = RotoTripletSampler(num_images=5, size=32, seed=0, mnist_path=p,
                            mnist_split="train")
    va = RotoTripletSampler(num_images=5, size=32, seed=1, mnist_path=p,
                            mnist_split="val")
    tr_pool = imgs[:5].astype(np.float32) / 255.0
    va_pool = imgs[5:].astype(np.float32) / 255.0
    for im in tr.images:
        assert any(np.allclose(im[2:30, 2:30], d) for d in tr_pool)
    for im in va.images:
        inner = im[2:30, 2:30]
        assert any(np.allclose(inner, d) for d in va_pool)
        assert not any(np.allclose(inner, d) for d in tr_pool)
