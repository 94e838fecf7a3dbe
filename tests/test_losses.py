"""Golden-value tests for loss kernels against independent numpy/scipy
implementations (the reference ships no tests; SURVEY.md §4 prescribes
closed-form/golden checks for every loss kernel)."""
import numpy as np
import jax.numpy as jnp
import scipy.signal

from superresolution_aniso_mri_tpu.ops import (
    mse, l1, bce_sum_over_batch, kl_standard_normal, latent_mix,
    lap_loss, dice_loss,
)


def _np_gauss_kernel():
    k = np.array([[1., 4., 6., 4., 1.],
                  [4., 16., 24., 16., 4.],
                  [6., 24., 36., 24., 6.],
                  [4., 16., 24., 16., 4.],
                  [1., 4., 6., 4., 1.]], np.float32) / 256.0
    return k


def _np_conv_gauss(img, kernel):
    # img [N, C, H, W]; reflect pad 2, VALID correlate
    out = np.zeros_like(img)
    for n in range(img.shape[0]):
        for c in range(img.shape[1]):
            p = np.pad(img[n, c], 2, mode="reflect")
            out[n, c] = scipy.signal.correlate2d(p, kernel, mode="valid")
    return out


def _np_lap_pyramid(img, max_levels=3):
    kernel = _np_gauss_kernel()
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = _np_conv_gauss(current, kernel)
        down = filtered[:, :, ::2, ::2]
        n, c, h, w = down.shape
        up = np.zeros((n, c, 2 * h, 2 * w), np.float32)
        up[:, :, ::2, ::2] = down
        up = _np_conv_gauss(up, 4.0 * kernel)
        # odd level sizes upsample to n+1 — crop like the implementation
        up = up[:, :, :current.shape[2], :current.shape[3]]
        pyr.append(current - up)
        current = down
    return pyr


def test_lap_loss_golden():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 1, 32, 32).astype(np.float32)
    b = rng.rand(2, 1, 32, 32).astype(np.float32)
    pyr_a = _np_lap_pyramid(a)
    pyr_b = _np_lap_pyramid(b)
    expect = sum(np.mean(np.abs(x - y)) for x, y in zip(pyr_a, pyr_b))
    # ours is NHWC
    got = lap_loss(jnp.asarray(a.transpose(0, 2, 3, 1)),
                   jnp.asarray(b.transpose(0, 2, 3, 1)))
    # float32 on-device vs float32 numpy oracle: allow accumulation noise
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-3)


def test_lap_loss_zero_for_identical():
    a = jnp.ones((1, 16, 16, 1)) * 0.3
    assert float(lap_loss(a, a)) == 0.0


def test_mse_l1_masked():
    rng = np.random.RandomState(1)
    a = rng.rand(4, 8, 8, 1).astype(np.float32)
    b = rng.rand(4, 8, 8, 1).astype(np.float32)
    m = (rng.rand(4, 8, 8, 1) > 0.5).astype(np.float32)
    np.testing.assert_allclose(float(mse(a, b)), np.mean((a - b) ** 2), rtol=1e-6)
    np.testing.assert_allclose(float(l1(a, b)), np.mean(np.abs(a - b)), rtol=1e-6)
    np.testing.assert_allclose(float(mse(a, b, m)),
                               np.mean(((a - b) ** 2) * m), rtol=1e-6)


def test_bce_matches_definition():
    rng = np.random.RandomState(2)
    p = np.clip(rng.rand(3, 4, 4, 1), 1e-3, 1 - 1e-3).astype(np.float32)
    t = rng.rand(3, 4, 4, 1).astype(np.float32)
    expect = -np.sum(t * np.log(p) + (1 - t) * np.log(1 - p)) / 3.0
    np.testing.assert_allclose(float(bce_sum_over_batch(jnp.asarray(p),
                                                        jnp.asarray(t))),
                               expect, rtol=1e-5)


def test_kl_standard_normal_closed_form():
    mu = np.array([[0.5, -1.0]], np.float32)
    logvar = np.array([[0.0, np.log(4.0)]], np.float32)
    # KL(N(mu, s)||N(0,1)) = -log s + (s^2 + mu^2 - 1)/2 per element
    s = np.exp(0.5 * logvar)
    expect = np.mean(-np.log(s) + (s ** 2 + mu ** 2 - 1) / 2)
    got = float(kl_standard_normal(jnp.asarray(mu), jnp.asarray(logvar)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_latent_mix_matches_reference_semantics():
    rng = np.random.RandomState(3)
    z = rng.rand(6, 2, 2, 4).astype(np.float32)  # 2B = 6 → B = 3
    af = np.array([0.25, 0.5, 0.75], np.float32)
    at = 1.0 - af
    got = np.asarray(latent_mix(jnp.asarray(z), jnp.asarray(af), jnp.asarray(at)))
    expect = af[:, None, None, None] * z[:3] + at[:, None, None, None] * z[3:]
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_dice_loss_perfect_prediction():
    labels = np.zeros((2, 8, 8), np.int32)
    labels[:, :4] = 1
    probs = np.eye(3, dtype=np.float32)[labels]  # one-hot perfect
    loss = float(dice_loss(jnp.asarray(probs), jnp.asarray(labels), 3))
    # classes 0 and 1 perfect (dice 1), class 2 absent (0/eps → ~0):
    # mean over classes of -dice ≈ -(1 + 1 + 0)/3
    np.testing.assert_allclose(loss, -2.0 / 3.0, atol=1e-3)


def test_lap_loss_golden_odd_sizes():
    """Odd spatial dims exercise the upsample crop (lap_pyramid.py) —
    the all-even 32x32 golden case cannot catch a crop regression."""
    rng = np.random.RandomState(4)
    for size in (45, 30):
        a = rng.rand(2, 1, size, size).astype(np.float32)
        b = rng.rand(2, 1, size, size).astype(np.float32)
        expect = sum(np.mean(np.abs(x - y)) for x, y in
                     zip(_np_lap_pyramid(a), _np_lap_pyramid(b)))
        got = lap_loss(jnp.asarray(a.transpose(0, 2, 3, 1)),
                       jnp.asarray(b.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(float(got), expect, rtol=2e-3)
