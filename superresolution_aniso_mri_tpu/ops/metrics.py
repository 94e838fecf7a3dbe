"""Image-quality metrics (SSIM / PSNR / VIF) as batched XLA kernels.

The reference computes these per-slice on the host with skimage/scipy
Python loops (reference: evaluate/metrics.py:111-243, evaluate/vifvec.py:7-63)
— the dominant cost of its model-selection sweeps. Here each metric is a
jit-compiled function vmapped over the slice axis, so a whole volume is
scored in one device call.

Parity notes:
  * ``ssim2d`` matches skimage ``structural_similarity`` defaults
    (win_size=7, uniform window, unbiased covariance, border crop —
    implemented directly as VALID convolutions so no crop is needed).
  * ``psnr`` matches skimage ``peak_signal_noise_ratio``.
  * ``vif2d`` ports the 4-scale pixel-domain VIF of evaluate/vifvec.py.
    The reference feeds uint8 arrays through scipy's gaussian_filter,
    which silently wraps in uint8 arithmetic; we quantize to the uint8
    grid (matching ``do_rescale``/caller behaviour at metrics.py:72-73)
    but run the filtering in float — i.e. the *intended* metric.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# separable filters
# ---------------------------------------------------------------------------

def _sep_filter2d_valid(img: Array, k: Array) -> Array:
    """Separable 2-D correlation, VALID padding. img [H, W], k [K]."""
    kh = k.reshape(-1, 1, 1, 1).astype(img.dtype)
    kw = k.reshape(1, -1, 1, 1).astype(img.dtype)
    x = img[None, :, :, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    dn = jax.lax.conv_dimension_numbers(x.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    return x[0, :, :, 0]


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d: truncated, normalised gaussian."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return (phi / phi.sum()).astype(np.float32)


_BAND_CACHE: dict = {}


def _band_reflect(n: int, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """[n, n] banded matrix B with B @ x == scipy gaussian correlate1d
    (mode='reflect'). Built once per (n, sigma) at trace time.

    Expressing the filter as a matmul keeps the gaussian pyramid on the
    MXU — single-channel `lax.conv` calls use ~1/128 of it and were the
    VIF hot spot.
    """
    key = (n, round(float(sigma), 6), truncate)
    if key not in _BAND_CACHE:
        if len(_BAND_CACHE) >= 128:  # bound host memory over long sweeps
            _BAND_CACHE.pop(next(iter(_BAND_CACHE)))
        k = _gauss_kernel1d(sigma, int(truncate * sigma + 0.5))
        m = len(k)
        r = m // 2
        # periodic triangular reflection (period 2n) — handles kernels
        # wider than the axis, like scipy's repeated mirroring
        idx = np.arange(-r, n + r)
        j = np.mod(idx, 2 * n)
        ref = np.where(j < n, j, 2 * n - 1 - j)
        out = np.zeros((n, n), np.float32)
        rows = np.repeat(np.arange(n), m)
        cols = ref[np.arange(n)[:, None] + np.arange(m)].ravel()
        np.add.at(out, (rows, cols), np.tile(k, n))
        _BAND_CACHE[key] = out
    return _BAND_CACHE[key]


def gaussian_filter2d(img: Array, sigma: float, truncate: float = 4.0) -> Array:
    """scipy.ndimage.gaussian_filter (mode='reflect') for [..., H, W]
    arrays, as two banded matmuls (fp32-exact vs scipy, ~1e-7)."""
    h, w = img.shape[-2], img.shape[-1]
    gh = jnp.asarray(_band_reflect(h, sigma, truncate))
    gw = jnp.asarray(_band_reflect(w, sigma, truncate).T)
    x = jnp.matmul(gh, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(x, gw, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# SSIM
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("win_size",))
def ssim2d(im1: Array, im2: Array, data_range: float = 1.0,
           win_size: int = 7) -> Array:
    """skimage-compatible SSIM for one 2-D image pair.

    Uniform win_size x win_size window, unbiased covariance normalisation
    (NP/(NP-1)), K1=0.01/K2=0.03, mean over the interior region (VALID
    conv == skimage's crop of (win_size-1)//2 border pixels).
    """
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    k = jnp.full((win_size,), 1.0 / win_size, jnp.float32)
    f = lambda x: _sep_filter2d_valid(x, k)

    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


@partial(jax.jit, static_argnames=("win_size",))
def ssim_volume(ref: Array, dist: Array, data_range: float = 1.0,
                win_size: int = 7) -> Array:
    """Per-slice SSIM over a [S, H, W] volume → [S] vector."""
    return jax.vmap(lambda a, b: ssim2d(a, b, data_range, win_size))(ref, dist)


def _ssim_cs2d(im1: Array, im2: Array, data_range: float,
               win_size: int):
    """Mean (luminance*cs, cs) maps for one scale of MS-SSIM."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    k = jnp.full((win_size,), 1.0 / win_size, jnp.float32)
    f = lambda x: _sep_filter2d_valid(x, k)
    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    cs = (2.0 * vxy + c2) / (vx + vy + c2)
    lum = (2.0 * ux * uy + c1) / (ux * ux + uy * uy + c1)
    return jnp.mean(lum * cs), jnp.mean(cs)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@partial(jax.jit, static_argnames=("win_size", "levels"))
def msssim2d(im1: Array, im2: Array, data_range: float = 1.0,
             win_size: int = 7, levels: int = 5) -> Array:
    """Multi-scale SSIM (Wang et al. 2003) for one 2-D image pair.

    Standard 5-level weights (renormalised when ``levels`` < 5 so
    small inputs — e.g. 64^2 training slices, which only support 3
    dyadic scales with a 7-pixel window — stay a proper weighted
    geometric mean). Contrast-structure term at every scale, the full
    luminance-weighted SSIM at the coarsest; 2x2 average-pool between
    scales. Static level count so the whole pyramid is one XLA program.
    """
    min_side = min(im1.shape[0], im1.shape[1]) // (2 ** (levels - 1))
    if min_side < win_size:
        raise ValueError(
            f"msssim2d: {im1.shape[0]}x{im1.shape[1]} input supports at "
            f"most {max(1, int(np.log2(min(im1.shape[:2]) / win_size)) + 1)} "
            f"dyadic levels with win_size={win_size}, got levels={levels} "
            f"(coarsest scale {min_side} < window)")
    w = np.asarray(_MSSSIM_WEIGHTS[:levels], np.float32)
    w = w / w.sum()
    val = jnp.float32(1.0)
    for lv in range(levels):
        s, cs = _ssim_cs2d(im1, im2, data_range, win_size)
        term = s if lv == levels - 1 else cs
        # negative cs can occur on synthetic edges; clamp like the
        # common (tf.image.ssim_multiscale) implementation
        val = val * jnp.maximum(term, 0.0) ** w[lv]
        if lv != levels - 1:
            h = (im1.shape[0] // 2) * 2
            ww = (im1.shape[1] // 2) * 2
            pool = lambda x: (x[:h:2, :ww:2] + x[1:h:2, :ww:2]
                              + x[:h:2, 1:ww:2] + x[1:h:2, 1:ww:2]) / 4.0
            im1, im2 = pool(im1), pool(im2)
    return val


@partial(jax.jit, static_argnames=("win_size", "levels"))
def msssim_volume(ref: Array, dist: Array, data_range: float = 1.0,
                  win_size: int = 7, levels: int = 5) -> Array:
    """Per-slice MS-SSIM over a [S, H, W] volume → [S] vector."""
    return jax.vmap(
        lambda a, b: msssim2d(a, b, data_range, win_size, levels)
    )(ref, dist)


# ---------------------------------------------------------------------------
# PSNR
# ---------------------------------------------------------------------------

@jax.jit
def psnr2d(im1: Array, im2: Array, data_range: float = 1.0) -> Array:
    """skimage peak_signal_noise_ratio: 10*log10(range^2 / mse)."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    mse = jnp.mean((im1 - im2) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / mse)


@jax.jit
def psnr_volume(ref: Array, dist: Array, data_range: float = 1.0) -> Array:
    return jax.vmap(lambda a, b: psnr2d(a, b, data_range))(ref, dist)


# ---------------------------------------------------------------------------
# VIF (pixel-domain, multi-scale)
# ---------------------------------------------------------------------------

def _quantize_u8(x: Array, data_range: float = 1.0) -> Array:
    """uint8 quantization of a [0, data_range] image, kept in float
    (reference: evaluate/metrics.py:72-73, vifvec.py:13-15)."""
    return jnp.round(jnp.clip(x * (255.0 / data_range), 0.0, 255.0))


@partial(jax.jit, static_argnames=("quantize",))
def vif2d(ref: Array, dist: Array, sigma_nsq: float = 2.0,
          quantize: bool = True, data_range: float = 1.0) -> Array:
    """4-scale pixel-domain VIF (reference: evaluate/vifvec.py:7-63).

    ``quantize=True`` snaps [0, data_range] inputs to the 0..255 integer
    grid first, like the reference caller. Returns a scalar; NaN when
    den == 0 (uniform reference — the reference's float64 port NaNs
    there too, and per-slice aggregation drops non-finite values,
    evaluate/metrics.py:101-105).
    """
    eps = 1e-10
    if quantize:
        ref = _quantize_u8(ref, data_range)
        dist = _quantize_u8(dist, data_range)
    ref = ref.astype(jnp.float32)
    dist = dist.astype(jnp.float32)
    # center on the global mean: analytically a no-op (every VIF term is
    # intensity-shift-invariant) but it kills the E[x^2]-mu^2 float32
    # cancellation — without it a uniform 0..255 slice carries ~1e-3
    # variance noise, far above eps, and scores ~1.0 instead of NaN
    ref = ref - jnp.mean(ref)
    dist = dist - jnp.mean(dist)

    num = jnp.float32(0.0)
    den = jnp.float32(0.0)

    for scale in range(1, 5):
        n = 2 ** (4 - scale + 1) + 1
        sd = n / 5.0
        if scale > 1:
            ref = gaussian_filter2d(ref, sd)
            dist = gaussian_filter2d(dist, sd)
            ref = ref[::2, ::2]
            dist = dist[::2, ::2]

        g_f = lambda x: gaussian_filter2d(x, sd)
        mu1, mu2 = g_f(ref), g_f(dist)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        sigma1_sq = g_f(ref * ref) - mu1_sq
        sigma2_sq = g_f(dist * dist) - mu2_sq
        sigma12 = g_f(ref * dist) - mu1_mu2

        sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
        sigma2_sq = jnp.maximum(sigma2_sq, 0.0)

        g = sigma12 / (sigma1_sq + eps)
        sv_sq = sigma2_sq - g * sigma12

        small1 = sigma1_sq < eps
        g = jnp.where(small1, 0.0, g)
        sv_sq = jnp.where(small1, sigma2_sq, sv_sq)
        sigma1_sq = jnp.where(small1, 0.0, sigma1_sq)

        small2 = sigma2_sq < eps
        g = jnp.where(small2, 0.0, g)
        sv_sq = jnp.where(small2, 0.0, sv_sq)

        neg_g = g < 0.0
        sv_sq = jnp.where(neg_g, sigma2_sq, sv_sq)
        g = jnp.where(neg_g, 0.0, g)
        sv_sq = jnp.maximum(sv_sq, eps)

        num = num + jnp.sum(jnp.log10(1.0 + g * g * sigma1_sq / (sv_sq + sigma_nsq)))
        den = den + jnp.sum(jnp.log10(1.0 + sigma1_sq / sigma_nsq))

    return jnp.where(den != 0.0, num / den, jnp.nan)


@jax.jit
def vif_volume(ref: Array, dist: Array, sigma_nsq: float = 2.0,
               data_range: float = 1.0) -> Array:
    """Per-slice VIF over a [S, H, W] volume → [S] vector."""
    return jax.vmap(lambda a, b: vif2d(a, b, sigma_nsq,
                                       data_range=data_range))(ref, dist)


# ---------------------------------------------------------------------------
# slice masks (synth vs recon) and masked aggregation
# ---------------------------------------------------------------------------

def synth_slice_mask(num_slices: int, downsample_steps: int,
                     conv_interpol: bool = False) -> np.ndarray:
    """Boolean mask [S]: True where a slice was SYNTHESIZED (not an
    original/reconstructed grid slice).

    Mirrors determine_original_sliceids (reference: evaluate/metrics.py:29-45)
    and generate_synth_slices_mask (evaluate/quantitative_comparison.py:10-17):
    every ds-th slice is original; tail slices that don't fit the grid are
    original too.
    """
    if downsample_steps < 1:
        raise ValueError(
            f"downsample_steps must be >= 1, got {downsample_steps}")
    slice_ids = np.arange(num_slices)
    keep = None
    if (num_slices - 1) % downsample_steps != 0:
        remain = (num_slices - 1) % downsample_steps
        keep = slice_ids[-remain:]
        slice_ids = slice_ids[:-remain]
    if conv_interpol and slice_ids.shape[0] % downsample_steps != 0:
        remain = slice_ids.shape[0] % downsample_steps
        keep = slice_ids[-remain:] if keep is None else np.concatenate(
            (slice_ids[-remain:], keep))
        slice_ids = slice_ids[:-remain]
    original = slice_ids[::downsample_steps]
    if keep is not None:
        original = np.concatenate((original, keep))
    mask = np.ones(num_slices, dtype=bool)
    mask[original] = False
    return mask


def masked_mean(values: Array, mask) -> Array:
    """Mean of per-slice metric over selected slices; non-finite entries
    dropped (reference drops nan/inf VIF/PSNR values,
    metrics.py:101-105). Returns NaN when NOTHING is selected — an empty
    selection must not masquerade as a plausible 0.0 score (the
    reference's np.mean([]) is NaN there too)."""
    values = jnp.asarray(values)
    mask = jnp.asarray(mask, bool)
    finite = jnp.isfinite(values)
    sel = mask & finite
    n_sel = jnp.sum(sel)
    mean = jnp.sum(jnp.where(sel, values, 0.0)) / jnp.maximum(n_sel, 1)
    return jnp.where(n_sel > 0, mean, jnp.nan)
