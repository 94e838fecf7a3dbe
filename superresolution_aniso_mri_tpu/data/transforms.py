"""Device-side augmentation pipeline (jit + vmap).

TPU-first replacement for the reference's per-item CPU dict-transforms
(reference: datasets/shared_transforms.py — AdjustToPatchSize:389-447,
CenterCrop:297-363, RandomCrop:48-120, RandomRotation:224-254,
RandomIntensity:366-386, RandomAnyRotation:193-221). A whole batch of
slice triplets [B, H, W, 3] (channels = from/to/between) is augmented in
one fused XLA program with per-sample `jax.random` keys; geometry ops act
on all three channels jointly, intensity acts pointwise, exactly like the
reference applies each transform to image + slice_between.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# static (shape-changing) ops — host/trace time
# ---------------------------------------------------------------------------

def pad_to_size(x: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad trailing H/W dims up to (size, size), centered
    (reference: AdjustToPatchSize, shared_transforms.py:389-447).
    Works for [..., H, W] numpy arrays; never crops."""
    h, w = x.shape[-2], x.shape[-1]
    ph = max(0, size - h)
    pw = max(0, size - w)
    pads = [(0, 0)] * (x.ndim - 2) + [(ph // 2, ph - ph // 2),
                                      (pw // 2, pw - pw // 2)]
    if ph == 0 and pw == 0:
        return x
    return np.pad(x, pads, mode="constant")


def center_crop(x: Array, size: int) -> Array:
    """Center crop trailing spatial dims of [..., H, W, C] to size
    (reference: CenterCrop, shared_transforms.py:297-363)."""
    h, w = x.shape[-3], x.shape[-2]
    if h < size or w < size:
        raise ValueError(f"center_crop: size {size} exceeds spatial dims "
                         f"({h}, {w}) — pad first (pad_to_size)")
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size, :]


def _pad_batch_to_at_least(x: Array, size: int) -> Array:
    """Trace-time zero pad of [B, H, W, C] so H, W >= size, centered —
    the in-graph equivalent of AdjustToPatchSize (never crops)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = max(0, size - h), max(0, size - w)
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                       (pw // 2, pw - pw // 2), (0, 0)))


# ---------------------------------------------------------------------------
# per-sample random ops (vmapped)
# ---------------------------------------------------------------------------

def _random_crop_one(key: Array, img: Array, size: int) -> Array:
    h, w, c = img.shape
    kh, kw = jax.random.split(key)
    top = jax.random.randint(kh, (), 0, h - size + 1)
    left = jax.random.randint(kw, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, c))


def _rot90_one(key: Array, img: Array) -> Array:
    k = jax.random.randint(key, (), 0, 4)
    return jax.lax.switch(
        k,
        [lambda x: x,
         lambda x: jnp.rot90(x, 1, (0, 1)),
         lambda x: jnp.rot90(x, 2, (0, 1)),
         lambda x: jnp.rot90(x, 3, (0, 1))],
        img,
    )


def _intensity_one(key: Array, img: Array) -> Array:
    """Random sigmoid intensity remap
    (reference: RandomIntensity, shared_transforms.py:366-386):
    img → 1 / (1 + exp(gain * (cutoff - img))), gain∈U(2.5,7.5),
    cutoff∈U(0.25,0.75)."""
    kg, kc = jax.random.split(key)
    gain = jax.random.uniform(kg, (), minval=2.5, maxval=7.5)
    cutoff = jax.random.uniform(kc, (), minval=0.25, maxval=0.75)
    return jax.nn.sigmoid(-gain * (cutoff - img))


def _bilinear_sample(img: Array, ys: Array, xs: Array) -> Array:
    """Sample [H, W, C] ``img`` at float coords (ys, xs) [H, W] with
    bilinear interpolation and zero fill outside the frame — the shared
    warp kernel of rotate-any / elastic / perspective."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    dy = (ys - y0)[..., None]
    dx = (xs - x0)[..., None]

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return jnp.where(valid[..., None], img[yc, xc, :], 0.0)

    top = gather(y0, x0) * (1 - dx) + gather(y0, x0 + 1) * dx
    bot = gather(y0 + 1, x0) * (1 - dx) + gather(y0 + 1, x0 + 1) * dx
    return top * (1 - dy) + bot * dy


def _rotate_any_one(key: Array, img: Array, max_degree: int) -> Array:
    """Arbitrary-angle rotation, bilinear, zero border
    (reference: RandomAnyRotation, shared_transforms.py:193-221, which
    uses cv2.warpAffine around the image center). Angle is an integer
    degree in [0, max_degree) like the reference's randint."""
    deg = jax.random.randint(key, (), 0, max(int(max_degree), 1))
    theta = jnp.deg2rad(deg.astype(jnp.float32))
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # inverse map: output (x,y) ← source coords (cv2 rotates CCW for +angle)
    xs = cos * (xx - cx) - sin * (yy - cy) + cx
    ys = sin * (xx - cx) + cos * (yy - cy) + cy
    return _bilinear_sample(img, ys, xs)


def _elastic_one(key: Array, img: Array, alpha: float = 10.0,
                 grid: int = 4) -> Array:
    """Elastic deformation: a coarse random displacement field upsampled
    to image resolution, applied with bilinear warping
    (reference: shared_transforms.py SpatialTransformToHalfBatch:15-45,
    which delegates to batchgenerators' elastic transform — same idea
    expressed as one fused gather)."""
    h, w, _ = img.shape
    coarse = jax.random.normal(key, (grid, grid, 2)) * alpha
    field = jax.image.resize(coarse, (h, w, 2), method="bilinear")
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + field[..., 0]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + field[..., 1]
    return _bilinear_sample(img, yy, xx)


def _crop_next_to_center_one(key: Array, img: Array, size: int,
                             max_translation: int) -> Array:
    """Random crop centered near the image center, translated by at most
    ±max_translation pixels per axis, window clamped inside the image
    (reference: brainMASI/custom_transforms.py:12-82
    RandomCropNextToCenter, used by the dHCP and ADNI train transforms
    with max_translation=35)."""
    h, w, _ = img.shape
    ky, kx = jax.random.split(key)
    cy = (h - size) // 2
    cx = (w - size) // 2
    # DRAW the full ±max_translation range, then clamp the WINDOW — the
    # reference draws first and clips the crop box after
    # (custom_transforms.py RandomCropNextToCenter), which piles the
    # out-of-range probability mass onto the border positions; shrinking
    # the draw range instead would flatten that distribution
    dy = jax.random.randint(ky, (), -max_translation, max_translation + 1)
    dx = jax.random.randint(kx, (), -max_translation, max_translation + 1)
    top = jnp.clip(cy + dy, 0, max(h - size, 0))
    left = jnp.clip(cx + dx, 0, max(w - size, 0))
    return jax.lax.dynamic_slice(img, (top, left, 0),
                                 (size, size, img.shape[2]))


def _perspective_warp(img: Array, m: Array) -> Array:
    """Apply homography ``m`` (dst←src convention of cv2.warpPerspective:
    output pixel (x, y) samples the source at M⁻¹·(x, y, 1)) with
    bilinear interpolation and zero border."""
    h, w, _ = img.shape
    minv = jnp.linalg.inv(m)
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    ones = jnp.ones_like(xx)
    denom = minv[2, 0] * xx + minv[2, 1] * yy + minv[2, 2] * ones
    xs = (minv[0, 0] * xx + minv[0, 1] * yy + minv[0, 2]) / denom
    ys = (minv[1, 0] * xx + minv[1, 1] * yy + minv[1, 2]) / denom
    return _bilinear_sample(img, ys, xs)


def _perspective_one(key: Array, img: Array) -> Array:
    """Random perspective warp: homography M = I + U(-0.002, 0.002)
    (reference: datasets/ACDC/acdc_transforms.py:251-269
    RandomPerspective via cv2.warpPerspective)."""
    m = jnp.eye(3, dtype=jnp.float32) + jax.random.uniform(
        key, (3, 3), jnp.float32, -0.002, 0.002)
    return _perspective_warp(img, m)


def _noise_one(key: Array, img: Array, sigma_max: float = 0.05) -> Array:
    """Additive gaussian noise with random sigma, clipped back to [0,1]
    (reference: datasets/ACDC/acdc_transforms.py noise transform)."""
    ks, kn = jax.random.split(key)
    sigma = jax.random.uniform(ks, (), minval=0.0, maxval=sigma_max)
    noise = sigma * jax.random.normal(kn, img.shape, img.dtype)
    return jnp.clip(img + noise, 0.0, 1.0)


def _blur_one(key: Array, img: Array) -> Array:
    """Random light gaussian blur via a fixed 3x3 binomial kernel applied
    with probability 1/2 (reference: acdc_transforms.py blur transform)."""
    k = jnp.asarray([0.25, 0.5, 0.25], img.dtype)
    x = img[None]
    kh = k.reshape(3, 1, 1, 1)
    kw = k.reshape(1, 3, 1, 1)
    c = img.shape[-1]
    kh = jnp.tile(kh, (1, 1, 1, c)) if c > 1 else kh
    kw = jnp.tile(kw, (1, 1, 1, c)) if c > 1 else kw
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 3, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    blurred = x[0]
    do = jax.random.bernoulli(key, 0.5)
    return jnp.where(do, blurred, img)


def _mirror_one(key: Array, img: Array) -> Array:
    """Random horizontal/vertical flips
    (reference: acdc_transforms.py mirroring)."""
    kh, kv = jax.random.split(key)
    img = jnp.where(jax.random.bernoulli(kh), img[:, ::-1, :], img)
    img = jnp.where(jax.random.bernoulli(kv), img[::-1, :, :], img)
    return img


# ---------------------------------------------------------------------------
# composed pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Which augmentations to apply, mirroring the per-dataset compositions
    (reference: train_cardiac_aesr.py:83-105, common_brains.py:47-100)."""

    patch_size: int                      # final (width) crop
    aug_patch_size: Optional[int] = None  # intermediate center-crop size
    random_crop: bool = True
    rot90: bool = True
    intensity: bool = True
    rotate_any: bool = False
    max_degree: int = 45
    noise: bool = False
    blur: bool = False
    mirror: bool = False
    elastic: bool = False
    elastic_alpha: float = 10.0
    # crop near the center instead of uniformly at random
    # (reference: RandomCropNextToCenter, brainMASI/custom_transforms.py;
    # dHCP/ADNI use max_translation=35)
    crop_next_to_center: bool = False
    max_translation: int = 35
    # slight random homography (reference: acdc_transforms.py:251-269)
    perspective: bool = False


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: Array, triplet: Array, cfg: AugmentConfig) -> Array:
    """Apply the augmentation stack to [B, H, W, 3] triplets → [B, p, p, 3].

    Shapes are trace-time static: non-square or undersized inputs pad to
    the working size first (AdjustToPatchSize semantics), and the crop
    gates test BOTH spatial dims so any H != W input still lands on the
    square [p, p] contract rot90 requires.
    """
    b = triplet.shape[0]
    x = triplet
    if cfg.aug_patch_size is not None:
        ap = cfg.aug_patch_size
        x = _pad_batch_to_at_least(x, ap)
        if x.shape[1] > ap or x.shape[2] > ap:
            x = center_crop(x, ap)
    x = _pad_batch_to_at_least(x, cfg.patch_size)
    p = cfg.patch_size

    # shape-agnostic reshape: legacy uint32 keys are [N, 2], new-style
    # typed keys (jax.random.key) are scalar-per-key — both must work
    split = jax.random.split(key, 9 * b)
    keys = split.reshape((9, b) + split.shape[1:])
    need_crop = x.shape[1] > p or x.shape[2] > p
    if cfg.crop_next_to_center and need_crop:
        x = jax.vmap(lambda k, i: _crop_next_to_center_one(
            k, i, p, cfg.max_translation))(keys[0], x)
    elif cfg.random_crop and need_crop:
        x = jax.vmap(lambda k, i: _random_crop_one(k, i, p))(keys[0], x)
    elif need_crop:
        x = center_crop(x, p)
    # intensity BEFORE the bilinear warps: the reference chain applies
    # RandomIntensity before rotation (train_cardiac_aesr.py:94-97), so
    # zero-filled warp borders stay exactly 0 instead of remapping to
    # sigmoid(-gain*cutoff) gray
    if cfg.intensity:
        x = jax.vmap(_intensity_one)(keys[2], x)
    # elastic joins the other bilinear warps AFTER intensity for the
    # same zero-border reason (it zero-fills pulled-in pixels too)
    if cfg.elastic:
        x = jax.vmap(lambda k, i: _elastic_one(k, i, cfg.elastic_alpha))(
            keys[7], x)
    if cfg.perspective:
        x = jax.vmap(_perspective_one)(keys[8], x)
    if cfg.rotate_any and cfg.max_degree > 0:
        x = jax.vmap(lambda k, i: _rotate_any_one(k, i, cfg.max_degree))(
            keys[3], x)
    if cfg.rot90:
        x = jax.vmap(_rot90_one)(keys[1], x)
    if cfg.mirror:
        x = jax.vmap(_mirror_one)(keys[4], x)
    if cfg.blur:
        x = jax.vmap(_blur_one)(keys[5], x)
    if cfg.noise:
        x = jax.vmap(_noise_one)(keys[6], x)
    return x


def prepare_batch_pairs(triplet: Array):
    """[B, H, W, 3C] → (image [2B, H, W, C], slice_between [B, H, W, C]).

    The (2B ∥ B) batch contract: first half of `image` are from-slices,
    second half to-slices (reference: datasets/common_brains.py:285-321,
    datasets/ACDC/data4d_simple.py:327-387 'repeat' mode). C=1 for plain
    images; C=2 for the ACDCLBL (image+label) slot-major layout
    (reference: data_with_labels.py 6-channel triplets)."""
    if triplet.shape[-1] % 3 != 0:
        raise ValueError(
            f"prepare_batch_pairs expects 3C channels (from|to|between), "
            f"got {triplet.shape[-1]} — split any riding mask channel off "
            f"first (see cli/train_loop._device_batch)")
    c = triplet.shape[-1] // 3
    a = triplet[..., 0:c]
    b = triplet[..., c:2 * c]
    between = triplet[..., 2 * c:3 * c]
    image = jnp.concatenate([a, b], axis=0)
    return image, between


def prepare_batch_quintets(quintet: Array):
    """[B, H, W, 5C] → (image [2B, H, W, C], outer [2B, H, W, C],
    slice_between [B, H, W, C]).

    The quintet layout (from | to | outer_from | outer_to | between,
    TripletSampler(latent_taps=4)) extends the reference's (2B ∥ B)
    contract with the outward z-neighbours the cubic-aligned training
    loss mixes (ops.latent_mix_cubic); ``image``/``slice_between`` are
    laid out exactly like prepare_batch_pairs' so every downstream
    consumer of the 2-tap contract is unchanged."""
    if quintet.shape[-1] % 5 != 0:
        raise ValueError(
            f"prepare_batch_quintets expects 5C channels "
            f"(from|to|outer_from|outer_to|between), got "
            f"{quintet.shape[-1]} — split any riding mask channel off "
            f"first (see cli/train_loop._device_batch)")
    c = quintet.shape[-1] // 5
    image = jnp.concatenate([quintet[..., 0:c], quintet[..., c:2 * c]],
                            axis=0)
    outer = jnp.concatenate([quintet[..., 2 * c:3 * c],
                             quintet[..., 3 * c:4 * c]], axis=0)
    return image, outer, quintet[..., 4 * c:5 * c]


def prepare_batch_septets(septet: Array):
    """[B, H, W, 7C] → (image [2B, H, W, C], outer [2B, H, W, C],
    outer2 [2B, H, W, C], slice_between [B, H, W, C]).

    The septet layout (from | to | outer_from | outer_to | outer2_from |
    outer2_to | between, TripletSampler(latent_taps=6)) extends the
    quintet contract with the two-pair-steps-out z-neighbours the
    lanczos3-aligned training loss mixes (ops.latent_mix_lanczos3);
    ``image``/``slice_between`` are laid out exactly like
    prepare_batch_pairs' so every consumer of the 2-tap contract is
    unchanged."""
    if septet.shape[-1] % 7 != 0:
        raise ValueError(
            f"prepare_batch_septets expects 7C channels (from|to|"
            f"outer_from|outer_to|outer2_from|outer2_to|between), got "
            f"{septet.shape[-1]} — split any riding mask channel off "
            f"first (see cli/train_loop._device_batch)")
    c = septet.shape[-1] // 7
    image = jnp.concatenate([septet[..., 0:c], septet[..., c:2 * c]],
                            axis=0)
    outer = jnp.concatenate([septet[..., 2 * c:3 * c],
                             septet[..., 3 * c:4 * c]], axis=0)
    outer2 = jnp.concatenate([septet[..., 4 * c:5 * c],
                              septet[..., 5 * c:6 * c]], axis=0)
    return image, outer, outer2, septet[..., 6 * c:7 * c]
