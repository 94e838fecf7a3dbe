"""LPIPS-VGG perceptual distance in JAX/Flax.

Behavioural port of the reference's net-lin LPIPS stack
(reference: lpips/networks_basic.py:19-100 PNetLin, lpips/perceptual.py:6-33,
lpips/pretrained_networks.py vgg16 slices): frozen VGG16 feature slices
(relu1_2, relu2_2, relu3_3, relu4_3, relu5_3) → per-channel unit
normalisation → squared diff → learned 1x1 'lin' weights → spatial mean →
sum over the 5 layers. ``normalize=True`` maps [0,1] inputs to [-1,1]
first; single-channel (grayscale) inputs broadcast against the 3-channel
shift/scale exactly like the reference's ScalingLayer
(lpips/networks_basic.py:93-100).

Weights: torchvision's pretrained VGG16 cannot be downloaded in this
environment. Three modes exist, recorded by :func:`lpips_weights_info`
(the mode string is kept OUT of the params pytree so the tree stays
jittable) and surfaced as ``lpips_mode`` in settings.yaml / metric dumps:
  * ``converted`` — ``tools/convert_lpips_weights.py`` converted a full
    torchvision ``vgg16`` state_dict + the LPIPS lin weights into an
    ``.npz`` (true LPIPS);
  * ``lin_converted_vgg_random`` — the learned lin weights converted from
    the reference's ``lpips/weights/v0.1/vgg.pth`` (shipped in
    ``weights/lpips_lin_vgg.npz``) over deterministic random VGG
    features; a usable perceptual signal, NOT true LPIPS;
  * ``random`` — deterministic random features with uniform lin weights,
    the last-resort fallback.
Both fallback modes emit an explicit warning when selected.
"""
from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# VGG16 conv plan: (out_channels per conv, pool before this conv?)
_VGG_PLAN: Sequence[tuple] = (
    (64, False), (64, False),            # slice 1 → relu1_2
    (128, True), (128, False),           # slice 2 → relu2_2
    (256, True), (256, False), (256, False),   # slice 3 → relu3_3
    (512, True), (512, False), (512, False),   # slice 4 → relu4_3
    (512, True), (512, False), (512, False),   # slice 5 → relu5_3
)
# index (into conv list) after which each slice output is taken
_SLICE_ENDS = (1, 3, 6, 9, 12)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(seed: int = 0, lin_init: str = "uniform") -> Dict[str, Any]:
    """Deterministic fallback parameters (He-init convs, uniform lin)."""
    rng = np.random.RandomState(seed)
    convs: List[Dict[str, np.ndarray]] = []
    cin = 3
    for cout, _ in _VGG_PLAN:
        fan_in = 3 * 3 * cin
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in), size=(3, 3, cin, cout))
        b = np.zeros((cout,), np.float32)
        convs.append({"kernel": w.astype(np.float32), "bias": b})
        cin = cout
    lins = []
    for c in LPIPS_CHANNELS:
        if lin_init == "uniform":
            lw = np.full((1, 1, c, 1), 1.0 / c, np.float32)
        else:
            lw = np.abs(rng.normal(0.0, 1.0 / c, size=(1, 1, c, 1))).astype(np.float32)
        lins.append({"kernel": lw})
    return {"convs": convs, "lins": lins}


def _convs_lins_from(data) -> Dict[str, Any]:
    """Build the full params pytree from an open npz (single source of
    truth for the npz key format)."""
    convs = [{"kernel": data[f"conv{i}_kernel"],
              "bias": data[f"conv{i}_bias"]}
             for i in range(len(_VGG_PLAN))]
    return {"convs": convs, "lins": _lins_from(data)}


def _lins_from(data) -> List[Dict[str, np.ndarray]]:
    return [{"kernel": data[f"lin{i}_kernel"]}
            for i in range(len(LPIPS_CHANNELS))]


def load_lpips_params(path: str) -> Dict[str, Any]:
    """Load full parameters converted by tools/convert_lpips_weights.py."""
    with np.load(path) as data:
        return _convs_lins_from(data)


def load_lin_weights(path: str) -> List[Dict[str, np.ndarray]]:
    """Load only the learned 1x1 'lin' weights (lin{k}_kernel arrays)."""
    with np.load(path) as data:
        return _lins_from(data)


_WEIGHTS_DIR = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "weights"))
_FULL_NPZ = os.path.join(_WEIGHTS_DIR, "lpips_vgg.npz")
# learned lin weights converted from the reference's
# lpips/weights/v0.1/vgg.pth (reference: lpips/dist_model.py:19-108)
_LIN_NPZ = os.path.join(_WEIGHTS_DIR, "lpips_lin_vgg.npz")

# info about the most recent get_lpips_params() resolution
_last_info: Dict[str, Any] = {"mode": None, "path": None}


def lpips_weights_info() -> Dict[str, Any]:
    """Mode/path of the last :func:`get_lpips_params` call.

    ``mode`` is one of ``converted`` (full VGG16 + learned lin — true
    LPIPS), ``lin_converted_vgg_random`` (learned lin over deterministic
    random VGG features), or ``random``. Kept out of the params pytree so
    jitted consumers see only arrays."""
    return dict(_last_info)


def _warn_lin_fallback() -> None:
    warnings.warn(
        "LPIPS: using learned lin weights over deterministic RANDOM "
        "VGG features (no converted VGG16 backbone found). This is a "
        "usable perceptual signal but NOT true LPIPS; convert "
        "torchvision VGG16 via tools/convert_lpips_weights.py for "
        "exact reference parity.", stacklevel=3)


def get_lpips_params(path: Optional[str] = None, seed: int = 0) -> Dict[str, Any]:
    """Resolve LPIPS parameters: full converted npz (arg, $LPIPS_WEIGHTS,
    or weights/lpips_vgg.npz) → shipped learned lin weights over random
    VGG features → fully random. Fallbacks warn explicitly; the selected
    mode is queryable via :func:`lpips_weights_info`.

    An explicit ``path`` argument shadows ``$LPIPS_WEIGHTS`` entirely —
    a stale env var must not abort a call that names valid weights."""
    if path and not os.path.isfile(path):
        # an explicitly requested weights file must never silently fall
        # through to a different source
        raise FileNotFoundError(f"LPIPS weights not found: {path}")
    candidates = []
    if path:
        candidates.append(path)
    else:
        env = os.environ.get("LPIPS_WEIGHTS")
        if env:
            if not os.path.isfile(env):
                # same contract as the path argument: an explicitly
                # named weights file must never silently fall through
                # to a different source
                raise FileNotFoundError(
                    f"LPIPS_WEIGHTS points to a missing file: {env}")
            candidates.append(env)
    candidates.append(_FULL_NPZ)
    for cand in candidates:
        if cand and os.path.isfile(cand):
            with np.load(cand) as data:
                if "conv0_kernel" in data:
                    params = _convs_lins_from(data)
                    _last_info.update(mode="converted", path=cand)
                    return _device(params)
                if "lin0_kernel" not in data:
                    raise ValueError(
                        f"{cand}: not an LPIPS weights npz (expected "
                        f"conv0_kernel/... or lin0_kernel/... arrays)")
                # lin-only npz: learned lins over random VGG features
                params = init_lpips_params(seed=seed)
                params["lins"] = _lins_from(data)
            _last_info.update(mode="lin_converted_vgg_random", path=cand)
            _warn_lin_fallback()
            return _device(params)
    if os.path.isfile(_LIN_NPZ):
        params = init_lpips_params(seed=seed)
        params["lins"] = load_lin_weights(_LIN_NPZ)
        _last_info.update(mode="lin_converted_vgg_random", path=_LIN_NPZ)
        _warn_lin_fallback()
        return _device(params)
    _last_info.update(mode="random", path=None)
    warnings.warn(
        "LPIPS: no converted weights found anywhere — falling back to "
        "deterministic random VGG features with uniform lin weights. "
        "Results are NOT LPIPS.", stacklevel=2)
    return _device(init_lpips_params(seed=seed))


def _device(params: Dict[str, Any]) -> Dict[str, Any]:
    """Commit the (frozen, ~59 MB) weight set to the device once —
    host-numpy leaves would re-transfer on every jitted
    lpips_distance call (one full copy per evaluated volume)."""
    return jax.tree_util.tree_map(jnp.asarray, params)


def _vgg_features(params: Dict[str, Any], x: Array,
                  compute_dtype=jnp.float32) -> List[Array]:
    """Run the VGG16 conv stack, returning the 5 slice activations.

    x: [B, H, W, 3], already shift/scale normalised. NHWC convs with
    float32 accumulation — XLA tiles these onto the MXU.
    ``compute_dtype=bfloat16`` runs the conv stack in bf16 (activations
    and weights; the MXU's native dtype — on TPU a float32 HIGHEST-
    precision conv costs ~3 bf16 passes) with the feature maps returned
    as-is; lpips_distance normalises and accumulates the distance in
    float32 regardless, so the loss stays well-scaled for autodiff
    (no grad-scaling needed — measured in docs/STATUS.md round 4).
    """
    feats = []
    compute_dtype = jnp.dtype(compute_dtype)
    h = x.astype(compute_dtype)
    prec = (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    slice_ends = set(_SLICE_ENDS)
    for i, (cout, pool_before) in enumerate(_VGG_PLAN):
        if pool_before:
            if h.shape[1] < 2 or h.shape[2] < 2:
                # thin input (e.g. a long-axis resliced view): deeper
                # pools would collapse a dim to 0 and the distance would
                # silently go NaN — stop here and score over the slices
                # that exist (the reference stack would hard-crash)
                break
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
                padding="VALID")
        w = jnp.asarray(params["convs"][i]["kernel"]).astype(compute_dtype)
        b = jnp.asarray(params["convs"][i]["bias"]).astype(compute_dtype)
        dn = jax.lax.conv_dimension_numbers(h.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        h = jax.lax.conv_general_dilated(h, w, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         precision=prec)
        h = jax.nn.relu(h + b)
        if i in slice_ends:
            feats.append(h)
    return feats


def _normalize_tensor(x: Array, eps: float = 1e-10) -> Array:
    """Per-pixel unit-normalise over channels (reference: lpips/common.py
    normalize_tensor). eps lives INSIDE the sqrt: d/dx sqrt(sum(x^2)) is
    NaN at an exactly-zero feature vector (post-ReLU zeros are common on
    black MRI padding), which would poison every perceptual-loss
    gradient; sqrt(sum + eps^2) is smooth there and numerically
    identical elsewhere."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + eps * eps)
    return x / (norm + eps)


@partial(jax.jit, static_argnames=("normalize", "use_lin",
                                  "compute_dtype"))
def lpips_distance(params: Dict[str, Any], in0: Array, in1: Array,
                   normalize: bool = True, use_lin: bool = True,
                   compute_dtype=jnp.float32) -> Array:
    """LPIPS distance per batch element.

    in0/in1: [B, H, W, C] with C in {1, 3}; values in [0,1] when
    ``normalize=True`` (mapped to [-1,1] like reference
    lpips/perceptual.py:28-31), else already in [-1,1].
    ``compute_dtype`` selects the VGG stack precision (bfloat16 for the
    mixed-precision training path); normalisation and the lin-weighted
    accumulation below always run float32.
    Returns [B] float32 distances.
    """
    if normalize:
        in0 = 2.0 * in0 - 1.0
        in1 = 2.0 * in1 - 1.0

    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    # grayscale broadcasts to 3 channels through the [3]-vector
    # arithmetic itself — a [B,H,W,1] input is [B,H,W,3] after this
    # line, exactly the reference ScalingLayer's [1,3,1,1] broadcast
    in0 = (in0 - shift) / scale
    in1 = (in1 - shift) / scale

    feats0 = _vgg_features(params, in0, compute_dtype=compute_dtype)
    feats1 = _vgg_features(params, in1, compute_dtype=compute_dtype)

    val = jnp.zeros((in0.shape[0],), jnp.float32)
    for k in range(len(feats0)):
        # channel-normalisation and distance accumulation in float32
        # even when the VGG stack ran bf16
        f0 = _normalize_tensor(feats0[k].astype(jnp.float32))
        f1 = _normalize_tensor(feats1[k].astype(jnp.float32))
        diff = (f0 - f1) ** 2
        if use_lin:
            lw = jnp.asarray(params["lins"][k]["kernel"])  # [1,1,C,1]
            dn = jax.lax.conv_dimension_numbers(diff.shape, lw.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            d = jax.lax.conv_general_dilated(diff, lw, (1, 1), "VALID",
                                             dimension_numbers=dn,
                                             precision=jax.lax.Precision.HIGHEST)
            val = val + jnp.mean(d, axis=(1, 2, 3))
        else:
            val = val + jnp.mean(jnp.sum(diff, axis=-1), axis=(1, 2))
    return val


def lpips_loss(params: Dict[str, Any], pred: Array, target: Array,
               normalize: bool = True) -> Array:
    """Scalar mean LPIPS — the training-loss form
    (reference: base_trainer.py:168-180 ``.mean()``)."""
    return jnp.mean(lpips_distance(params, pred, target, normalize=normalize))
