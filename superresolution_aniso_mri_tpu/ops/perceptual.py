"""Encoder-backbone perceptual distance — the in-environment perceptual
loss this framework can actually ship.

True pretrained-LPIPS (reference: lpips/dist_model.py:19-108 over a
torchvision VGG16) is permanently unavailable here (zero-egress), and
the random-VGG fallback measurably adds nothing beyond a pixel loss
(docs/lpips_gap.json: 0.92 rank-correlated with MSE). This module
replaces the backbone with the framework's OWN trained super-resolution
encoder (models/acai.py Encoder): features that were trained to
compress real anatomy are structure-selective in exactly the way a
perceptual metric needs, and they come from inside the environment.

Mechanism (mirrors reference lpips/networks_basic.py:19-100):
  * run both images through the frozen encoder, tapping the per-scale
    post-LeakyReLU activations (Encoder(..., return_features=True));
  * unit-normalise each feature vector over channels;
  * squared difference, spatial mean -> per-tap [B, C] vectors;
  * non-negative per-channel "lin" weights (fitted by
    tools/fit_perceptual_head.py on a ranking task, or uniform),
    summed over taps -> [B] distances.

The shipped artifact (weights/perceptual_enc.npz) bundles the encoder
config + frozen params + lin weights, so the loss is self-contained:
no experiment directory needed at train time.

Gate: tools/lpips_gap_study.py --enc_npz scores this metric on the
same held-out distortion suite that condemned the random-VGG fallback;
the fitted artifact must track MS-SSIM better than MSE does and
decorrelate from MSE (recorded in docs/lpips_gap.json).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import AEConfig
from ..models.acai import Encoder

Array = jax.Array

_WEIGHTS_DIR = os.path.normpath(os.path.join(
    os.path.dirname(__file__), "..", "..", "weights"))
_ENC_NPZ = os.path.join(_WEIGHTS_DIR, "perceptual_enc.npz")

# AEConfig fields persisted in the artifact (enough to rebuild the
# encoder; width/latent_width only fix `scales` — the conv stack itself
# is fully convolutional and runs on any even input size)
_CFG_KEYS = ("width", "latent_width", "depth", "latent", "colors",
             "use_batchnorm", "use_sigmoid", "n_res_block")


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_enc_perceptual(path: str, cfg: AEConfig, enc_variables: Dict,
                        lins: List[np.ndarray],
                        meta: Optional[Dict] = None) -> None:
    """Persist the encoder-perceptual artifact.

    ``enc_variables``: the ENCODER's variables dict ({'params': ...} and
    optionally {'batch_stats': ...}), i.e. the 'enc' subtree of a
    trained VanillaACAI. ``lins``: per-tap non-negative [C] weights.
    """
    payload: Dict[str, np.ndarray] = {}
    _flatten(enc_variables, "v", payload)
    for i, lw in enumerate(lins):
        payload[f"lin_{i}"] = np.asarray(lw, np.float32)
    payload["n_lins"] = np.asarray(len(lins), np.int32)
    cfg_dict = {k: getattr(cfg, k) for k in _CFG_KEYS}
    payload["cfg_json"] = np.frombuffer(
        json.dumps(cfg_dict).encode(), dtype=np.uint8)
    if meta:
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_enc_perceptual(path: str) -> Dict[str, Any]:
    """Load the artifact -> {'kind': 'enc', 'cfg': AEConfig,
    'variables': {...}, 'lins': [np [C]], 'meta': {...}}."""
    with np.load(path) as data:
        cfg_dict = json.loads(bytes(data["cfg_json"]).decode())
        n = int(data["n_lins"])
        lins = [np.asarray(data[f"lin_{i}"], np.float32)
                for i in range(n)]
        meta = (json.loads(bytes(data["meta_json"]).decode())
                if "meta_json" in data else {})
        flat = {k[2:]: data[k] for k in data.files if k.startswith("v/")}
    variables = _unflatten(flat)
    cfg = AEConfig(**{**cfg_dict,
                      "n_res_block": cfg_dict.get("n_res_block") or None})
    return {"kind": "enc", "cfg": cfg, "variables": variables,
            "lins": lins, "meta": meta}


def get_enc_perceptual_params(path: Optional[str] = None) -> Dict[str, Any]:
    """Resolve the shipped artifact (or SR_PERCEPTUAL_ENC / explicit
    path). Raises with a build recipe when absent — unlike the VGG
    fallback chain there is no meaningful degraded mode here."""
    path = (path or os.environ.get("SR_PERCEPTUAL_ENC") or _ENC_NPZ)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"encoder-perceptual weights not found at {path}; build "
            f"them from any trained experiment with "
            f"tools/fit_perceptual_head.py --exper_dir <dir>")
    return load_enc_perceptual(path)


def _normalize_tensor(x: Array, eps: float = 1e-10) -> Array:
    """Unit-normalise over channels; eps inside the sqrt keeps the
    gradient finite at all-zero feature vectors (see ops/lpips.py)."""
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True) + eps * eps)
    return x / (norm + eps)


def _encoder_taps(cfg: AEConfig, variables: Dict, x: Array,
                  compute_dtype) -> List[Array]:
    """Frozen-encoder feature taps for one input batch [B, H, W, C]."""
    want = jnp.dtype(compute_dtype).name
    run_cfg = (cfg if cfg.compute_dtype == want
               else AEConfig(**{**{k: getattr(cfg, k) for k in _CFG_KEYS},
                                "compute_dtype": want}))
    enc = Encoder(run_cfg)
    _, feats = enc.apply(variables, x, train=False, return_features=True)
    return feats


def make_enc_distance(cfg: AEConfig, compute_dtype=jnp.float32):
    """Closure over the (static) encoder architecture: returns
    dist(variables, lins, in0, in1) -> [B] float32. jit-safe: the
    module is construction-time static, variables/lins are traced."""

    def dist(variables, lins, in0: Array, in1: Array) -> Array:
        f0 = _encoder_taps(cfg, variables, in0, compute_dtype)
        f1 = _encoder_taps(cfg, variables, in1, compute_dtype)
        val = jnp.zeros((in0.shape[0],), jnp.float32)
        for k in range(len(f0)):
            a = _normalize_tensor(f0[k].astype(jnp.float32))
            b = _normalize_tensor(f1[k].astype(jnp.float32))
            d = jnp.mean((a - b) ** 2, axis=(1, 2))      # [B, C]
            lw = jnp.asarray(lins[k], jnp.float32)        # [C]
            val = val + d @ lw
        return val

    return dist


# cfg -> jitted distance closure (AEConfig is a frozen dataclass,
# hashable, so it keys the cache directly)
_DIST_CACHE: Dict[Any, Any] = {}


def enc_lpips_distance(params: Dict[str, Any], in0: Array, in1: Array,
                       normalize: bool = True,
                       compute_dtype=jnp.float32) -> Array:
    """LPIPS-shaped entry point over the encoder backbone.

    in0/in1: [B, H, W, 1] in [0, 1] — the encoder's native input range
    (``normalize`` is accepted for lpips_distance signature parity but
    is a no-op: unlike VGG there is no [-1,1]/ImageNet remap).
    Returns [B] float32 distances.
    """
    del normalize
    key = (params["cfg"], jnp.dtype(compute_dtype).name)
    if key not in _DIST_CACHE:
        _DIST_CACHE[key] = jax.jit(
            make_enc_distance(params["cfg"], compute_dtype=compute_dtype))
    return _DIST_CACHE[key](params["variables"], params["lins"], in0, in1)


def enc_perceptual_loss(params: Dict[str, Any], pred: Array,
                        target: Array) -> Array:
    """Scalar mean distance — the training-loss form."""
    return jnp.mean(enc_lpips_distance(params, pred, target))


def enc_feature_diff_vectors(params: Dict[str, Any], in0: Array,
                             in1: Array) -> Array:
    """[B, sum_C] concatenated per-channel normalized-feature squared
    diffs (spatially averaged) — the design matrix the lin-weight fit
    (tools/fit_perceptual_head.py) regresses on. enc_lpips_distance
    == concat(lins) . this, by construction."""
    cfg = params["cfg"]
    f0 = _encoder_taps(cfg, params["variables"], in0, jnp.float32)
    f1 = _encoder_taps(cfg, params["variables"], in1, jnp.float32)
    cols = []
    for k in range(len(f0)):
        a = _normalize_tensor(f0[k].astype(jnp.float32))
        b = _normalize_tensor(f1[k].astype(jnp.float32))
        cols.append(jnp.mean((a - b) ** 2, axis=(1, 2)))
    return jnp.concatenate(cols, axis=-1)


def uniform_lins(cfg: AEConfig) -> List[np.ndarray]:
    """Training-free default: every tap contributes its channel mean.
    Taps = BOTH post-LeakyReLU convs per scale + the pre-head conv
    (models/acai.py Encoder.return_features)."""
    chans = []
    for s in range(cfg.scales):
        chans.extend([cfg.depth << s] * 2)
    chans.append(cfg.depth << cfg.scales)
    return [np.full((c,), 1.0 / c, np.float32) for c in chans]
