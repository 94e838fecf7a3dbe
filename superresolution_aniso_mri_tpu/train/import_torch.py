"""Importer for reference-format torch checkpoints.

The reference persists experiments as torch pickles holding
``{'model_dict_ae', 'optimizer_dict_ae', 'epoch'}``
(reference: kwatsch/base_trainer.py:353-367 save_models/load) with NCHW
``nn.Sequential`` state dicts produced by the Encoder/Decoder generators
(reference: networks/acai_vanilla.py:49-102 — index-keyed entries like
``enc.3.weight``). This module maps those onto the framework's flax
NHWC parameter trees so an existing reference experiment can be resumed
or evaluated here without retraining.

Mapping strategy: torch ``state_dict`` keys preserve module registration
order, and both implementations register the same layers in the same
call order. We therefore classify each torch submodule (conv vs
batch-norm) from its tensor shapes, list the flax side's conv/BN
parameter names in their canonical order (named stem first, auto-named
``Conv_i``/``BatchNorm_i`` numerically, named head/out last — the exact
call order in models/acai.py), and zip the two sequences with layout
transposes (OIHW → HWIO). Optimizer moments are NOT imported — torch
Adam state has no meaningful correspondence to a fresh optax tree's
step-dependent bias correction; the optimizer restarts, which only
matters for the first few post-import steps.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

__all__ = [
    "is_torch_checkpoint",
    "load_torch_reference",
    "torch_state_to_flax",
]


def is_torch_checkpoint(path: str) -> bool:
    """True if the file looks like a torch.save artifact (zip archive —
    torch>=1.6 — or a legacy pickle stream), not an SRTPU msgpack."""
    with open(path, "rb") as f:
        head = f.read(8)
    # PK = zip archive (torch >= 1.6); 0x80 = pickle PROTO opcode of any
    # legacy torch.save stream (protocol >= 2)
    return head[:2] == b"PK" or head[:1] == b"\x80"


def _load_torch_pickle(path: str) -> Dict[str, Any]:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(raw, dict) or "model_dict_ae" not in raw:
        raise ValueError(
            f"{path}: torch checkpoint without 'model_dict_ae' — not a "
            f"reference .models file")
    return raw


def _split_sides(sd) -> Dict[str, Dict[str, np.ndarray]]:
    """Group 'enc.3.weight'-style keys into {side: {rest: array}} with
    insertion order preserved."""
    sides: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        side, _, rest = key.partition(".")
        sides.setdefault(side, {})[rest] = np.asarray(
            val.detach().cpu().numpy() if hasattr(val, "detach") else val)
    return sides


def _torch_layers(entries: Dict[str, np.ndarray]):
    """Classify a Sequential side's index-keyed entries into ordered
    conv, BN and ResBlock layer lists. Convs carry a 4-D ``weight``; BNs
    carry ``running_mean``; ResBlocks carry NESTED ``conv.N.weight``
    keys (reference: networks/acai_vanilla.py:20-35 — an inner
    Sequential of ReLU/Conv3x3/ReLU/Conv1x1). Anything else is a loud
    NotImplementedError — silently skipping an unrecognized submodule
    would import a checkpoint that leaves those weights at random init."""
    by_idx: Dict[str, Dict[str, np.ndarray]] = {}
    order: List[str] = []
    for rest, arr in entries.items():
        idx, _, leaf = rest.partition(".")
        if idx not in by_idx:
            by_idx[idx] = {}
            order.append(idx)
        by_idx[idx][leaf] = arr
    convs, bns, res = [], [], []
    for idx in order:
        leaves = by_idx[idx]
        if "running_mean" in leaves:
            bns.append((idx, leaves))
        elif "weight" in leaves and leaves["weight"].ndim == 4:
            convs.append((idx, leaves))
        elif all("." in k for k in leaves) and any(
                k.endswith(".weight") for k in leaves):
            # nested Sequential → ResBlock: gather its sub-convs in
            # index order ('conv.1.weight', 'conv.3.weight' → two convs)
            sub: Dict[int, Dict[str, np.ndarray]] = {}
            for k, arr in leaves.items():
                parts = k.split(".")
                if len(parts) != 3 or parts[0] != "conv":
                    raise NotImplementedError(
                        f"unsupported nested torch submodule at index "
                        f"{idx} (key {k!r} — not a reference ResBlock)")
                sub.setdefault(int(parts[1]), {})[parts[2]] = arr
            # keep the inner Sequential indices: the exporter
            # (export_torch.py) needs them to write 'conv.<i>.*' keys
            res.append((idx, [(i, sub[i]) for i in sorted(sub)]))
        else:
            raise NotImplementedError(
                f"unsupported torch layer at index {idx} "
                f"(leaves: {sorted(leaves)})")
    return convs, bns, res


_NUM_RE = re.compile(r"_(\d+)$")


def _flax_conv_order(tree: Dict[str, Any]) -> List[str]:
    """Conv param names in call order: stem, Conv_i (numeric), head/out."""
    names = [k for k, v in tree.items()
             if isinstance(v, dict) and "kernel" in v]
    for n in names:
        if n.startswith("ConvTranspose"):
            raise NotImplementedError(
                "ConvTranspose import (VanillaACAIStrided) is not "
                "supported — torch and flax transposed-conv kernel "
                "semantics differ; retrain or use the upsample variant")
    first = [n for n in names if n == "stem"]
    last = [n for n in names if n in ("head", "out")]
    mid = sorted((n for n in names if n not in ("stem", "head", "out")),
                 key=lambda n: int(_NUM_RE.search(n).group(1)))
    return first + mid + last


def _flax_bn_order(tree: Dict[str, Any]) -> List[str]:
    names = [k for k in tree if k.startswith("BatchNorm")]
    return sorted(names, key=lambda n: int(_NUM_RE.search(n).group(1)))


def _flax_res_order(tree: Dict[str, Any]) -> List[str]:
    names = [k for k in tree if k.startswith("ResBlock")]
    return sorted(names, key=lambda n: int(_NUM_RE.search(n).group(1)))


def _conv_entry(side: str, where: str, leaves: Dict[str, np.ndarray],
                model_conv: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """One torch conv → flax {'kernel','bias'} with layout transpose and
    shape/bias validation."""
    if "bias" not in leaves:
        raise ValueError(
            f"{side}.{where}: torch conv has no bias — the flax models "
            f"always use biased convs, so this checkpoint comes from a "
            f"different architecture variant")
    kernel = np.transpose(leaves["weight"], (2, 3, 1, 0))  # OIHW→HWIO
    want = tuple(model_conv["kernel"].shape)  # no device transfer
    if kernel.shape != want:
        raise ValueError(
            f"{side}.{where}: kernel shape {kernel.shape} != "
            f"model's {want}")
    return {"kernel": kernel.astype(np.float32),
            "bias": leaves["bias"].astype(np.float32)}


def _map_side(side: str, entries: Dict[str, np.ndarray],
              params_side: Dict[str, Any],
              stats_side: Dict[str, Any]) -> Tuple[Dict, Dict]:
    convs, bns, res = _torch_layers(entries)
    conv_names = _flax_conv_order(params_side)
    bn_names = _flax_bn_order(params_side)
    res_names = _flax_res_order(params_side)
    if (len(convs) != len(conv_names) or len(bns) != len(bn_names)
            or len(res) != len(res_names)):
        raise ValueError(
            f"{side}: torch has {len(convs)} convs / {len(bns)} BNs / "
            f"{len(res)} ResBlocks but the flax model has "
            f"{len(conv_names)} / {len(bn_names)} / {len(res_names)} — "
            f"architecture flags (width/latent_width/depth/use_batchnorm/"
            f"n_res_block) do not match the checkpoint")
    new_p = dict(params_side)
    new_s = dict(stats_side)
    for (idx, leaves), name in zip(convs, conv_names):
        new_p[name] = _conv_entry(side, idx, leaves, params_side[name])
    for (idx, subconvs), name in zip(res, res_names):
        blk = params_side[name]
        sub_names = _flax_conv_order(blk)
        if len(subconvs) != len(sub_names):
            raise ValueError(
                f"{side}.{idx} → {name}: torch ResBlock has "
                f"{len(subconvs)} convs, flax has {len(sub_names)}")
        new_blk = dict(blk)
        for (_sub_idx, leaves), sub in zip(subconvs, sub_names):
            new_blk[sub] = _conv_entry(side, f"{idx}.{sub}", leaves,
                                       blk[sub])
        new_p[name] = new_blk
    for (idx, leaves), name in zip(bns, bn_names):
        new_p[name] = {"scale": leaves["weight"].astype(np.float32),
                       "bias": leaves["bias"].astype(np.float32)}
        new_s[name] = {"mean": leaves["running_mean"].astype(np.float32),
                       "var": leaves["running_var"].astype(np.float32)}
    return new_p, new_s


def torch_state_to_flax(torch_sd, params, batch_stats):
    """Map a reference NCHW state dict onto (params, batch_stats) copies.

    ``params`` may be the AE tree itself ({'enc','dec',...}) or a family
    wrapper ({'ae': {...}, ...}); the reference only ever saves the AE
    (`model_dict_ae`), so wrapper siblings (disc/probe) keep their
    current values.
    """
    wrapped = "enc" not in params and "ae" in params
    ae_params = params["ae"] if wrapped else params
    batch_stats = batch_stats or {}  # BN-free trees may pass None
    ae_stats = (batch_stats.get("ae", {}) if wrapped else batch_stats) or {}

    sides = _split_sides(torch_sd)
    unknown = set(sides) - set(ae_params)
    if unknown:
        raise ValueError(
            f"torch checkpoint has submodules {sorted(unknown)} with no "
            f"flax counterpart (model sides: {sorted(ae_params)}) — wrong "
            f"ae_class for this checkpoint? (note: MultiChannelAE/"
            f"ACDCLBL reference checkpoints are not importable — the "
            f"decoder head structure differs)")
    # reverse coverage: every flax side that owns conv weights must be
    # fed by the checkpoint — a partial artifact (e.g. encoder-only)
    # would otherwise 'load' and predict with a random decoder
    def _has_convs(tree):
        return any(isinstance(v, dict)
                   and ("kernel" in v or _has_convs(v))
                   for v in tree.values())

    missing = sorted(s for s in ae_params
                     if s not in sides and _has_convs(ae_params[s]))
    if missing:
        raise ValueError(
            f"torch checkpoint is missing submodules {missing} that the "
            f"flax model requires (checkpoint sides: {sorted(sides)}) — "
            f"partial/encoder-only artifact?")
    new_params = dict(ae_params)
    new_stats = dict(ae_stats)
    for side, entries in sides.items():
        p_side, s_side = _map_side(side, entries, ae_params[side],
                                   (ae_stats or {}).get(side, {}) or {})
        new_params[side] = p_side
        if s_side:
            new_stats[side] = s_side
    if wrapped:
        out_p = dict(params)
        out_p["ae"] = new_params
        out_s = dict(batch_stats or {})
        out_s["ae"] = new_stats
        return out_p, out_s
    return new_params, new_stats


def load_torch_reference(path: str, state):
    """Restore a reference ``.models`` torch pickle into ``state``.

    Returns (state, epoch). Optimizer state is left as-is (fresh);
    see module docstring.
    """
    raw = _load_torch_pickle(path)
    params, batch_stats = torch_state_to_flax(
        raw["model_dict_ae"], state.params, state.batch_stats or {})
    state = state.replace(params=params, batch_stats=batch_stats)
    return state, int(raw.get("epoch", 0))
