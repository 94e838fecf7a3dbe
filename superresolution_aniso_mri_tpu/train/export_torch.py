"""Exporter to reference-format torch checkpoints — the inverse of
``import_torch``.

Writes a torch pickle holding ``{'model_dict_ae', 'optimizer_dict_ae',
'epoch'}`` whose ``model_dict_ae`` is an NCHW ``nn.Sequential`` state
dict shaped exactly like the reference's Encoder/Decoder generators
emit (reference: networks/acai_vanilla.py:49-102,112-138 and
kwatsch/base_trainer.py:353-367 save_models/load), so a model trained
here can be loaded by the ORIGINAL PyTorch codebase (its
``BaseTrainer.load`` restores both dicts — the exported optimizer dict
is a fresh Adam state over the twin's parameters, which
``load_state_dict`` accepts; optimizer moments have no meaningful
torch↔optax correspondence, see import_torch's module docstring).

The key layout comes from building a live torch twin of the reference
generator recipe (``build_reference_twin``) and filling its state dict
via the same order-zip used by the importer: both sides register
convs/BNs/ResBlocks in the same call order, so classifying the twin's
index-keyed entries and zipping them against the flax side's canonical
name order pairs every tensor (with HWIO → OIHW transposes).

Geometry note: the framework's default 1x1 stem is VALID (shape-exact)
while the true reference generator pads it by 1 (acai_vanilla.py:51,
growing H/W by 2 before the pools floor it back). Weight shapes and
state-dict keys are identical either way — an exported checkpoint
loads in the reference regardless — but forward activations of models
trained with the shape-exact stem differ slightly from running the
same weights under the reference's padded geometry (the importer's
``stem_pad_parity`` knob covers the opposite direction).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

from .import_torch import (
    _flax_bn_order,
    _flax_conv_order,
    _flax_res_order,
    _split_sides,
    _torch_layers,
)

__all__ = [
    "build_reference_twin",
    "flax_to_torch_state",
    "save_reference_checkpoint",
]


def build_reference_twin(width: int, latent_width: int, depth: int,
                         latent: int, colors: int = 1,
                         use_batchnorm: bool = True,
                         use_sigmoid: bool = True,
                         n_res_block: Optional[int] = None,
                         stem_padding: int = 0):
    """Torch twin of models/acai.py VanillaACAI with the reference
    generator's exact registration order (networks/acai_vanilla.py:
    49-102: per-scale [Conv3x3, LeakyReLU]x2 [+BN] + AvgPool, optional
    ResBlocks, 3x3 head; decoder mirror with Upsample(x2) and optional
    final Sigmoid). ``stem_padding=1`` reproduces the reference's
    padded 1x1 stem geometry; 0 is this framework's shape-exact stem —
    state-dict keys and shapes are identical either way."""
    import torch
    import torch.nn as tnn

    class _ResBlock(tnn.Module):
        # reference ResBlock (acai_vanilla.py:20-35): inner Sequential
        # (ReLU, Conv3x3->channel, ReLU, Conv1x1->in) under 'conv',
        # residual add
        def __init__(self, in_channel, channel=128):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.ReLU(inplace=True),
                tnn.Conv2d(in_channel, channel, 3, padding=1),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(channel, in_channel, 1),
            )

        def forward(self, x):
            return x + self.conv(x)

    scales = int(round(math.log2(width // latent_width)))
    enc = [tnn.Conv2d(colors, depth, 1, padding=stem_padding)]
    kp = depth
    for s in range(scales):
        k = depth << s
        enc += [tnn.Conv2d(kp, k, 3, padding=1), tnn.LeakyReLU(0.01),
                tnn.Conv2d(k, k, 3, padding=1), tnn.LeakyReLU(0.01)]
        if use_batchnorm:
            enc += [tnn.BatchNorm2d(k)]
        enc += [tnn.AvgPool2d(2)]
        kp = k
    if n_res_block:
        enc += [_ResBlock(kp) for _ in range(n_res_block)]
        enc += [tnn.ReLU(inplace=True)]
    k = depth << scales
    enc += [tnn.Conv2d(kp, k, 3, padding=1), tnn.LeakyReLU(0.01),
            tnn.Conv2d(k, latent, 3, padding=1)]

    dec = []
    if n_res_block:
        dec += [_ResBlock(latent) for _ in range(n_res_block)]
        dec += [tnn.ReLU(inplace=True)]
    kp = latent
    for s in range(scales - 1, -1, -1):
        k = depth << s
        dec += [tnn.Conv2d(kp, k, 3, padding=1), tnn.LeakyReLU(0.01),
                tnn.Conv2d(k, k, 3, padding=1), tnn.LeakyReLU(0.01)]
        if use_batchnorm:
            dec += [tnn.BatchNorm2d(k)]
        dec += [tnn.Upsample(scale_factor=2)]
        kp = k
    dec += [tnn.Conv2d(kp, depth, 3, padding=1), tnn.LeakyReLU(0.01),
            tnn.Conv2d(depth, colors, 3, padding=1)]
    if use_sigmoid:
        dec += [tnn.Sigmoid()]

    class AE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.enc = tnn.Sequential(*enc)
            self.dec = tnn.Sequential(*dec)

        def forward(self, x):
            return self.dec(self.enc(x))

        def encode(self, x):
            return self.enc(x)

        def decode(self, z):
            return self.dec(z)

    return AE()


def _oihw(kernel: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(np.asarray(kernel, np.float32), (3, 2, 0, 1)))


def flax_to_torch_state(params, batch_stats, twin) -> Dict[str, Any]:
    """Fill ``twin``'s state dict from a flax (params, batch_stats)
    tree. Accepts the AE tree itself ({'enc','dec',...}) or a family
    wrapper ({'ae': {...}, ...} — only the AE is exported, matching
    what the reference persists). Returns the twin's state dict with
    every conv/BN tensor replaced; raises when layer counts or shapes
    disagree (wrong architecture flags for this twin)."""
    import torch

    wrapped = "enc" not in params and "ae" in params
    ae_params = params["ae"] if wrapped else params
    batch_stats = batch_stats or {}
    ae_stats = (batch_stats.get("ae", {}) if wrapped else batch_stats) or {}

    sd = twin.state_dict()
    sides = _split_sides(sd)
    out = dict(sd)
    for side, entries in sides.items():
        if side not in ae_params:
            raise ValueError(
                f"twin submodule {side!r} has no flax counterpart "
                f"(model sides: {sorted(ae_params)})")
        p_side = ae_params[side]
        s_side = (ae_stats or {}).get(side, {}) or {}
        convs, bns, res = _torch_layers(entries)
        conv_names = _flax_conv_order(p_side)
        bn_names = _flax_bn_order(p_side)
        res_names = _flax_res_order(p_side)
        if (len(convs) != len(conv_names) or len(bns) != len(bn_names)
                or len(res) != len(res_names)):
            raise ValueError(
                f"{side}: twin has {len(convs)} convs / {len(bns)} BNs "
                f"/ {len(res)} ResBlocks but the flax model has "
                f"{len(conv_names)} / {len(bn_names)} / "
                f"{len(res_names)} — architecture flags do not match")

        def _put(key: str, arr: np.ndarray) -> None:
            want = tuple(out[key].shape)
            if tuple(arr.shape) != want:
                raise ValueError(
                    f"{side}.{key}: exported shape {tuple(arr.shape)} "
                    f"!= reference layout's {want}")
            out[key] = torch.from_numpy(
                np.ascontiguousarray(arr.astype(np.float32)))

        for (idx, _leaves), name in zip(convs, conv_names):
            _put(f"{side}.{idx}.weight", _oihw(p_side[name]["kernel"]))
            _put(f"{side}.{idx}.bias",
                 np.asarray(p_side[name]["bias"], np.float32))
        for (idx, subconvs), name in zip(res, res_names):
            blk = p_side[name]
            sub_names = _flax_conv_order(blk)
            if len(subconvs) != len(sub_names):
                raise ValueError(
                    f"{side}.{idx} → {name}: twin ResBlock has "
                    f"{len(subconvs)} convs, flax has {len(sub_names)}")
            for (sub_idx, _leaves), sub in zip(subconvs, sub_names):
                _put(f"{side}.{idx}.conv.{sub_idx}.weight",
                     _oihw(blk[sub]["kernel"]))
                _put(f"{side}.{idx}.conv.{sub_idx}.bias",
                     np.asarray(blk[sub]["bias"], np.float32))
        for (idx, _leaves), name in zip(bns, bn_names):
            if name not in s_side:
                raise ValueError(
                    f"{side}.{idx} → {name}: flax tree has no batch "
                    f"stats for this BatchNorm — export needs the full "
                    f"(params, batch_stats) pair")
            _put(f"{side}.{idx}.weight",
                 np.asarray(p_side[name]["scale"], np.float32))
            _put(f"{side}.{idx}.bias",
                 np.asarray(p_side[name]["bias"], np.float32))
            _put(f"{side}.{idx}.running_mean",
                 np.asarray(s_side[name]["mean"], np.float32))
            _put(f"{side}.{idx}.running_var",
                 np.asarray(s_side[name]["var"], np.float32))
    return out


def save_reference_checkpoint(path: str, params, batch_stats, *,
                              width: int, latent_width: int, depth: int,
                              latent: int, colors: int = 1,
                              use_batchnorm: bool = True,
                              use_sigmoid: bool = True,
                              n_res_block: Optional[int] = None,
                              epoch: int = 0, lr: float = 0.0001) -> None:
    """Write a reference-loadable ``.models`` torch pickle.

    ``optimizer_dict_ae`` is a fresh Adam state over the twin's
    parameters (reference ``BaseTrainer.load`` restores it
    unconditionally, base_trainer.py:358-362 — an empty dict would
    crash there)."""
    import torch

    twin = build_reference_twin(width, latent_width, depth, latent,
                                colors=colors,
                                use_batchnorm=use_batchnorm,
                                use_sigmoid=use_sigmoid,
                                n_res_block=n_res_block)
    sd = flax_to_torch_state(params, batch_stats, twin)
    twin.load_state_dict(sd)  # validates key coverage one more time
    opt = torch.optim.Adam(twin.parameters(), lr=lr)
    torch.save({"model_dict_ae": twin.state_dict(),
                "optimizer_dict_ae": opt.state_dict(),
                "epoch": int(epoch)}, path)
