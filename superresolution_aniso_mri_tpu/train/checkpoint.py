"""Checkpoint save/load preserving the reference's on-disk contract.

The reference stores ``{'model_dict_ae', 'optimizer_dict_ae', 'epoch'}``
via torch.save into ``models/<epoch>.models`` plus rolling best aliases
``ae.models`` / ``caisr.models`` (reference: kwatsch/base_trainer.py:353-367,
101-108; cardiac/trainer_ae.py:70-77). We keep the same file names and the
same triplet of contents, serialised with flax msgpack instead of pickle.
"""
from __future__ import annotations

import os
import struct
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

_MAGIC = b"SRTPU1\x00\x00"


def save_checkpoint(path: str, state, epoch: int,
                    extra: Dict[str, Any] | None = None) -> None:
    """Write params/opt_state/batch_stats/epoch as one msgpack blob."""
    payload = {
        "model_dict_ae": serialization.to_state_dict(state.params),
        "optimizer_dict_ae": serialization.to_state_dict(state.opt_state),
        "batch_stats": serialization.to_state_dict(state.batch_stats),
        "epoch": int(epoch),
    }
    if extra:
        payload.update({k: serialization.to_state_dict(v)
                        for k, v in extra.items()})
    # ONE batched device→host fetch for the whole tree: per-leaf
    # np.asarray would pay a synchronous round-trip per parameter —
    # hundreds of transfers per checkpoint through a tunneled chip
    payload = jax.device_get(payload)
    blob = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, payload))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<q", len(blob)))
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint_raw(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            from .import_torch import is_torch_checkpoint
            if is_torch_checkpoint(path):
                raise ValueError(
                    f"{path}: reference-format torch checkpoint — load it "
                    f"through load_checkpoint()/Trainer.load() (auto-"
                    f"detected) or convert it with "
                    f"tools/convert_reference_checkpoint.py")
            raise ValueError(f"{path}: not a SRTPU checkpoint")
        (n,) = struct.unpack("<q", f.read(8))
        blob = f.read(n)
    return serialization.msgpack_restore(blob)


def load_checkpoint(path: str, state):
    """Restore a state saved by save_checkpoint into ``state``'s pytree
    structure; returns (state, epoch). Reference-format torch pickles
    (kwatsch/base_trainer.py:353-367) are detected and imported in place
    of the native msgpack format — optimizer moments restart fresh."""
    from .import_torch import is_torch_checkpoint
    if is_torch_checkpoint(path):
        from .import_torch import load_torch_reference
        return load_torch_reference(path, state)
    raw = load_checkpoint_raw(path)
    params = serialization.from_state_dict(state.params, raw["model_dict_ae"])
    try:
        opt_state = serialization.from_state_dict(state.opt_state,
                                                  raw["optimizer_dict_ae"])
    except (ValueError, KeyError) as e:
        # optimizer-layout changes (e.g. the ACAI per-model optimizer
        # split) must not strand older experiments: weights still load,
        # Adam moments restart fresh — same contract as torch imports
        import warnings
        warnings.warn(
            f"{path}: optimizer state does not match the current "
            f"optimizer layout ({e}) — weights restored, optimizer "
            f"moments restart fresh")
        opt_state = state.opt_state
    batch_stats = serialization.from_state_dict(state.batch_stats,
                                                raw.get("batch_stats", {}))
    state = state.replace(params=params, opt_state=opt_state,
                          batch_stats=batch_stats)
    return state, int(raw.get("epoch", 0))
