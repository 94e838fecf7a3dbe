"""Device-resident dataset cache: gather triplets in HBM, ship indices.

The host path assembles every training batch on CPU and transfers the
pixel payload (batch x pad^2 x channels float32, ~0.8 MB/step at the
OASIS bench config) to the device each step — through a tunneled chip
that transfer, not compute, bounds the step rate. When the padded slice
stacks fit in HBM (they are small: slices x pad^2 float32 per split),
uploading them ONCE and gathering each batch's slices on device reduces
the per-step host->device traffic to the index/alpha scalars (~KB).

This is a TPU-native replacement for the reference's torch DataLoader
worker pipeline (train_cardiac_aesr.py:174-177 — per-item CPU transforms
+ pinned-copy per step): the sampler's RNG decisions stay on host
(identical draw order, so trajectories match the host path bit for bit),
only the pixel assembly moves into one jitted XLA gather.

Wrapping is governed by --device_data_cache {auto,0,1}: 'auto' enables
the cache when the padded stacks fit the SR_DEVICE_CACHE_MB budget
(default 512 MB) on a single-process, single-device run.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .pairs import TripletSampler

DEFAULT_BUDGET_MB = 512.0


@partial(jax.jit, static_argnames=("has_labels", "use_masks"))
def _gather_slots(flat_img, flat_lbl, flat_mask, slot_idx, between,
                  has_labels: bool, use_masks: bool):
    """Tuple of [B] flat slice indices -> [B, P, P, C] batch, slot-major
    channel layout identical to TripletSampler._item_chans ((from | to
    [| outer_from | outer_to] | between), image then label per slot,
    loss mask of the between slice last)."""
    chans = []
    for idx in slot_idx:
        chans.append(flat_img[idx])
        if has_labels:
            chans.append(flat_lbl[idx])
    if use_masks:
        chans.append(flat_mask[between])
    return jnp.stack(chans, axis=-1)


class DeviceCachedSampler:
    """TripletSampler facade whose batches carry device-gathered pixel
    triplets. RNG decisions delegate to the wrapped sampler's
    RandomState in the exact draw order of the host path, so the two
    paths produce identical batches (and training trajectories)."""

    def __init__(self, sampler: TripletSampler):
        self.s = sampler
        counts = [p.shape[0] for p in sampler._padded]
        # flat index base per volume: spec slice ids are volume-relative
        self._base = np.concatenate(
            ([0], np.cumsum(counts[:-1]))).astype(np.int64)
        self.flat_img = jax.device_put(
            np.concatenate(sampler._padded, axis=0))
        self.flat_lbl = (jax.device_put(
            np.concatenate(sampler._padded_labels, axis=0))
            if sampler.has_labels else None)
        self.flat_mask = (jax.device_put(
            np.concatenate(sampler._padded_masks, axis=0))
            if sampler.use_masks else None)

    # ---- facade surface the training loop touches -------------------
    def __len__(self) -> int:
        return len(self.s)

    @property
    def pad_size(self) -> int:
        return self.s.pad_size

    @property
    def has_labels(self) -> bool:
        return self.s.has_labels

    @property
    def use_masks(self) -> bool:
        return self.s.use_masks

    @property
    def latent_taps(self) -> int:
        return getattr(self.s, "latent_taps", 2)

    @property
    def volumes(self):
        return self.s.volumes

    # ---- batch assembly ----------------------------------------------
    def _assemble(self, idxs) -> Dict[str, np.ndarray]:
        specs = [self.s._item_spec(int(i)) for i in idxs]
        base = self._base[np.array([sp["vi"] for sp in specs])]

        def flat(key):
            return jnp.asarray(
                base + np.array([sp[key] for sp in specs]), jnp.int32)

        b = flat("between")
        slot_idx = [flat("s_from"), flat("s_to")]
        if getattr(self.s, "latent_taps", 2) >= 4:
            slot_idx += [flat("s_outer_from"), flat("s_outer_to")]
        if getattr(self.s, "latent_taps", 2) == 6:
            slot_idx += [flat("s_outer2_from"), flat("s_outer2_to")]
        slot_idx.append(b)
        triplet = _gather_slots(
            self.flat_img, self.flat_lbl, self.flat_mask, tuple(slot_idx),
            b, has_labels=self.s.has_labels, use_masks=self.s.use_masks)
        return {
            "triplet": triplet,
            "alpha_from": np.array([sp["a_from"] for sp in specs],
                                   np.float32),
            "alpha_to": np.array([sp["a_to"] for sp in specs], np.float32),
            "is_inbetween": np.array([sp["is_inbetween"] for sp in specs],
                                     np.float32),
            "patient_index": np.array([sp["vi"] for sp in specs], np.int32),
            "alpha_features": np.array(
                [sp["alpha_features"] for sp in specs], np.float32),
        }

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        sel = self.s.rs.randint(0, len(self.s._idcs), size=batch_size)
        return self._assemble(sel)

    def epoch_batches(self, batch_size: int):
        perm = self.s.rs.permutation(len(self.s._idcs))
        for start in range(0, len(perm) - batch_size + 1, batch_size):
            yield self._assemble(perm[start:start + batch_size])


def cache_nbytes(sampler: TripletSampler) -> int:
    """Bytes the cache would pin in HBM for this sampler."""
    n = sum(p.nbytes for p in sampler._padded)
    if sampler.has_labels:
        n += sum(p.nbytes for p in sampler._padded_labels)
    if sampler.use_masks:
        n += sum(p.nbytes for p in sampler._padded_masks)
    return n


def maybe_device_cache(sampler, mode="auto", multi_device: bool = False,
                       verbose: bool = False):
    """Wrap ``sampler`` in a DeviceCachedSampler when enabled and safe.

    ``mode``: 'auto' (fit-budget gated), '1'/1/True (force), '0'/0/False
    (off). Multi-device / multi-host runs keep the host path: the flat
    stacks would live on one device while the sharded step expects
    batches it can place itself ('1' forces the cache anyway, at the
    caller's risk). Non-TripletSampler sources (MNISTRoto) pass through.
    """
    smode = str(mode).lower() if mode is not None else "auto"
    if smode in ("0", "false", "off", "none"):
        return sampler
    if not isinstance(sampler, TripletSampler):
        return sampler
    force = smode in ("1", "true", "on")
    if not force:
        if multi_device or jax.process_count() > 1:
            return sampler
        budget_mb = float(os.environ.get("SR_DEVICE_CACHE_MB",
                                         DEFAULT_BUDGET_MB))
        nbytes = cache_nbytes(sampler)
        if nbytes > budget_mb * 2 ** 20:
            if verbose:
                print(f"device data cache: off ({nbytes / 2**20:.0f} MB "
                      f"> {budget_mb:.0f} MB budget — raise "
                      f"SR_DEVICE_CACHE_MB or pass "
                      f"--device_data_cache 1)")
            return sampler
    if verbose:
        print(f"device data cache: on "
              f"({cache_nbytes(sampler) / 2**20:.1f} MB resident)")
    return DeviceCachedSampler(sampler)
