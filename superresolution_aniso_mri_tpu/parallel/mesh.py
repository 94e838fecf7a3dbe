"""Device-mesh sharding for training and volume inference.

The reference's only multi-device story is DataParallel around the LPIPS
net and a manual 2-GPU loss-network placement
(reference: lpips/dist_model.py:91, kwatsch/base_trainer.py:33-56).
TPU-native replacement: ONE pjit program per step with
  * parameters replicated across the mesh,
  * the batch (and the slice axis at inference) sharded over the 'data'
    axis — XLA inserts the psum grad all-reduce over ICI automatically.

No NCCL/MPI: collectives are compiler-inserted from sharding annotations.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch-like arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict with the leading axis split over the mesh."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def make_sharded_train_step(model, loss_config, lpips_params, mesh: Mesh):
    """Data-parallel train step: params replicated, batch sharded.

    Built on the same family losses as the single-chip path
    (train.steps) — the only difference is the sharding annotations; XLA
    emits the gradient all-reduce over ICI.
    """
    from ..train.steps import make_train_step

    base_step = make_train_step(model, loss_config, lpips_params,
                                donate=False)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)

    # jit with explicit in/out shardings — the canonical pjit pattern.
    # The batch sharding tree is derived from the ACTUAL batch keys
    # (loss_mask for ACDC --get_masks, alpha_features for alpha families,
    # is_inbetween flags, ...): every batch entry carries a leading batch
    # axis, so every leaf shards over the data axis. One jitted program
    # per distinct key set.
    cache: dict = {}

    def step(state, batch, rng, w):
        keys = tuple(sorted(batch))
        if keys not in cache:
            tree = {k: shard for k in keys}
            cache[keys] = jax.jit(
                lambda st, b, r, ww: base_step(st, b, r, ww),
                in_shardings=(rep, tree, rep, rep),
                out_shardings=(rep, rep),
            )
        return cache[keys](state, batch, rng, w)

    return step


def make_sharded_synthesizer(model, mesh: Mesh):
    """Volume synthesizer with the slice axis sharded over the mesh —
    whole-volume inference scales across chips
    (SURVEY.md §2.9: shard the slice axis for volume inference)."""
    from ..infer.super_volume import make_volume_synthesizer

    base = make_volume_synthesizer(model)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)

    synth = jax.jit(
        lambda params, bs, kept, alphas: base(params, bs, kept, alphas,
                                              use_original=False),
        in_shardings=(rep, rep, shard, rep),
    )
    return synth
