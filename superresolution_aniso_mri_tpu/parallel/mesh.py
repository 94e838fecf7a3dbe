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
    """Place a host batch dict with the leading axis split over the mesh.

    Multi-host: every process holds the identically-seeded GLOBAL batch
    (see parallel/distributed.py); each contributes its process-local
    rows — device_put of non-addressable shards is not possible, so the
    global array is assembled from per-process blocks instead."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        from .distributed import global_batch_from_host
        return global_batch_from_host(sh, batch)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def _make_sharded_step(model, loss_config, lpips_params, mesh: Mesh,
                       state_sharding_fn, donate: bool = False):
    """Shared pjit scaffolding for the 1-D and 2-D mesh train steps.

    ``state_sharding_fn(state)`` returns the sharding (or sharding tree)
    for the train state; metrics come out replicated. The batch sharding
    tree is derived from the ACTUAL batch keys (loss_mask for ACDC
    --get_masks, alpha_features for alpha families, is_inbetween flags,
    ...): every batch entry carries a leading batch axis, so every leaf
    shards over the data axis. One jitted program per distinct key set.
    """
    from ..train.steps import make_train_step

    # donate=None → the RAW step, so the sharded jit below is the only
    # jit layer (no nested-trace overhead, one donation story)
    base_step = make_train_step(model, loss_config, lpips_params,
                                donate=None)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    cache: dict = {}

    def step(state, batch, rng, w):
        keys = tuple(sorted(batch))
        if keys not in cache:
            st_sh = state_sharding_fn(state)
            tree = {k: shard for k in keys}
            cache[keys] = jax.jit(
                base_step,
                in_shardings=(st_sh, tree, rep, rep),
                out_shardings=(st_sh, rep),
                # donate=True lets XLA update params/opt-state in place
                # instead of holding two copies per device; opt-in
                # because it deletes the caller's input state buffers
                donate_argnums=(0,) if donate else (),
            )
        return cache[keys](state, batch, rng, w)

    return step


def make_sharded_train_step(model, loss_config, lpips_params, mesh: Mesh,
                            donate: bool = False):
    """Data-parallel train step: params replicated, batch sharded.

    Built on the same family losses as the single-chip path
    (train.steps) — the only difference is the sharding annotations; XLA
    emits the gradient all-reduce over ICI. ``donate=True`` updates the
    state in place on-device (halves its HBM footprint) but deletes the
    caller's input state buffers — use when the old state is discarded
    every step (the Trainer does).
    """
    rep = replicated(mesh)
    return _make_sharded_step(model, loss_config, lpips_params, mesh,
                              lambda state: rep, donate=donate)


def make_sharded_synthesizer(model, mesh: Mesh,
                             decode_batch: Optional[int] = None,
                             latent_interp: str = "linear"):
    """Volume synthesizer with the slice axis sharded over the mesh —
    whole-volume inference scales across chips
    (SURVEY.md §2.9: shard the slice axis for volume inference).

    Returns synth(params, batch_stats, kept, alphas, use_original=False)
    — same static flags as the local synthesizer; the kept-slice count
    must be divisible by the mesh size (create_super_volume pads).
    ``decode_batch`` bounds per-shard decode chunks like the local
    synthesizer's HBM budget."""
    from ..infer.super_volume import make_volume_synthesizer

    base = make_volume_synthesizer(model, decode_batch=decode_batch,
                                   latent_interp=latent_interp)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)

    # bind shardings by committing the arrays explicitly and calling the
    # ALREADY-jitted synthesizer directly — GSPMD propagates the input
    # shardings; a second jit wrapper would only add a nested trace
    # layer (the one-jit-layer pattern _make_sharded_step documents)
    def call(params, bs, kept, alphas, use_original=False):
        params = jax.device_put(params, rep)
        bs = jax.device_put(bs, rep) if bs else bs
        kept = jax.device_put(kept, shard)
        alphas = jax.device_put(alphas, rep)
        return base(params, bs, kept, alphas, use_original=use_original)

    return call


def make_sharded_batched_synthesizer(model, mesh: Mesh,
                                     decode_batch: Optional[int] = None,
                                     latent_interp: str = "linear"):
    """Multi-volume synthesizer with the VOLUME axis sharded over the
    mesh — data-parallel serving: each device synthesizes its shard of
    a same-shaped volume stack inside the one jitted program (the
    cohort/4D-sequence complement of make_sharded_synthesizer's
    slice-axis sharding, SURVEY.md §2.9). The stack size must be
    divisible by the mesh size (create_super_volumes pads its chunks).

    Same one-jit-layer pattern as make_sharded_synthesizer: inputs are
    committed to their shardings and the already-jitted batched program
    is called directly; GSPMD partitions the flat conv batches."""
    from ..infer.super_volume import make_batched_synthesizer

    base = make_batched_synthesizer(model, decode_batch=decode_batch,
                                    latent_interp=latent_interp)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)

    def call(params, bs, vols, alphas, use_original=False):
        params = jax.device_put(params, rep)
        bs = jax.device_put(bs, rep) if bs else bs
        vols = jax.device_put(vols, shard)
        alphas = jax.device_put(alphas, rep)
        return base(params, bs, vols, alphas, use_original=use_original)

    return call


MODEL_AXIS = "model"


def create_mesh_2d(devices: Optional[Sequence] = None,
                   dp: Optional[int] = None, mp: int = 1) -> Mesh:
    """2-D (data x model) mesh. The model is small (~5-20M params) so
    tensor parallelism is optional (SURVEY §2.9) — this exists for
    configs whose activations outgrow one chip (large widths / deep
    stacks): conv output channels shard over the 'model' axis, batch
    over 'data'."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if dp is None:
        dp = len(devices) // mp
    if dp * mp != len(devices):
        raise ValueError(f"dp*mp = {dp}*{mp} != {len(devices)} devices")
    return Mesh(np.array(devices).reshape(dp, mp), (DATA_AXIS, MODEL_AXIS))


def _param_spec(path, leaf, mp: int):
    """Partition rule: 4-D conv kernels shard their output-channel dim
    over 'model' when divisible; everything else replicates. GSPMD
    inserts the reshards/collectives."""
    if hasattr(leaf, "ndim") and leaf.ndim == 4 and leaf.shape[-1] % mp == 0 \
            and leaf.shape[-1] >= mp:
        return P(None, None, None, MODEL_AXIS)
    return P()


def state_sharding_2d(mesh: Mesh, state):
    """NamedSharding tree for a train state on a 2-D mesh."""
    mp = mesh.shape[MODEL_AXIS]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _param_spec(path, leaf, mp))

    return jax.tree_util.tree_map_with_path(to_sharding, state)


def make_sharded_train_step_2d(model, loss_config, lpips_params, mesh: Mesh):
    """Train step over a (data x model) mesh: batch sharded over 'data',
    conv output channels sharded over 'model' — XLA/GSPMD partitions the
    convolutions and inserts the channel all-gathers/reduce-scatters.
    Numerically identical to the single-device step."""
    return _make_sharded_step(model, loss_config, lpips_params, mesh,
                              lambda state: state_sharding_2d(mesh, state))


def shard_state_2d(mesh: Mesh, state):
    """Place a train state according to the 2-D partition rules."""
    return jax.device_put(state, state_sharding_2d(mesh, state))
