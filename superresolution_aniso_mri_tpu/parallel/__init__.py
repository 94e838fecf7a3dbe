"""Mesh/sharding layer: data-parallel pjit training + sharded inference."""
from .mesh import (
    DATA_AXIS, create_mesh, batch_sharding, replicated, shard_batch,
    replicate_state, make_sharded_train_step, make_sharded_synthesizer,
    make_sharded_batched_synthesizer,
    create_mesh_2d, make_sharded_train_step_2d, shard_state_2d,
)

__all__ = [
    "DATA_AXIS", "create_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate_state", "make_sharded_train_step",
    "create_mesh_2d", "make_sharded_train_step_2d", "shard_state_2d",
    "make_sharded_synthesizer", "make_sharded_batched_synthesizer",
]
