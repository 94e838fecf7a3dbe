"""Multi-host (multi-process) scaffolding.

SURVEY §2.9/§5: on real TPU pods, 8+ chips means multiple hosts, each
running one process that owns its local chips; JAX's distributed runtime
(coordinator + GSPMD global meshes) replaces the reference's
single-process CUDA story. This module provides:

  * ``initialize_distributed`` — flag/env-driven
    ``jax.distributed.initialize`` (must run before any backend query);
  * main-process gating for filesystem side effects (settings,
    checkpoints, TensorBoard, npz, png) so N hosts don't race on shared
    storage;
  * ``global_batch_from_host`` — assemble a global device array from the
    identically-seeded host-side batch each process computes, slicing
    out the process-local rows (process-major contiguous blocks match
    ``jax.devices()`` ordering, so global row order is preserved).

Design choice: every process loads the dataset and draws the SAME
global batch sequence (identical seeds), then feeds only its slice to
the device. This costs duplicated host-side sampling but guarantees a
multi-process run is numerically IDENTICAL to the single-process run on
the same total device count — which is also how we test it
(tests/test_multihost.py: 2 procs x 4 devices == 1 proc x 8 devices).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_INITIALIZED = False


def initialize_distributed(args: Optional[Dict] = None) -> bool:
    """Initialize the JAX distributed runtime when configured.

    Sources, in priority order: explicit args
    (``coordinator_address``/``num_processes``/``process_id``), then the
    ``SR_COORDINATOR_ADDRESS``/``SR_NUM_PROCESSES``/``SR_PROCESS_ID``
    environment. No-ops (returns False) when neither names more than one
    process. Must be called before any JAX device query — the CLI entry
    points call it first thing in run_training.

    On a real multi-host TPU pod where the environment provides cluster
    discovery (GKE/Cloud TPU metadata), set ``SR_MULTIHOST=auto`` to call
    ``jax.distributed.initialize()`` with no arguments instead.
    """
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return True
    args = args or {}
    coord = (args.get("coordinator_address")
             or os.environ.get("SR_COORDINATOR_ADDRESS"))
    nproc = args.get("num_processes") or os.environ.get("SR_NUM_PROCESSES")
    pid = args.get("process_id")
    if pid is None:
        pid = os.environ.get("SR_PROCESS_ID")
    # explicit flags win over SR_MULTIHOST=auto — a pod wrapper
    # exporting 'auto' must not override ANY explicitly given
    # coordinator/num_processes/process_id (documented priority: args,
    # then environment), so every explicit branch — including the
    # single-process no-op and the partial-config fail-fast — is
    # evaluated BEFORE the auto fallback
    if nproc is not None and int(nproc) <= 1:
        # an EXPLICIT num_processes<=1 is a valid single-process config
        # (e.g. the N=1 instantiation of a multi-host launch template,
        # coordinator flag and all)
        return False
    # PARTIAL configs fail fast: silently proceeding single-process
    # (or auto-initializing) would let N hosts each think they are
    # process 0 and race on the shared experiment directory
    if bool(coord) != bool(nproc):
        raise ValueError(
            f"multi-host: incomplete configuration "
            f"(coordinator_address={coord!r}, num_processes={nproc!r}) "
            f"— set both (flags or SR_COORDINATOR_ADDRESS/"
            f"SR_NUM_PROCESSES), or neither for single-process")
    if not coord and not nproc:
        if os.environ.get("SR_MULTIHOST") == "auto":
            jax.distributed.initialize()
            _INITIALIZED = True
            return True
        return False
    if pid is None:
        raise ValueError(
            "multi-host: coordinator_address and num_processes are set "
            "but process_id is missing (flag --process_id or env "
            "SR_PROCESS_ID)")
    jax.distributed.initialize(coordinator_address=str(coord),
                               num_processes=int(nproc),
                               process_id=int(pid))
    _INITIALIZED = True
    return True


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def is_main_process() -> bool:
    """True on the process that owns filesystem side effects."""
    import jax
    return jax.process_count() == 1 or jax.process_index() == 0


def global_batch_from_host(sharding, batch: Dict) -> Dict:
    """Turn an identically-seeded host batch (full GLOBAL leading axis on
    every process) into global device arrays sharded over the mesh.

    The full global array is handed to
    ``jax.make_array_from_process_local_data``, which slices out this
    process's addressable shards itself — correct for ANY mesh device
    order, not just process-major-contiguous ones (probe-verified with a
    reversed device order). Each leaf's leading axis must be divisible
    by ``process_count()``.
    """
    import jax

    pc = jax.process_count()
    # the sharding splits the leading axis over the mesh axes named in
    # the spec's first entry (e.g. just 'data' on a data x model mesh) —
    # that product is the operative divisibility requirement; checking
    # process_count alone would let e.g. a batch of 10 on a
    # 2-proc x 4-device data mesh fail later with an opaque
    # uneven-sharding error instead of this message
    mesh = sharding.mesh
    lead = sharding.spec[0] if len(sharding.spec) else None
    lead_axes = (() if lead is None
                 else (lead,) if isinstance(lead, str) else tuple(lead))
    nshard = int(np.prod([mesh.shape[a] for a in lead_axes])) or 1
    out = {}
    for k, v in batch.items():
        arr = np.ascontiguousarray(np.asarray(v))
        # nshard (the sharded-axis size) is the ONLY divisibility the
        # sharding itself needs — make_array_from_process_local_data
        # slices each process's addressable shards out of the full
        # array, so a 2-D mesh whose 'data' axis is smaller than
        # process_count (dp=2 over 4 hosts of 2 devices) is valid
        if arr.shape[0] % max(nshard, 1):
            raise ValueError(
                f"batch leaf {k!r}: leading axis {arr.shape[0]} not "
                f"divisible by the sharded axis size {nshard} "
                f"(process_count {pc})")
        out[k] = jax.make_array_from_process_local_data(
            sharding, arr, global_shape=arr.shape)
    return out
