"""Multi-host (multi-process) entry points.

The reference is single-process NumPy; its distributed story is the
algebraic hook set only (SURVEY.md §2.3).  This module supplies the missing
runtime glue for running the sharded engines across processes/hosts:

- ``initialize_multihost`` wraps ``jax.distributed.initialize`` so every
  process joins one global device mesh (ICI within a host, DCN across).
- ``make_global`` places a host-replicated array onto a (possibly
  multi-process) mesh as a global ``jax.Array``: each process materializes
  only its addressable shards, so no cross-host data movement happens —
  exactly the broadcast-seed/shard-local-data discipline the sketch's
  linearity allows.

Proven by ``tests/test_multihost.py``: a 2-process × 2-device CPU run of
``sharded_sparse_stream_sketch`` reproduces the single-process container.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the global JAX runtime.

    With no arguments, defers to the standard env/cluster auto-detection
    (``jax.distributed.initialize()``); on TPU pods that discovers the
    topology from the metadata server.  Explicit arguments (or the
    ``TT_SKETCH_TPU_COORDINATOR`` / ``TT_SKETCH_TPU_NUM_PROCESSES`` /
    ``TT_SKETCH_TPU_PROCESS_ID`` env vars) support manual CPU/GPU clusters
    and the multi-process CPU test harness.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "TT_SKETCH_TPU_COORDINATOR"
    )
    if num_processes is None and "TT_SKETCH_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TT_SKETCH_TPU_NUM_PROCESSES"])
    if process_id is None and "TT_SKETCH_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TT_SKETCH_TPU_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_names=("data",), axis_sizes=None) -> Mesh:
    """A mesh over ALL global devices (every process must build the same).

    ``axis_sizes=None`` puts every device on the first axis."""
    devices = np.array(jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(axis_sizes), axis_names)


def make_global(mesh: Mesh, spec: P, arr) -> jax.Array:
    """Place a host-replicated array on the mesh as a global jax.Array.

    Every process passes the SAME full host array (cheap for sketch inputs:
    they are either small or generated from a broadcast seed); each process
    uploads only its addressable shards.  In single-process meshes this is
    plain device placement.
    """
    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()
