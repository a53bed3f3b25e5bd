"""Device mesh construction + multi-host initialization.

The reference is single-process/single-thread (SURVEY §2.12); the TPU build
introduces Monte-Carlo data parallelism: the OFDM-symbol batch axis shards
over a 1-D mesh of all chips ("mc" axis), BER/SER counters reduce with psum
over ICI, and per-shard PRNG streams derive via `jax.random.fold_in`.

Multi-host pods: call :func:`distributed_init` once per process before any
jax call; `jax.make_mesh` then spans every chip of every host and XLA routes
the psum over ICI within a slice / DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MC_AXIS = "mc"  # Monte-Carlo (batch) axis name


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX if running under a pod launcher.

    No-ops when single-process (the common case on one chip / CPU tests).
    TPU pod environments auto-populate the arguments; they can also come from
    OFDM_TPU_COORDINATOR / OFDM_TPU_NUM_PROCS / OFDM_TPU_PROC_ID.
    """
    coordinator_address = coordinator_address or os.environ.get("OFDM_TPU_COORDINATOR")
    if num_processes is None and "OFDM_TPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["OFDM_TPU_NUM_PROCS"])
    if process_id is None and "OFDM_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["OFDM_TPU_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = MC_AXIS,
) -> Mesh:
    """1-D mesh over (a prefix of) all devices, Monte-Carlo axis only.

    This workload has no learned model, so there is nothing to tensor/
    pipeline-shard (SURVEY §2.12) — all chips go to the embarrassingly
    parallel Monte-Carlo axis; the only collectives are pmean (noise power)
    and psum (error counters)."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=list(devices))


def batch_sharding(mesh: Mesh, axis_name: str = MC_AXIS) -> NamedSharding:
    """Sharding for (batch, ...) arrays: leading axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
