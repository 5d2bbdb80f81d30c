"""Device-mesh construction for the (batch, meas) axes, plus multi-host
process-group initialization.

The reference has no distributed backend at all (numpy in-process +
``multiprocessing.Pool``, SURVEY.md §2.10); here scaling is a
``jax.sharding.Mesh`` whose collectives ride ICI within a slice and DCN
across hosts, with :func:`init_distributed` wiring up the multi-host
process group (``jax.distributed.initialize``)."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

BATCH_AXIS = "batch"
MEAS_AXIS = "meas"
SPATIAL_AXIS = "spatial"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Initialize the multi-host JAX process group.

    Call once per host before building a mesh that spans hosts. Arguments
    default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on single-process runs with
    none of those set this is a no-op, so drivers can call it
    unconditionally. On TPU pods with the cloud metadata service all three
    are auto-detected by ``jax.distributed.initialize``.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def make_mesh(
    shape: tuple[int, int] | None = None,
    devices=None,
) -> Mesh:
    """Build a 2-D (batch, meas) mesh over the available devices.

    Default shape: as many ``batch`` shards as possible with ``meas`` the
    largest power-of-two remainder — images dominate the workload, so DP gets
    priority (the Set12 sweep is 12-way parallel before any model parallelism
    pays off).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)  # default: pure data parallel (images dominate)
    b, m = shape
    if b * m != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(b, m)
    return Mesh(arr, (BATCH_AXIS, MEAS_AXIS))


def make_spatial_mesh(
    shape: tuple[int, int] | None = None,
    devices=None,
) -> Mesh:
    """Build a 2-D (batch, spatial) mesh: DP over images plus row-sharded
    denoising with halo semantics (the framework's context-parallel analog,
    SURVEY.md §2.10)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    b, s = shape
    if b * s != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(b, s)
    return Mesh(arr, (BATCH_AXIS, SPATIAL_AXIS))
