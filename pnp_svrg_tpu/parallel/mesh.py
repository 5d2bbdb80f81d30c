"""Device-mesh construction for the (batch, meas) axes."""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

BATCH_AXIS = "batch"
MEAS_AXIS = "meas"


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
        meas = 1
        batch = n
        # Prefer meas = 2 when the device count allows an even split and
        # measurement sharding is requested implicitly by a non-square count.
        shape = (batch, meas)
    b, m = shape
    if b * m != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(b, m)
    return Mesh(arr, (BATCH_AXIS, MEAS_AXIS))
