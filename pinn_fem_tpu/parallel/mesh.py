"""Device-mesh helpers.

The reference has NO distribution layer (SURVEY §2: no torch.distributed,
no NCCL/MPI — the only cross-process mechanism is a Node child_process
spawn).  This package adds the TPU-native scaling story on top of the same
capabilities: batches of independent problems shard over a "dp" mesh axis,
and large meshes shard their element arrays over a "tp" axis with psum
assembly — collectives compiled by XLA over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(
    n_devices: Optional[int] = None, tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ("dp", "tp") mesh over the available devices.

    tp defaults to 2 when the device count is even, else 1 — enough to
    exercise real cross-axis collectives without assuming a topology.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
    if n % tp != 0:
        raise ValueError(f"n_devices={n} not divisible by tp={tp}")
    arr = np.array(devices).reshape(n // tp, tp)
    return Mesh(arr, ("dp", "tp"))


def dp_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the dp axis."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
