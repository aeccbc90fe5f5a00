"""Mesh construction and sharding helpers.

Data parallelism the TPU-native way: a 1-D ``Mesh`` over the available
chips with the batch dimension sharded along ``data``. The jitted train
step consumes sharded batches and replicated state; XLA inserts the
gradient all-reduce (psum) over ICI automatically from the sharding
annotations — no NCCL/MPI analog, no host gradient loop
(cf. reference optimizers.py:137-163 which emulates large batches on one
GPU).

The axis layout is deliberately extensible: ``make_mesh`` accepts extra
axes (e.g. ``("data", "model")``) so tensor-parallel sharding of the MHA
heads / FFN can be layered on later without touching callers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``num_devices`` devices.

    Defaults to a 1-D data-parallel mesh over every visible device.
    """
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    devices = devices[:num_devices]
    if axis_sizes is None:
        axis_sizes = (num_devices,) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(axis_sizes)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension along the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree onto the mesh, batch-dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters, optimizer state) on the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
