"""Data-parallel device mesh utilities.

The reference's entire distribution story is single-host
``torch.nn.DataParallel`` (reference: src/train.py:269-274). Here data
parallelism is a first-class mesh axis: batches are sharded over ``"data"``,
parameters are replicated, and XLA inserts the gradient all-reduce (psum over
ICI) from the sharding annotations — no hand-written communication.
A ``"model"`` axis is reserved for spatial/tensor sharding of high-res
streaming inference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: int = 0,
                devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (0 = all visible)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), axis_names=("data",))


def create_multislice_mesh(num_slices: int, per_slice: int = 0,
                           devices: Optional[Sequence] = None) -> Mesh:
    """2-D ("dcn", "data") mesh for multi-slice pods: the outer axis maps
    across slices (DCN links), the inner axis within a slice (ICI links).

    Batches shard over BOTH axes (batch_sharding flattens the mesh), so
    the gradient all-reduce decomposes into an ICI reduce-scatter within
    each slice followed by a small DCN cross-slice reduce — XLA derives
    that hierarchy from the mesh axis order; no hand-written collectives.
    On real pods pass devices pre-ordered so the outer axis aligns with
    slice boundaries (jax.devices() already is); the 8-device virtual CPU
    mesh validates the sharding program in tests.
    """
    devs = list(devices if devices is not None else jax.devices())
    per_slice = per_slice or len(devs) // num_slices
    devs = devs[:num_slices * per_slice]
    grid = np.array(devs).reshape(num_slices, per_slice)
    return Mesh(grid, axis_names=("dcn", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis (data-parallel
    over the flattened device grid; for multi-slice meshes that nests
    slice-major over DCN, device-minor over ICI)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded.

    The global batch must divide evenly over the data axis; an uneven batch
    is an explicit error rather than silent padding (pad rows would leak
    into batch-norm statistics and the stop-loss balance weight even with
    zero sample weights — the loaders use drop_last instead, see
    train/loop.py).
    """
    n = int(np.prod(list(mesh.shape.values())))
    for leaf in jax.tree.leaves(batch):
        if leaf.shape[0] % n != 0:
            raise ValueError(
                f"global batch {leaf.shape[0]} not divisible by data-axis "
                f"size {n}; use a divisible batch size (loaders drop_last)")
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        # multi-host: every process passes the identically-seeded GLOBAL
        # batch; this host contributes its contiguous slice (jax.devices()
        # orders the mesh process-major, so contiguous rows land on local
        # devices) and the global array is assembled without any transfer
        # of other hosts' rows
        from .distributed import global_batch_slice

        def place(x):
            per, off = global_batch_slice(x.shape[0])
            return jax.make_array_from_process_local_data(
                sh, np.asarray(x[off:off + per]), x.shape)

        return jax.tree.map(place, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
