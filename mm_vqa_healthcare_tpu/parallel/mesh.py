"""Device mesh and sharding helpers (SPMD over ICI).

The reference's only parallelism is DDP data-parallel (PL
distributed_backend="ddp" + NCCL all-reduce, SURVEY.md §2.7).  The
TPU-native equivalent: a jax.sharding.Mesh whose ``data`` axis spans all
chips; batches are sharded on their leading axis, params/optimizer state
are replicated, and XLA inserts the gradient psum over ICI automatically
from the sharding annotations (no hand-written collectives).

A ``model`` axis is provisioned for tensor-parallel scaling beyond the
reference's reach; with model=1 it is inert.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not mesh_shape:
        mesh_shape = {DATA_AXIS: n, MODEL_AXIS: 1}
    if MODEL_AXIS not in mesh_shape:
        mesh_shape = {**mesh_shape, MODEL_AXIS: 1}
    if DATA_AXIS not in mesh_shape:
        mesh_shape = {**mesh_shape,
                      DATA_AXIS: n // int(np.prod(list(mesh_shape.values())))}
    total = mesh_shape[DATA_AXIS] * mesh_shape[MODEL_AXIS]
    assert total <= n, f"mesh {mesh_shape} needs {total} devices, have {n}"
    dev_array = np.asarray(devices[:total]).reshape(
        mesh_shape[DATA_AXIS], mesh_shape[MODEL_AXIS])
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put array leaves of a host batch with data-axis sharding.
    Non-array entries (strings, metadata) are dropped — they never belong
    on device."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            out[k] = jax.device_put(v, sharding)
    return out
