"""Activation-sharding context: the process-wide active mesh.

Model code (ops/attention.py, models/bert.py) is mesh-agnostic by design —
the same modules run single-device in unit tests and SPMD-sharded under the
trainer.  But two things genuinely need the mesh at trace time:

1. **Pallas kernels must partition, not replicate.**  A ``pl.pallas_call``
   lowers to an opaque custom call; GSPMD cannot see inside it, so under a
   multi-device mesh it falls back to *replicating* the inputs (all-gather)
   and running the full batch on every chip — measured on the virtual
   8-device CPU mesh: the kernel output comes back with spec
   ``PartitionSpec()``.  The TPU-native fix is ``jax.shard_map`` over the
   ``data`` axis around the kernel: each chip runs the kernel on its local
   batch shard, which is exactly the manual-partitioning contract Pallas
   expects (the reference has no analogue — its kernels live inside
   cuDNN/cuBLAS which NCCL-DDP never partitions, SURVEY.md §2.7).

2. **TP activation relayouts must be constrained.**  Under a ``model`` axis
   the q/k/v projections are column-sharded, and without explicit
   activation constraints the SPMD partitioner flip-flops between
   batch-sharded and head-sharded layouts around the attention transposes
   ("[SPMD] Involuntary full rematerialization" in MULTICHIP_r02.json) —
   replicate-then-repartition on every cross-attention.  ``constrain``
   anchors the layout: batch on ``data``, heads/lanes on ``model``.

The trainer publishes its mesh here (set_activation_mesh); everything else
reads it.  With no mesh, or a 1-device mesh, every helper is a no-op, so
unit tests and the single-chip bench path are unchanged.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mm_vqa_healthcare_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_ACTIVE_MESH: Optional[Mesh] = None


def set_activation_mesh(mesh: Optional[Mesh]) -> None:
    """Publish the mesh activations should be laid out over (or None)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def activation_mesh() -> Optional[Mesh]:
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return None
    return mesh


def axis_size(name: str) -> int:
    mesh = activation_mesh()
    if mesh is None:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(name, 1)


def constrain(x: jax.Array, spec: Tuple[Optional[str], ...]) -> jax.Array:
    """with_sharding_constraint against the active mesh, with per-dim
    divisibility guards (a dim that doesn't divide its axis size falls back
    to unconstrained instead of erroring — e.g. tiny-debug head counts or
    the model axis at size 1)."""
    mesh = activation_mesh()
    if mesh is None:
        return x
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    entries = []
    nontrivial = False
    for dim, axis in enumerate(spec):
        if (axis is not None and sizes.get(axis, 1) > 1
                and x.shape[dim] % sizes[axis] == 0):
            entries.append(axis)
            nontrivial = True
        else:
            entries.append(None)
    if not nontrivial:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*entries)))


def data_shardable(batch_dim: int, bias_batch_dim: Optional[int]) -> bool:
    """True when a [B, ...] attention operand family can be shard_mapped
    over the data axis: B splits evenly, and a periodic bias (batch dim
    1 < bb < B, indexed i % bb by the kernel's block spec) keeps its phase
    within every shard (local batch a multiple of bb)."""
    mesh = activation_mesh()
    if mesh is None:
        return False
    data = axis_size(DATA_AXIS)
    if data <= 1 or batch_dim % data != 0:
        return False
    local = batch_dim // data
    if bias_batch_dim is not None and bias_batch_dim != 1:
        if bias_batch_dim == batch_dim:
            return True  # sharded along with the operands
        if local % bias_batch_dim != 0:
            return False
    return True
