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
    mesh = Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    # publish as the activation mesh: attention shard_maps its pallas
    # kernels over the data axis and constrains TP activation layouts
    # against the CURRENT mesh (parallel/activation.py; no-op at size 1)
    from mm_vqa_healthcare_tpu.parallel.activation import set_activation_mesh
    set_activation_mesh(mesh)
    return mesh


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Device-put array leaves of a host batch with data-axis sharding.
    Non-array entries (strings, metadata) are dropped — they never belong
    on device.

    Multi-process (pod / multi-host DP, reference num_nodes>1 DDP,
    main.py:60-63): each host's loader yields only its PROCESS-LOCAL shard
    (process-strided, data/datamodule.py), so the global array is
    assembled from the local data — a plain device_put would misread the
    local batch as the full global array."""
    sharding = batch_sharding(mesh)
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype != object:
            if multiproc:
                out[k] = jax.make_array_from_process_local_data(sharding, v)
            else:
                out[k] = jax.device_put(v, sharding)
    return out


def put_committed(tree, shardings):
    """device_put a host-replicated tree onto committed (possibly
    multi-host) shardings.

    Single-process: plain device_put.  Multi-process (pod DP): device_put
    cannot build an array spanning non-addressable devices from local
    data, so each process contributes its addressable shards via
    make_array_from_callback — every process is assumed to hold the SAME
    full value (true for params/opt-state initialized from a shared
    seed, the reference's DDP model-replication invariant)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(put, tree, shardings)


def opt_state_shardings(opt_state, params, mesh: Mesh):
    """Per-leaf shardings for an optimizer state so that the state fed to
    the FIRST jitted train step carries the SAME committed shardings the
    step outputs — otherwise the carried state changes the jit cache key
    and the second training step retraces + recompiles (PERF.md batch19
    postmortem; ~160 s per retrace through the axon remote-compile
    tunnel).

    Moment/accumulator leaves (``mu``/``nu``/``acc`` sub-trees of
    LeafFusedAdamW, which mirror the param tree) follow their parameter's
    committed sharding (TP-correct); scalar counters replicate.  States
    with other structures (the optax fallback path) get a fully
    replicated tree — those paths only run under pure DP.
    """
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
    rep = replicated(mesh)
    if not isinstance(opt_state, dict):
        return jax.tree_util.tree_map(lambda _: rep, opt_state)
    fp = flatten(params)
    out = {}
    for path, leaf in flatten(opt_state).items():
        if path[0] in ("mu", "nu", "acc") and path[1:] in fp:
            out[path] = fp[path[1:]].sharding
        else:
            out[path] = rep
    return unflatten(out)
