"""Parameter partition specs: tensor parallel (`model` axis) + FSDP
(ZeRO-3-style storage sharding over the `data` axis).

The reference scales only by data parallelism (SURVEY.md §2.7); this module
adds Megatron-style tensor parallelism and ZeRO-3 parameter/optimizer-state
sharding the GSPMD way: annotate parameter shardings, shard the batch on
`data`, and let XLA insert the all-reduces / all-gathers / reduce-scatters
over ICI.  With model=1 and fsdp off every spec collapses to replication,
so the data-parallel path is unchanged.

Layout rules (column-then-row per block, so each transformer block needs
one all-reduce per attention + one per MLP):
  * attention q/k/v kernels, packed in_proj, MLP up-projections
    (intermediate/c_fc/wi/fc1, vqa fc1):  shard the OUTPUT dim  P(None, model)
    (their biases shard on `model` too)
  * attention out_proj and MLP down-projections (attention-output dense,
    c_proj, wo, fc2): shard the INPUT dim  P(model, None)
  * embeddings, LayerNorms, poolers, heads' final projections: replicated.

Head-count constraint: `model` must divide num_heads (checked by callers).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mm_vqa_healthcare_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# parent-module names whose kernels shard the output (column) dim
_COL_PARENTS = {"query", "key", "value", "c_fc", "wi", "fc1", "qkv", "ffn1",
                "q", "k", "v"}
# parent-module names whose kernels shard the input (row) dim
_ROW_PARENTS = {"out_proj", "c_proj", "wo", "fc2", "o", "ffn2"}


def leaf_spec(path: Tuple) -> P:
    parts = [getattr(p, "key", str(p)) for p in path]
    leaf = parts[-1]
    parent = parts[-2] if len(parts) > 1 else ""
    grandparent = parts[-3] if len(parts) > 2 else ""
    # "intermediate/dense" is a column layer; "output/dense" a row layer
    if parent == "dense":
        parent = grandparent
    if leaf == "kernel":
        if parent in _COL_PARENTS or parent == "intermediate":
            return P(None, MODEL_AXIS)
        if parent in _ROW_PARENTS or parent == "output":
            return P(MODEL_AXIS, None)
        return P()
    if leaf == "in_proj_kernel":
        return P(None, MODEL_AXIS)
    if leaf == "in_proj_bias":
        return P(MODEL_AXIS)
    if leaf == "bias" and (parent in _COL_PARENTS or parent == "intermediate"):
        return P(MODEL_AXIS)
    return P()


# Leaves smaller than this stay replicated under FSDP (LN scales, biases —
# gathering them costs more latency than their storage saves).
_FSDP_MIN_ELEMS = 2 ** 14


def _with_fsdp(spec: P, shape, data_size: int,
               min_elems: int = _FSDP_MIN_ELEMS) -> P:
    """Add ZeRO-style storage sharding over the DATA axis to a (possibly
    TP-sharded) param spec: pick the largest dim not already taken by the
    model axis that divides evenly, preferring later (usually larger and
    lane-contiguous) dims on ties.  Leaves with no evenly-divisible free
    dim, and small leaves, stay replicated."""
    if int(np.prod(shape)) < min_elems:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for dim, (axis, size) in enumerate(zip(entries, shape)):
        if axis is None and size % data_size == 0 and size >= best_size:
            best, best_size = dim, size
    if best is None:
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def params_shardings(mesh: Mesh, params, fsdp: bool = False,
                     fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """Pytree of NamedSharding matching `params`.

    TP specs ride the model axis (pure replication when model=1).  With
    ``fsdp=True``, parameter STORAGE is additionally sharded over the data
    axis (the reference has no equivalent — PL DDP replicates the model,
    main.py:59-63; this is the TPU-native ZeRO-3: GSPMD all-gathers params
    on use and reduce-scatters their grads, so optimizer state and
    master params scale with 1/data_size chips)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_size = axis_sizes[MODEL_AXIS]
    data_size = axis_sizes[DATA_AXIS]

    def to_sharding(path, leaf):
        spec = leaf_spec(path) if model_size > 1 else P()
        # dims must divide evenly; fall back to replication when they don't
        if model_size > 1 and spec != P():
            for dim, axis in enumerate(spec):
                if axis is not None and leaf.shape[dim] % model_size != 0:
                    spec = P()
                    break
        if fsdp and data_size > 1:
            spec = _with_fsdp(spec, leaf.shape, data_size, fsdp_min_elems)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh: Mesh, params, fsdp: bool = False,
                 fsdp_min_elems: int = _FSDP_MIN_ELEMS):
    """device_put the tree with its TP(+FSDP) shardings (committed arrays —
    jit then propagates shardings without explicit in_shardings)."""
    from mm_vqa_healthcare_tpu.parallel.mesh import put_committed
    return put_committed(params, params_shardings(
        mesh, params, fsdp=fsdp, fsdp_min_elems=fsdp_min_elems))
