"""Parallelism tests: partition-spec rules and dp-vs-tp exactness on the
virtual CPU mesh."""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mm_vqa_healthcare_tpu.parallel.partition import leaf_spec


class _K:
    def __init__(self, key):
        self.key = key


def _spec(*parts):
    return leaf_spec(tuple(_K(p) for p in parts))


@pytest.mark.fast
def test_partition_rules():
    # column-parallel: attention q/k/v, MLP up, packed in_proj
    assert _spec("attention", "self", "query", "kernel") == P(None, "model")
    assert _spec("intermediate", "dense", "kernel") == P(None, "model")
    assert _spec("attn", "in_proj_kernel") == P(None, "model")
    assert _spec("c_fc", "kernel") == P(None, "model")
    assert _spec("ff", "wi", "kernel") == P(None, "model")
    # row-parallel: attention out, MLP down
    assert _spec("attention", "output", "dense", "kernel") == P("model", None)
    assert _spec("attn", "out_proj", "kernel") == P("model", None)
    assert _spec("c_proj", "kernel") == P("model", None)
    assert _spec("ff", "wo", "kernel") == P("model", None)
    # replicated: embeddings, LN
    assert _spec("word_embeddings", "embedding") == P()
    assert _spec("LayerNorm", "scale") == P()
    assert _spec("ln_1", "bias") == P()
    # biases follow their kernels
    assert _spec("attention", "self", "query", "bias") == P("model")
    assert _spec("attention", "output", "dense", "bias") == P()


def test_dp_vs_tp_exactness():
    """A dp2 and a dp2xtp2 train step on the same global batch produce the
    same loss (tensor parallelism is a pure layout change)."""
    import __graft_entry__ as g
    loss_dp = g._dryrun_one({"data": 2, "model": 1}, "test-dp2")
    loss_tp = g._dryrun_one({"data": 2, "model": 2}, "test-dp2xtp2")
    assert abs(loss_dp - loss_tp) < 1e-3


@pytest.mark.fast
def test_fsdp_spec_rules():
    """FSDP adds a data-axis storage shard on the largest free,
    evenly-divisible dim; small leaves and indivisible shapes replicate;
    TP-taken dims are skipped."""
    from mm_vqa_healthcare_tpu.parallel.partition import _with_fsdp

    # plain 2-D kernel: shard the larger (output) dim
    assert _with_fsdp(P(), (768, 3072), 8, 0) == P(None, "data")
    # TP column kernel: model owns dim 1 -> data takes dim 0
    assert _with_fsdp(P(None, "model"), (768, 3072), 8, 0) == \
        P("data", "model")
    # indivisible everywhere -> unchanged
    assert _with_fsdp(P(), (577, 11), 8, 0) == P()
    # below the min-size threshold -> unchanged
    assert _with_fsdp(P(), (768,), 8, 2 ** 14) == P()
    # 3-D pos-embed [1, 577, 768]: only the last dim divides
    assert _with_fsdp(P(), (1, 577, 768), 8, 0) == P(None, None, "data")


@pytest.mark.fast
def test_fsdp_params_actually_sharded():
    """shard_params(fsdp=True) must produce leaves whose addressable shard
    is 1/data_size of the full array (ZeRO-3 storage)."""
    import jax
    import jax.numpy as jnp
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
    from mm_vqa_healthcare_tpu.parallel.partition import shard_params

    mesh = mesh_lib.make_mesh({"data": 8})
    params = {"w": jnp.zeros((16, 128)), "tiny": jnp.zeros((4,))}
    out = shard_params(mesh, params, fsdp=True, fsdp_min_elems=0)
    shard = out["w"].addressable_shards[0].data
    assert shard.shape == (16, 16), shard.shape
    assert out["tiny"].addressable_shards[0].data.shape == (4,)


def test_dp_vs_fsdp_exactness():
    """FSDP is a pure storage-layout change: a dp2 and a dp2+fsdp train
    step on the same global batch produce the same loss."""
    import __graft_entry__ as g
    loss_dp = g._dryrun_one({"data": 2, "model": 1}, "test-dp2")
    loss_fsdp = g._dryrun_one({"data": 2, "model": 1}, "test-dp2-fsdp",
                              fsdp=True)
    assert abs(loss_dp - loss_fsdp) < 1e-3
