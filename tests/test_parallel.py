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
