"""Pallas attention under GSPMD sharding (the production multi-chip path).

Background: pl.pallas_call lowers to an opaque custom call that GSPMD
cannot partition — without help it REPLICATES the inputs and runs the full
batch on every device (its output comes back PartitionSpec()).  The fix
(ops/attention.py:_pallas_data_sharded) wraps the kernels in jax.shard_map
over the data axis.  These tests pin that behavior on the virtual 8-device
CPU mesh: outputs stay batch-sharded, numerics match the XLA path, grads
flow, periodic biases gate correctly, and the TP activation constraints
(parallel/activation.py:constrain) hold their specs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mm_vqa_healthcare_tpu.ops.attention import (
    dot_product_attention, dot_product_attention_packed,
    extended_attention_mask)
from mm_vqa_healthcare_tpu.parallel import activation as act
from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.fast


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = mesh_lib.make_mesh({"data": 8})
    yield mesh
    act.set_activation_mesh(None)


def _qkv(b=16, s=32, h=4, d=16, packed=True):
    rng = np.random.default_rng(0)
    shape = (b, s, h * d) if packed else (b, h, s, d)
    return [jnp.asarray(rng.normal(size=shape), jnp.float32)
            for _ in range(3)]


def _put(mesh, x):
    spec = P("data") if x.ndim else P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def test_packed_pallas_partitions_over_data(mesh8):
    h = 4
    q, k, v = _qkv()
    mask = np.ones((16, 32), np.int32)
    mask[:, 20:] = 0
    bias = extended_attention_mask(jnp.asarray(mask))
    qd, kd, vd = (_put(mesh8, x) for x in (q, k, v))
    bd = jax.device_put(bias, NamedSharding(mesh8, P("data")))

    out_pl = jax.jit(lambda q, k, v, b: dot_product_attention_packed(
        q, k, v, h, b, impl="pallas"))(qd, kd, vd, bd)
    out_x = jax.jit(lambda q, k, v, b: dot_product_attention_packed(
        q, k, v, h, b, impl="xla"))(qd, kd, vd, bd)
    # the kernel output must stay batch-sharded — a PartitionSpec() here
    # means GSPMD replicated the custom call (the pre-fix failure mode)
    assert out_pl.sharding.spec == P("data"), out_pl.sharding
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_x),
                               atol=2e-5)


def test_split_pallas_partitions_over_data(mesh8):
    q, k, v = _qkv(packed=False)
    qd, kd, vd = (_put(mesh8, x) for x in (q, k, v))
    out_pl = jax.jit(lambda q, k, v: dot_product_attention(
        q, k, v, impl="pallas"))(qd, kd, vd)
    out_x = jax.jit(lambda q, k, v: dot_product_attention(
        q, k, v, impl="xla"))(qd, kd, vd)
    assert out_pl.sharding.spec == P("data"), out_pl.sharding
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_x),
                               atol=2e-5)


def test_sharded_pallas_grad_matches_xla(mesh8):
    h = 4
    q, k, v = _qkv()
    qd, kd, vd = (_put(mesh8, x) for x in (q, k, v))

    def loss(impl):
        return lambda q: jnp.sum(
            dot_product_attention_packed(q, kd, vd, h, impl=impl) ** 2)

    g_pl = jax.jit(jax.grad(loss("pallas")))(qd)
    g_x = jax.jit(jax.grad(loss("xla")))(qd)
    assert g_pl.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_x),
                               atol=5e-5)


def test_periodic_bias_stays_phase_aligned(mesh8):
    # swin-style periodic bias: bb=2 windows, local batch 16/8=2 — aligned
    h, b, s = 4, 16, 32
    q, k, v = _qkv(b=b, s=s, h=h)
    rng = np.random.default_rng(3)
    bias = jnp.asarray(rng.normal(size=(2, h, s, s)), jnp.float32)
    qd, kd, vd = (_put(mesh8, x) for x in (q, k, v))
    out_pl = jax.jit(lambda q, k, v: dot_product_attention_packed(
        q, k, v, h, bias, impl="pallas"))(qd, kd, vd)
    # periodic bias (kernel block-index i % bb) is a pallas-only
    # convention — tile it to full batch for the XLA reference
    bias_full = jnp.tile(bias, (b // 2, 1, 1, 1))
    out_x = jax.jit(lambda q, k, v: dot_product_attention_packed(
        q, k, v, h, bias_full, impl="xla"))(qd, kd, vd)
    assert out_pl.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_x),
                               atol=2e-5)


def test_misaligned_periodic_bias_falls_back():
    # bb=3 does not divide local batch 2 (b=16 over 8 devices): the
    # shard_map gate must refuse (data_shardable False) — the plain call
    # still computes correctly, just unpartitioned
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh_lib.make_mesh({"data": 8})
    try:
        assert not act.data_shardable(16, 3)
        assert act.data_shardable(16, 2)
        assert act.data_shardable(16, 1)
        assert act.data_shardable(16, 16)
        assert act.data_shardable(16, None)
        assert not act.data_shardable(12, None)  # 12 % 8 != 0
    finally:
        act.set_activation_mesh(None)


def test_dropout_seed_folds_axis_index(mesh8):
    # in-kernel dropout seeds fold in axis_index('data') so per-device
    # sub-batches don't reuse mask streams.  The CPU TPU-interpreter PRNG
    # is a degenerate stub (see test_attention.py dropout tests), so we
    # observe the folded seed directly via a stub kernel call.
    from mm_vqa_healthcare_tpu.ops.attention import _pallas_data_sharded
    b, s, hd = 16, 8, 32
    q = jnp.zeros((b, s, hd), jnp.float32)
    qd = _put(mesh8, q)

    def stub(q, k, v, bias, seed):
        return q + seed.astype(jnp.float32)

    out = jax.jit(lambda q: _pallas_data_sharded(
        stub, q, q, q, None, jnp.zeros((), jnp.int32), fold_seed=True))(qd)
    out = np.asarray(out)
    per_shard = out[::2, 0, 0]  # one row per shard (local batch = 2)
    assert len(set(per_shard.tolist())) == 8, per_shard
    # without folding, every shard sees the replicated seed unchanged
    out0 = jax.jit(lambda q: _pallas_data_sharded(
        stub, q, q, q, None, jnp.zeros((), jnp.int32), fold_seed=False))(qd)
    assert len(set(np.asarray(out0)[::2, 0, 0].tolist())) == 1


def test_constrain_guards():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = mesh_lib.make_mesh({"data": 4, "model": 2})
    try:
        x = jnp.zeros((8, 6, 10))

        @jax.jit
        def f(x):
            # model axis (2) does not divide dim 10? it does; dim 6 not by
            # 4 -> data entry dropped, model kept
            return act.constrain(x, (None, "data", "model"))

        y = f(x)
        assert y.shape == x.shape
        # non-divisible everywhere -> no-op (must not raise)
        z = jax.jit(lambda x: act.constrain(x, ("data", None, None)))(
            jnp.zeros((7, 3, 5)))
        assert z.shape == (7, 3, 5)
    finally:
        act.set_activation_mesh(None)
