"""Fused Pallas LayerNorm: numerics vs the XLA reference path.

The kernel must be bit-compatible-in-spirit with models/layers.LayerNorm
(fp32 statistics, parameter upcast, output downcast) — it is swapped in
transparently on TPU, so fwd AND bwd must match the XLA lowering tightly,
including on row counts that don't divide the block size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.ops.fused_norm import fused_layer_norm, supports


def _xla_ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("shape,dtype", [
    ((4, 37, 256), jnp.float32),       # tail rows (148 % 512)
    ((2, 577, 768), jnp.bfloat16),     # production shape
    ((9, 128), jnp.float32),           # 2-D input
])
def test_fused_ln_forward_matches_xla(shape, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 3 + 1).astype(dtype)
    scale = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    bias = jnp.asarray(rng.normal(size=shape[-1]), jnp.float32)
    out = fused_layer_norm(x, scale, bias, interpret=True)
    ref = _xla_ln(x, scale, bias)
    assert out.dtype == x.dtype
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_fused_ln_grads_match_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 41, 256)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=256), jnp.float32)
    bias = jnp.asarray(rng.normal(size=256), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 41, 256)), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, interpret=True) * w)

    def loss_xla(x, s, b):
        return jnp.sum(_xla_ln(x, s, b) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g_fused, g_xla, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, err_msg=name)


def test_supports_lane_alignment():
    assert supports(768) and supports(128) and supports(1536)
    assert not supports(100)


def test_fused_ln_bf16_grads_finite():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 600, 128)), jnp.bfloat16)
    scale = jnp.ones(128, jnp.float32)
    bias = jnp.zeros(128, jnp.float32)

    def loss(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, interpret=True)
                       .astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, scale, bias)
    for a in g:
        assert np.isfinite(np.asarray(a, np.float32)).all()


def test_fused_ln_grads_multiblock_production_shape():
    """16x577 rows = 19 row-blocks: exercises the sublane-padded partial
    dscale/dbias outputs (regression: (1, d) partial blocks violated the
    Mosaic 8-sublane rule and crashed only at TPU lowering)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16, 577, 768)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=768), jnp.float32)
    bias = jnp.asarray(rng.normal(size=768), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 577, 768)), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(fused_layer_norm(x, s, b, interpret=True) * w)

    def loss_xla(x, s, b):
        return jnp.sum(_xla_ln(x, s, b) * w)

    g_fused = jax.grad(loss_fused, argnums=(1, 2))(x, scale, bias)
    g_xla = jax.grad(loss_xla, argnums=(1, 2))(x, scale, bias)
    for a, b_, name in zip(g_fused, g_xla, ("dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=5e-3, err_msg=name)


def test_mosaic_block_checker():
    from mm_vqa_healthcare_tpu.ops.pallas_checks import check_block
    check_block((8, 768), (152, 768), "ok")
    check_block((1, 768), (1, 768), "full-dim ok")
    check_block((512, 768), (9232, 768), "ok")
    with pytest.raises(ValueError):
        check_block((1, 768), (19, 768), "sublane violation")
    with pytest.raises(ValueError):
        check_block((1, 592, 64), (16, 577, 768), "lane violation")
