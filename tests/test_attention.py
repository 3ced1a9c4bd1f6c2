"""Attention kernel tests: the Pallas fused kernel (interpreter mode on CPU)
must match the XLA reference implementation in forward and backward, with
masks, cross-attention shapes, and padding-to-tile edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.ops.attention import (
    _xla_attention, causal_bias, dot_product_attention,
    extended_attention_mask)
from mm_vqa_healthcare_tpu.ops.flash_attention import fused_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("sq,sk", [(8, 8), (16, 48), (33, 129), (5, 577)])
def test_fused_matches_xla_forward(sq, sk):
    b, h, d = 2, 3, 64
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, h, sk, d), 1), _rand((b, h, sk, d), 2)
    mask = (jax.random.uniform(jax.random.key(3), (b, sk)) > 0.3).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)  # at least one valid key
    bias = extended_attention_mask(mask)
    ref = _xla_attention(q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_matches_xla_no_bias():
    q, k, v = _rand((1, 2, 40, 32), 0), _rand((1, 2, 40, 32), 1), _rand((1, 2, 40, 32), 2)
    ref = _xla_attention(q, k, v, None)
    out = fused_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_causal():
    s = 24
    q, k, v = _rand((1, 2, s, 32), 0), _rand((1, 2, s, 32), 1), _rand((1, 2, s, 32), 2)
    bias = causal_bias(s)
    ref = _xla_attention(q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_backward_matches_xla():
    b, h, sq, sk, d = 2, 2, 17, 33, 32
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, h, sk, d), 1), _rand((b, h, sk, d), 2)
    mask = (jax.random.uniform(jax.random.key(5), (b, sk)) > 0.2).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    bias = extended_attention_mask(mask)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, bias)))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fused_attention(q, k, v, bias, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_dispatch_auto_off_tpu_uses_xla():
    q = _rand((1, 1, 4, 8), 0)
    out = dot_product_attention(q, q, q, impl="auto")
    ref = _xla_attention(q, q, q, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_bf16_inputs():
    q, k, v = (_rand((1, 2, 16, 32), i).astype(jnp.bfloat16) for i in range(3))
    out = fused_attention(q, k, v, None, interpret=True)
    ref = _xla_attention(q, k, v, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
