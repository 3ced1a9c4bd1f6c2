"""Shared low-level layers.

Numerics match the reference exactly where it matters for checkpoint parity:
  * LayerNorm is computed in float32 and cast back (reference
    clip_model.py:27-33 fp16-safe LayerNorm; BERT LN eps 1e-12 vs CLIP 1e-5).
  * QuickGELU is x * sigmoid(1.702 x) (reference clip_model.py:36-38).
  * gelu is the exact (erf) variant, matching torch.nn.GELU and HF "gelu".
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.ops.attention import (
    dot_product_attention, dot_product_attention_packed, merge_heads,
    split_heads)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


class LayerNorm(nn.Module):
    """LayerNorm computed in float32 (fp16/bf16-safe), scale+bias params.

    MMVQA_FAST_LN=1 (perf experiment) keeps the statistics in the input
    dtype instead — NOT parity-safe, off by default."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os
        orig_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        fast = os.environ.get("MMVQA_FAST_LN") == "1"
        if (not fast and os.environ.get("MMVQA_FUSED_LN", "0") == "1"
                and jax.default_backend() == "tpu"):
            from mm_vqa_healthcare_tpu.ops import fused_norm
            if fused_norm.supports(x.shape[-1]):
                # single-pass pallas LN (identical fp32-stat numerics).
                # DEFAULT OFF: the round-2 ablation measured it at -48
                # samples/s on the train lane (92.8 vs 141.3 all-off) —
                # the custom_vjp boundary blocks XLA fusion around all 36
                # sites and costs far more than the LN convert chain it
                # replaces (PERF.md round-2 ablation).
                return fused_norm.fused_layer_norm(x, scale, bias, self.eps)
        x32 = x if fast else x.astype(jnp.float32)
        if os.environ.get("MMVQA_LN_ONEPASS", "0") == "1":
            # One-pass statistics: E[x] and E[x^2] come out of a single
            # read of the (converted) activation.  MEASURED SLOWER on the
            # train lane (batch19: 170.6 vs 174.6 samples/s within-batch)
            # — XLA already fuses the two-pass chain into one activation
            # read per consumer, so this only reorders elementwise work.
            # Kept as an opt-in experiment record; ~1e-6 fp32 deviation
            # (cancellation), tests pass either way.
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            msq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
            var = msq - jnp.square(mean)
        else:
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(x32.dtype)
                + bias.astype(x32.dtype)).astype(orig_dtype)


class Dense(nn.Module):
    """nn.Dense with float32 params and configurable compute dtype."""
    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (packed in_proj layout).

    Used by the CLIP ViT blocks, the MIM decoder, and the generative decoder
    head — anywhere the reference uses nn.MultiheadAttention.  Parameters
    are stored as a packed [D, 3D] in_proj (split at apply time) so that the
    torch checkpoint's ``attn.in_proj_weight`` maps over 1:1.
    """
    num_heads: int
    attention_impl: str = "auto"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array, value: jax.Array,
                 bias: Optional[jax.Array] = None,
                 cache: Optional[dict] = None,
                 cache_index: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 kv_cache: Optional[dict] = None,
                 precompute_kv: bool = False):
        d = query.shape[-1]
        in_proj_w = self.param("in_proj_kernel", nn.initializers.normal(0.02),
                               (d, 3 * d), jnp.float32)
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros,
                               (3 * d,), jnp.float32)
        dtype = query.dtype
        if precompute_kv:
            # Static K/V precompute for incremental cross-attention: the
            # encoder memory never changes during decoding, so its K/V
            # projections run ONCE per batch instead of once per token
            # (reference re-projects every step via the full-prefix
            # re-forward, m3ae_decoder.py:149-181).
            _, wk, wv = jnp.split(in_proj_w.astype(dtype), 3, axis=1)
            _, bk, bv = jnp.split(in_proj_b.astype(dtype), 3)
            return {"k": split_heads(jnp.dot(key, wk) + bk, self.num_heads),
                    "v": split_heads(jnp.dot(value, wv) + bv,
                                     self.num_heads)}
        if kv_cache is not None:
            # cross-attention against precomputed K/V: q-only projection
            wq = jnp.split(in_proj_w.astype(dtype), 3, axis=1)[0]
            bq = jnp.split(in_proj_b.astype(dtype), 3)[0]
            q = split_heads(jnp.dot(query, wq) + bq, self.num_heads)
            ctx = dot_product_attention(q, kv_cache["k"], kv_cache["v"],
                                        bias, impl="xla")
            return Dense(d, name="out_proj")(merge_heads(ctx))
        if key is query and value is query:
            # self-attention: one packed [D,3D] matmul feeds the MXU better
            # than three D×D ones
            qkv = jnp.dot(query, in_proj_w.astype(dtype)) \
                + in_proj_b.astype(dtype)
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            wq, wk, wv = jnp.split(in_proj_w.astype(dtype), 3, axis=1)
            bq, bk, bv = jnp.split(in_proj_b.astype(dtype), 3)
            qp = jnp.dot(query, wq) + bq
            kp = jnp.dot(key, wk) + bk
            vp = jnp.dot(value, wv) + bv
        if cache is not None:
            q = split_heads(qp, self.num_heads)
            k = split_heads(kp, self.num_heads)
            v = split_heads(vp, self.num_heads)
            # Incremental decode: q is one position; k/v update a fixed-size
            # cache at cache_index and attend over positions <= cache_index.
            k = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, 0, cache_index, 0))
            v = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, 0, cache_index, 0))
            length = k.shape[2]
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, length), 3)
            step_bias = jnp.where(pos <= cache_index, 0.0, -1e30)
            ctx = dot_product_attention(q, k, v, step_bias, impl="xla")
            out = Dense(d, name="out_proj")(merge_heads(ctx))
            return out, {"k": k, "v": v}
        rate = 0.0 if deterministic else self.dropout_rate
        rng = self.make_rng("dropout") if rate > 0.0 else None
        # packed layout: no head-split relayouts around the kernel
        ctx = dot_product_attention_packed(
            qp, kp, vp, self.num_heads, bias, impl=self.attention_impl,
            dropout_rate=rate, dropout_rng=rng)
        return Dense(d, name="out_proj")(ctx)
