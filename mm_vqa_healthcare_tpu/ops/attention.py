"""Multi-head attention core with pluggable implementations.

The reference computes attention four ways (all torch eager):
  * text self-attention   (HF BertSelfAttention, reference bert_model.py:211-350)
  * image self-attention  (torch nn.MultiheadAttention, reference clip_model.py:41-63)
  * bidirectional cross-attention text<->image (BertCrossLayer, bert_model.py:445-503)
  * causal decoder self-attention (+ decode-time KV lookup, m3ae_decoder.py:38-90)

Here they are all served by ONE primitive: scaled-dot-product attention on
[B, H, S, D] operands with an additive bias.  On TPU it lowers to a fused
Pallas kernel (ops/flash_attention.py); elsewhere (CPU tests) to a plain XLA
einsum chain which the compiler fuses well.  Numerics: scores and softmax in
float32 regardless of input dtype (matches reference fp16-safe behavior).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

# Ablation knob: MMVQA_ATTN_PACKED=0 routes the packed entry points through
# the split-layout [B,H,S,D] pallas kernels (numerically identical; the
# packed path skips head-split relayouts but unrolls heads in-kernel).
_PACKED_ENABLED = os.environ.get("MMVQA_ATTN_PACKED", "1") == "1"

_NEG_INF = -1e30  # large-negative for masking; safe in float32 softmax


def _pallas_data_sharded(call, q, k, v, bias, seed, fold_seed: bool):
    """Run a pallas attention entry point under jax.shard_map over the
    mesh's data axis.

    Why: pallas_call lowers to an opaque custom call which GSPMD cannot
    partition — under a multi-device mesh it REPLICATES the inputs
    (all-gather + full-batch compute on every chip; measured: the kernel
    output comes back PartitionSpec() on an 8-device mesh).  shard_map is
    the manual-partitioning contract: each device runs the kernel on its
    local batch shard, matching the production dp layout.

    Falls back to the plain call when no multi-device mesh is active, the
    batch doesn't split evenly, or a periodic bias (batch dim 1 < bb < B,
    kernel block index i % bb — the swin shifted-window family) would lose
    phase alignment within a shard.

    fold_seed: give each data shard a distinct in-kernel dropout stream
    (the seed is otherwise replicated, which would correlate dropout masks
    across per-device sub-batches).
    """
    from mm_vqa_healthcare_tpu.parallel import activation as act
    from mm_vqa_healthcare_tpu.parallel.mesh import DATA_AXIS
    bb = None if bias is None else bias.shape[0]
    if not act.data_shardable(q.shape[0], bb):
        return call(q, k, v, bias, seed)
    mesh = act.activation_mesh()

    def batch_spec(x):
        from jax.sharding import PartitionSpec as P
        return P(*((DATA_AXIS,) + (None,) * (x.ndim - 1)))

    from jax.sharding import PartitionSpec as P
    if bias is None:
        bias_spec = None
    elif bias.shape[0] == q.shape[0]:
        bias_spec = batch_spec(bias)
    else:
        bias_spec = P(*((None,) * bias.ndim))

    def local(q, k, v, bias, seed):
        if fold_seed:
            seed = seed + jax.lax.axis_index(DATA_AXIS).astype(
                jnp.int32) * jnp.int32(1000003)
        return call(q, k, v, bias, seed)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(batch_spec(q), batch_spec(k), batch_spec(v),
                  bias_spec, P()),
        out_specs=batch_spec(q), check_vma=False)(q, k, v, bias, seed)


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   bias: Optional[jax.Array],
                   scale: Optional[float] = None) -> jax.Array:
    """Reference attention: [B,H,Sq,D] x [B,H,Sk,D] -> [B,H,Sq,D]."""
    depth = q.shape[-1]
    if scale is None:
        scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.lru_cache(maxsize=1)
def _default_impl() -> str:
    platform = jax.default_backend()
    return "pallas" if platform == "tpu" else "xla"


def _shortk_to_xla(sq: int, sk: int) -> bool:
    """Route long-query/short-key attention to XLA when the experiment
    env is set (see call sites)."""
    import os
    return (os.environ.get("MMVQA_ATTN_SHORTK_XLA") == "1"
            and sk <= 64 and sq >= 256)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          impl: str = "auto",
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None,
                          scale: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention over [B, H, S, D] operands.

    Args:
      q: [B, H, Sq, D] queries.
      k: [B, H, Sk, D] keys.
      v: [B, H, Sk, D] values.
      bias: optional additive bias broadcastable to [B, H, Sq, Sk]
        (e.g. the reference's extended attention mask (1-m)*-10000, or a
        causal mask).  Added to the float32 scores before softmax.
      impl: "auto" | "pallas" | "xla".
      dropout_rate/dropout_rng: HF-style dropout on the attention
        probabilities (training only) — in-kernel on the pallas path.
    """
    if impl == "auto":
        impl = _default_impl()
    if impl == "pallas" and _shortk_to_xla(q.shape[2], k.shape[2]):
        # A/B experiment (MMVQA_ATTN_SHORTK_XLA=1): long-query/short-key
        # cross attention (image queries over <=64 text keys) pads the
        # kernel's key axis to the 128-lane tile — 4x VPU work on the
        # score family for 32 real keys.  The XLA path materializes the
        # tiny [B,H,Sq,Sk] score tensor instead (~28 MB at the fusion
        # shapes — trivial HBM traffic at Sk=32).
        impl = "xla"
    if impl == "pallas":
        from mm_vqa_healthcare_tpu.ops.flash_attention import fused_attention
        if dropout_rate > 0.0:
            seed = jax.random.randint(dropout_rng, (), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        return _pallas_data_sharded(
            lambda q, k, v, b, s: fused_attention(
                q, k, v, b, dropout_rate=dropout_rate, dropout_seed=s,
                scale=scale),
            q, k, v, bias, seed, fold_seed=dropout_rate > 0.0)
    # XLA path: anchor the TP activation layout (batch on data, heads on
    # model) so the SPMD partitioner doesn't relayout around the
    # split-heads transposes (MULTICHIP_r02 "Involuntary full
    # rematerialization" on crossattention transpose/mul).  No-op without
    # an active multi-device mesh.
    from mm_vqa_healthcare_tpu.parallel import activation as act
    from mm_vqa_healthcare_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    bhsd = (DATA_AXIS, MODEL_AXIS, None, None)
    q = act.constrain(q, bhsd)
    k = act.constrain(k, bhsd)
    v = act.constrain(v, bhsd)
    out_probs_dropout = dropout_rate > 0.0
    depth = q.shape[-1]
    if not out_probs_dropout:
        return act.constrain(_xla_attention(q, k, v, bias, scale), bhsd)
    if scale is None:
        scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return act.constrain(out.astype(q.dtype), bhsd)


def dot_product_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                                 num_heads: int,
                                 bias: Optional[jax.Array] = None,
                                 impl: str = "auto",
                                 dropout_rate: float = 0.0,
                                 dropout_rng: Optional[jax.Array] = None,
                                 scale: Optional[float] = None) -> jax.Array:
    """Attention on PACKED [B, S, H*D] operands (the projection layout).

    On the pallas path this skips the [B,S,H,D]<->[B,H,S,D] relayouts
    entirely (the head axis is carved out of the lane dim in-kernel); the
    XLA path splits/merges heads and is numerically the same as
    dot_product_attention.
    """
    if impl == "auto":
        impl = _default_impl()
    if impl == "pallas" and _shortk_to_xla(q.shape[1], k.shape[1]):
        impl = "xla"                    # see dot_product_attention
    if impl == "pallas" and _PACKED_ENABLED:
        from mm_vqa_healthcare_tpu.ops.flash_attention import (
            fused_attention_packed)
        if dropout_rate > 0.0:
            seed = jax.random.randint(dropout_rng, (), 0, 2 ** 31 - 1,
                                      dtype=jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        return _pallas_data_sharded(
            lambda q, k, v, b, s: fused_attention_packed(
                q, k, v, num_heads, b, dropout_rate=dropout_rate,
                dropout_seed=s, scale=scale),
            q, k, v, bias, seed, fold_seed=dropout_rate > 0.0)
    # anchor the packed TP layout (lanes = heads on the model axis) before
    # the head-split relayouts — see dot_product_attention
    from mm_vqa_healthcare_tpu.parallel import activation as act
    from mm_vqa_healthcare_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    bsd = (DATA_AXIS, None, MODEL_AXIS)
    q = act.constrain(q, bsd)
    k = act.constrain(k, bsd)
    v = act.constrain(v, bsd)
    ctx = dot_product_attention(
        split_heads(q, num_heads), split_heads(k, num_heads),
        split_heads(v, num_heads), bias, impl=impl,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng, scale=scale)
    return act.constrain(merge_heads(ctx), bsd)


def attention_probs(q: jax.Array, k: jax.Array, num_heads: int,
                    bias: Optional[jax.Array] = None,
                    scale: Optional[float] = None) -> jax.Array:
    """Explicit float32 attention probabilities on PACKED [B, S, H*D] q/k.

    Returns [B, H, Sq, Sk] softmax(q·kᵀ/√D + bias) — the tensor the
    reference materializes eagerly in every layer (bert_model.py:300-316,
    `attention_probs = nn.Softmax(dim=-1)(attention_scores)`).  The fused
    pallas kernels stream the softmax and never materialize this, so it is
    recomputed here via plain XLA.  Introspection/visualization path ONLY
    (`output_attentions=True`, m3ae_module.py:210,267-283) — never on the
    training/serving hot path.
    """
    qh, kh = split_heads(q, num_heads), split_heads(k, num_heads)
    depth = qh.shape[-1]
    if scale is None:
        scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    return jax.nn.softmax(scores, axis=-1)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, S, D] -> [B, H, S, D/H] (reference transpose_for_scores)."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """[B, H, S, Dh] -> [B, S, H*Dh]."""
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def extended_attention_mask(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, Sk] 0/1 key-validity mask -> additive [B, 1, 1, Sk] bias.

    Matches HF get_extended_attention_mask semantics used throughout the
    reference (m3ae_module.py:232): (1 - mask) * -10000.0.
    """
    m = mask.astype(dtype)
    return ((1.0 - m) * -10000.0)[:, None, None, :]


def causal_bias(seq_len: int, dtype=jnp.float32) -> jax.Array:
    """[1, 1, S, S] additive causal mask (0 on/below diagonal, -inf above)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    mask = (j <= i).astype(dtype)
    return ((1.0 - mask) * _NEG_INF)[None, None, :, :]
