"""T5 encoder-decoder (t5-small) in flax — the generative head backbone
(reference wraps HF T5ForConditionalGeneration,
m3ae_t5_mm_encoder_input.py:27).

Exact T5 semantics for checkpoint/logit parity with HF:
  * RMS LayerNorm (no mean subtraction, no bias), computed in float32,
  * NO 1/sqrt(d_k) attention scaling (folded into initialization by T5),
  * shared relative-position bias from layer 0 of each stack,
  * ReLU feed-forward (t5-small is the original architecture),
  * tied embeddings: decoder output scaled by d_model**-0.5 before the
    shared-embedding lm_head.

Decode-time API: `encode`, `decode` (teacher-forced), and `decode_step`
with a KV cache (self-attn cache updated per step; cross-attn K/V
precomputed once from the encoder output) for beam/greedy search.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.ops.attention import merge_heads, split_heads


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    num_heads: int = 8
    d_ff: int = 2048
    num_layers: int = 6
    num_decoder_layers: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0
    # full-sequence attention implementation ("auto" -> fused pallas kernel
    # on TPU with scale=1.0 for T5's no-sqrt(d) convention; incremental
    # decode keeps the einsum path)
    attention_impl: str = "auto"


T5_PRESETS = {
    "t5-small": T5Config(),
    "t5-base": T5Config(d_model=768, num_heads=12, d_ff=3072, num_layers=12,
                        num_decoder_layers=12),
    # Debug-scale (tests / dry-runs)
    "t5-tiny": T5Config(vocab_size=120, d_model=32, d_kv=8, num_heads=4,
                        d_ff=64, num_layers=2, num_decoder_layers=2),
}


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                       jnp.float32)
        return (y * w).astype(orig)


def _dense(features, name):
    return nn.Dense(features, use_bias=False, name=name,
                    kernel_init=nn.initializers.normal(0.05),
                    param_dtype=jnp.float32)


def relative_position_bucket(relative_position, bidirectional: bool,
                             num_buckets: int, max_distance: int):
    """HF T5 bucket function (exact)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    bidirectional: bool = True

    def setup(self):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        self.q = _dense(inner, None)   # attribute names q/k/v/o name params
        self.k = _dense(inner, None)
        self.v = _dense(inner, None)
        self.o = _dense(cfg.d_model, None)
        self.attn_drop = nn.Dropout(cfg.dropout_rate)
        if self.has_relative_bias:
            self.relative_attention_bias = nn.Embed(
                cfg.relative_attention_num_buckets, cfg.num_heads,
                embedding_init=nn.initializers.normal(0.05),
                param_dtype=jnp.float32)

    def compute_bias(self, q_len: int, k_len: int,
                     q_offset=0) -> jax.Array:
        """[1, H, q_len, k_len] position bias."""
        cfg = self.cfg
        ctx = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0) + q_offset
        mem = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
        rel = mem - ctx
        buckets = relative_position_bucket(
            rel, self.bidirectional, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias = self.relative_attention_bias(buckets)      # [q, k, H]
        return bias.transpose(2, 0, 1)[None]

    def __call__(self, hidden, kv=None, mask_bias=None, position_bias=None,
                 deterministic=True, cache=None, cache_index=None):
        cfg = self.cfg
        kv_src = kv if kv is not None else hidden
        q = split_heads(self.q(hidden), cfg.num_heads)
        if cache is not None and kv is not None:
            # cross-attention with precomputed K/V
            k, v = cache["k"], cache["v"]
            if k.shape[0] != q.shape[0]:
                # Beam-grouped cross-attention: K/V stay at the encoder
                # batch kb; the g = nb/kb beam replicas (identical K/V —
                # they attend to the same encoder memory) fold into the
                # query-length axis.  Exact vs materializing K-repeated
                # K/V: per-element dots and softmax are unchanged, only
                # the batching layout differs.  Cuts cross-K/V HBM
                # residency and per-step reads by K (PERF.md batch17).
                nb, kb = q.shape[0], k.shape[0]
                g = nb // kb
                if q.shape[2] != 1:
                    raise ValueError("grouped cross-attn expects q_len==1")
                qg = q[:, :, 0, :].reshape(kb, g, cfg.num_heads, cfg.d_kv)
                qg = qg.transpose(0, 2, 1, 3)            # [kb, H, g, D]
                scores = jnp.einsum("bhqd,bhkd->bhqk", qg, k,
                                    preferred_element_type=jnp.float32)
                if mask_bias is not None:                # [kb,1,1,L]
                    scores = scores + mask_bias.astype(jnp.float32)
                probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
                probs = self.attn_drop(probs, deterministic=deterministic)
                ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
                ctx = ctx.transpose(0, 2, 1, 3).reshape(
                    nb, cfg.num_heads, 1, cfg.d_kv)
                return self.o(merge_heads(ctx)), cache
        else:
            k = split_heads(self.k(kv_src), cfg.num_heads)
            v = split_heads(self.v(kv_src), cfg.num_heads)
            if cache is not None:
                k = jax.lax.dynamic_update_slice(cache["k"], k,
                                                 (0, 0, cache_index, 0))
                v = jax.lax.dynamic_update_slice(cache["v"], v,
                                                 (0, 0, cache_index, 0))
                cache = {"k": k, "v": v}
        if cache is None:
            # Full-sequence attention (encoder self over the 512-token soft
            # prompt, teacher-forced decoder self, AND teacher-forced
            # cross q 12 x k 512): the fused kernel with scale=1.0 (T5's
            # no-sqrt(d) convention) streams the softmax instead of
            # materializing [B,H,Sq,Sk] fp32 scores — the 512² encoder
            # scores were 29% of the t5_train step (PERF.md batch36
            # profile).  Biases combine into one additive operand; the
            # production mm-head mask is all-ones (reference
            # m3ae_t5_mm_encoder_input.py:100-190) and rides as None, so
            # the encoder streams only the shared [1,H,S,S] rel-pos table
            # and the cross-attention streams no bias at all.  The round-3
            # short-query SIGABRT (jellyfish 'limits[i] <= dim(i)', batch37
            # probe) was the zero-bias block spec, not the shape — fixed by
            # bias-free kernels + the _norm_bias q-axis guard (round-4
            # probe run_scripts/probe_shortq.py: all shapes compile).
            from mm_vqa_healthcare_tpu.ops.attention import (
                dot_product_attention)
            if position_bias is not None and mask_bias is not None:
                bias = (position_bias.astype(jnp.float32)
                        + mask_bias.astype(jnp.float32))
            elif position_bias is not None:
                bias = position_bias
            else:
                bias = mask_bias
            rate = 0.0 if deterministic else cfg.dropout_rate
            rng = self.make_rng("dropout") if rate > 0.0 else None
            ctx = dot_product_attention(
                q, k, v, bias, impl=cfg.attention_impl, scale=1.0,
                dropout_rate=rate, dropout_rng=rng)
            return self.o(merge_heads(ctx))
        # einsum path: incremental decode only (q_len == 1 — a kernel
        # launch per token would lose to dispatch).  T5: NO sqrt(d)
        # scaling.
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if position_bias is not None:
            scores = scores + position_bias.astype(jnp.float32)
        if mask_bias is not None:
            scores = scores + mask_bias.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        probs = self.attn_drop(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = self.o(merge_heads(ctx))
        if cache is not None:
            return out, cache
        return out


class T5FF(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_epsilon, name="layer_norm")(x)
        h = _dense(cfg.d_ff, "wi")(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        h = _dense(cfg.d_model, "wo")(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return x + h


class T5Block(nn.Module):
    cfg: T5Config
    is_decoder: bool = False
    has_relative_bias: bool = False

    def setup(self):
        cfg = self.cfg
        self.self_ln = T5LayerNorm(cfg.layer_norm_epsilon)
        self.self_attn = T5Attention(cfg, self.has_relative_bias,
                                     bidirectional=not self.is_decoder)
        if self.is_decoder:
            self.cross_ln = T5LayerNorm(cfg.layer_norm_epsilon)
            self.cross_attn = T5Attention(cfg, False, bidirectional=True)
        self.ff = T5FF(cfg)
        self.drop = nn.Dropout(cfg.dropout_rate)

    def __call__(self, x, mask_bias=None, position_bias=None,
                 enc_out=None, enc_mask_bias=None, deterministic=True,
                 cache=None, cache_index=None):
        h = self.self_ln(x)
        if cache is not None:
            attn, self_cache = self.self_attn(
                h, None, mask_bias, position_bias, deterministic,
                cache=cache["self"], cache_index=cache_index)
            cache = dict(cache, self=self_cache)
        else:
            attn = self.self_attn(h, None, mask_bias, position_bias,
                                  deterministic)
        x = x + self.drop(attn, deterministic=deterministic)
        if self.is_decoder:
            h = self.cross_ln(x)
            if cache is not None:
                attn, _ = self.cross_attn(
                    h, enc_out, enc_mask_bias, None, deterministic,
                    cache=cache["cross"], cache_index=None)
            else:
                attn = self.cross_attn(h, enc_out, enc_mask_bias, None,
                                       deterministic)
            x = x + self.drop(attn, deterministic=deterministic)
        x = self.ff(x, deterministic)
        if cache is not None:
            return x, cache
        return x


def _mask_bias(mask: Optional[jax.Array]) -> Optional[jax.Array]:
    if mask is None:
        return None
    return ((1.0 - mask.astype(jnp.float32)) * -1e9)[:, None, None, :]


def _causal_mask_bias(t: int) -> jax.Array:
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(j <= i, 0.0, -1e9)[None, None]


class T5(nn.Module):
    """T5ForConditionalGeneration equivalent."""
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model,
                               embedding_init=nn.initializers.normal(1.0),
                               param_dtype=jnp.float32)
        self.encoder_blocks = [
            T5Block(cfg, is_decoder=False, has_relative_bias=(i == 0),
                    name=f"encoder_block_{i}")
            for i in range(cfg.num_layers)]
        self.encoder_final_ln = T5LayerNorm(cfg.layer_norm_epsilon)
        self.decoder_blocks = [
            T5Block(cfg, is_decoder=True, has_relative_bias=(i == 0),
                    name=f"decoder_block_{i}")
            for i in range(cfg.num_decoder_layers)]
        self.decoder_final_ln = T5LayerNorm(cfg.layer_norm_epsilon)
        self.drop = nn.Dropout(cfg.dropout_rate)

    def embed_tokens(self, ids: jax.Array) -> jax.Array:
        return self.shared(ids)

    def encode(self, input_ids: Optional[jax.Array] = None,
               attention_mask: Optional[jax.Array] = None,
               inputs_embeds: Optional[jax.Array] = None,
               deterministic: bool = True) -> jax.Array:
        x = inputs_embeds if inputs_embeds is not None \
            else self.shared(input_ids)
        x = self.drop(x, deterministic=deterministic)
        mb = _mask_bias(attention_mask)
        t = x.shape[1]
        pos_bias = self.encoder_blocks[0].self_attn.compute_bias(t, t)
        for block in self.encoder_blocks:
            x = block(x, mb, pos_bias, deterministic=deterministic)
        x = self.encoder_final_ln(x)
        x = self.drop(x, deterministic=deterministic)
        return x

    def decode(self, decoder_input_ids: jax.Array, enc_out: jax.Array,
               enc_mask: Optional[jax.Array] = None,
               deterministic: bool = True) -> jax.Array:
        """Teacher-forced decode -> [B, T, vocab] logits."""
        cfg = self.cfg
        x = self.shared(decoder_input_ids)
        x = self.drop(x, deterministic=deterministic)
        t = x.shape[1]
        mb = _causal_mask_bias(t)
        pos_bias = self.decoder_blocks[0].self_attn.compute_bias(t, t)
        emb = _mask_bias(enc_mask)
        for block in self.decoder_blocks:
            x = block(x, mb, pos_bias, enc_out, emb,
                      deterministic=deterministic)
        x = self.decoder_final_ln(x)
        x = self.drop(x, deterministic=deterministic)
        x = x * (cfg.d_model ** -0.5)   # tied-embedding scaling
        return jnp.einsum("btd,vd->btv", x, self.shared.embedding)

    def __call__(self, input_ids=None, attention_mask=None,
                 inputs_embeds=None, labels=None, deterministic=True):
        """Full forward like HF: encoder + shifted-right decoder + logits."""
        cfg = self.cfg
        enc = self.encode(input_ids, attention_mask, inputs_embeds,
                          deterministic)
        if labels is None:
            raise ValueError("labels required in __call__")
        start = jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id,
                         labels.dtype)
        dec_in = jnp.concatenate([start, labels[:, :-1]], axis=1)
        # HF replaces -100 with pad in decoder inputs
        dec_in = jnp.where(dec_in == -100, cfg.pad_token_id, dec_in)
        return self.decode(dec_in, enc, attention_mask, deterministic)

    # -- incremental decode ---------------------------------------------------
    def init_cache(self, batch: int, max_len: int, enc_out: jax.Array):
        cfg = self.cfg
        caches = {}
        for i, block in enumerate(self.decoder_blocks):
            k = split_heads(block.cross_attn.k(enc_out), cfg.num_heads)
            v = split_heads(block.cross_attn.v(enc_out), cfg.num_heads)
            caches[f"block_{i}"] = {
                "self": {
                    "k": jnp.zeros((batch, cfg.num_heads, max_len, cfg.d_kv),
                                   enc_out.dtype),
                    "v": jnp.zeros((batch, cfg.num_heads, max_len, cfg.d_kv),
                                   enc_out.dtype),
                },
                "cross": {"k": k, "v": v},
            }
        return caches

    @staticmethod
    def split_cache(cache):
        """(self_part, cross_part) of an `init_cache` tree.  Cross K/V are
        functions of the (beam-repeated) encoder memory only — identical
        across the K beams of a batch item and never written during
        decoding — so beam search carries ONLY the self part through the
        scan (parent-gathering cross K/V every step cost ~1.9 GB/step of
        pure HBM shuffle at b64·K4; removing it doubled beam throughput,
        54.6 → 107.4 answers/s — PERF.md batch15)."""
        return ({b: {"self": c["self"]} for b, c in cache.items()},
                {b: c["cross"] for b, c in cache.items()})

    @staticmethod
    def merge_cache(self_part, cross_part):
        """Rebuild the full `decode_step` cache from split halves."""
        return {b: {"self": c["self"], "cross": cross_part[b]}
                for b, c in self_part.items()}

    def decode_step(self, token: jax.Array, position: jax.Array,
                    enc_out: jax.Array, enc_mask: Optional[jax.Array],
                    cache: Dict) -> Tuple[jax.Array, Dict]:
        """token [B,1] at `position` -> (logits [B, vocab], cache)."""
        cfg = self.cfg
        x = self.shared(token)
        max_len = cache["block_0"]["self"]["k"].shape[2]
        # self-attn bias: valid keys are positions <= current
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
        mb = jnp.where(pos <= position, 0.0, -1e9)
        pos_bias = self.decoder_blocks[0].self_attn.compute_bias(
            1, max_len, q_offset=position)
        emb = _mask_bias(enc_mask)
        for i, block in enumerate(self.decoder_blocks):
            x, cache[f"block_{i}"] = block(
                x, mb, pos_bias, enc_out, emb, deterministic=True,
                cache=cache[f"block_{i}"], cache_index=position)
        x = self.decoder_final_ln(x)
        x = x * (cfg.d_model ** -0.5)
        logits = jnp.einsum("btd,vd->btv", x, self.shared.embedding)
        return logits[:, 0], cache
