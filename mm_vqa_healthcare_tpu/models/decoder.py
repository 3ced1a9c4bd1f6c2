"""Transformer decoder answer head (reference m3ae/modules/m3ae_decoder.py).

A from-scratch generative head over a frozen M3AE: sinusoidal positions,
6 pre-norm decoder layers (self-attn -> cross-attn into encoder feats ->
ReLU FFN), BERT vocabulary, greedy search (search_path) with CLS start and
SEP/EOS stop.

Reference quirks, reproduced under ``bug_compat=True`` (the default — the
parity north star is token-for-token greedy output against reference
checkpoints):

  * positional add is doubled: the reference computes
    ``target_embed += positional_encoding(target_embed)`` where
    PositionalEncoding.forward already returns x + pe
    (m3ae_decoder.py:127,35-36) — so the input is 2*emb + pe.
  * every decoder layer receives the ORIGINAL embedding, not the previous
    layer's output (m3ae_decoder.py:131-134 passes ``target_embed`` to each
    layer) — the effective network is just the LAST layer.  In compat mode
    only layer ``num_layers-1`` is executed (mathematically identical,
    5 layers cheaper); with ``bug_compat=False`` layers chain normally.

With compat decoding, a KV cache reproduces the reference's full-prefix
re-forward exactly (causal mask + deterministic eval), so greedy decode is
O(T) instead of the reference's O(T^2) re-forwards.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.models.layers import Dense, MultiHeadAttention
from mm_vqa_healthcare_tpu.ops.attention import causal_bias


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    num_layers: int = 6
    d_model: int = 768
    num_heads: int = 8
    d_ff: int = 3072
    dropout: float = 0.1
    max_len: int = 128
    vocab_size: int = 30522
    pe_max_len: int = 1024
    bug_compat: bool = True
    attention_impl: str = "auto"


def sinusoid_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos table (m3ae_decoder.py:22-36)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class DecoderLayer(nn.Module):
    """pre_norm -> causal self-attn (+res) -> LN1 -> cross-attn (+res) ->
    LN2 -> ReLU FFN (+res) -> LN3 (m3ae_decoder.py:38-90)."""
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x: jax.Array, enc_output: jax.Array,
                 self_bias: Optional[jax.Array],
                 deterministic: bool = True,
                 cache: Optional[Dict[str, jax.Array]] = None,
                 cache_index: Optional[jax.Array] = None,
                 precompute_cross: bool = False):
        cfg = self.cfg
        from mm_vqa_healthcare_tpu.models.layers import LayerNorm
        if precompute_cross:
            # project the encoder memory into this layer's cross K/V once
            # (x is unused; see MultiHeadAttention precompute_kv)
            return MultiHeadAttention(cfg.num_heads, cfg.attention_impl,
                                      cfg.dropout, name="mha2")(
                enc_output, enc_output, enc_output, precompute_kv=True)
        cross_kv = cache.get("cross") if cache is not None else None
        residual = x
        h = LayerNorm(name="pre_norm")(x)
        mha1 = MultiHeadAttention(cfg.num_heads, cfg.attention_impl,
                                  cfg.dropout, name="mha1")
        if cache is None:
            attn1 = mha1(h, h, h, self_bias, deterministic=deterministic)
        else:
            attn1, self_kv = mha1(h, h, h, None,
                                  cache={"k": cache["k"], "v": cache["v"]},
                                  cache_index=cache_index)
            cache = dict(self_kv) if cross_kv is None \
                else dict(self_kv, cross=cross_kv)
        x = residual + nn.Dropout(cfg.dropout)(attn1,
                                               deterministic=deterministic)
        residual = x
        x = LayerNorm(name="layernorm1")(x)
        mha2 = MultiHeadAttention(cfg.num_heads, cfg.attention_impl,
                                  cfg.dropout, name="mha2")
        if cross_kv is not None:
            attn2 = mha2(x, enc_output, enc_output, kv_cache=cross_kv,
                         deterministic=deterministic)
        else:
            attn2 = mha2(x, enc_output, enc_output,
                         deterministic=deterministic)
        x = nn.Dropout(cfg.dropout)(attn2, deterministic=deterministic)
        x = x + residual
        residual = x
        x = LayerNorm(name="layernorm2")(x)
        h = Dense(cfg.d_ff, name="ffn1")(x)
        h = jax.nn.relu(h)
        h = Dense(cfg.d_model, name="ffn2")(h)
        x = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        x = x + residual
        x = LayerNorm(name="layernorm3")(x)
        if cache is not None:
            return x, cache
        return x


class Decoder(nn.Module):
    """Embedding + PE + layers + vocab projection (m3ae_decoder.py:93-138)."""
    cfg: DecoderConfig

    def setup(self):
        cfg = self.cfg
        self.target_embedding = nn.Embed(
            cfg.vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(1.0),
            param_dtype=jnp.float32)
        self.pe = jnp.asarray(
            sinusoid_position_encoding(cfg.pe_max_len, cfg.d_model))
        self.dec_layers = [DecoderLayer(cfg, name=f"dec_layers_{i}")
                           for i in range(cfg.num_layers)]
        self.final_linear = Dense(cfg.vocab_size)
        self.drop = nn.Dropout(cfg.dropout)

    def embed(self, tokens: jax.Array, position_offset: int | jax.Array = 0):
        """Embedding + positional add, honoring the doubled-add compat quirk."""
        cfg = self.cfg
        emb = self.target_embedding(tokens)
        t = tokens.shape[1]
        if isinstance(position_offset, int) and position_offset == 0:
            pe = self.pe[:t]
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pe, position_offset, t, 0)
        if cfg.bug_compat:
            return emb + (emb + pe.astype(emb.dtype))   # 2*emb + pe
        return emb + pe.astype(emb.dtype)

    def __call__(self, padded_targets: jax.Array,
                 padding_mask: Optional[jax.Array],
                 cross_attn_feats: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """Teacher-forced forward -> [B, T, vocab] logits."""
        cfg = self.cfg
        t = padded_targets.shape[1]
        bias = causal_bias(t)
        if padding_mask is not None:
            key_bias = (1.0 - padding_mask.astype(jnp.float32)) * -1e30
            bias = bias + key_bias[:, None, None, :]
        x = self.embed(padded_targets)
        x = self.drop(x, deterministic=deterministic)
        if cfg.bug_compat:
            # every reference layer consumed the same input; only the last
            # layer's output survives (m3ae_decoder.py:131-134)
            out = self.dec_layers[-1](x, cross_attn_feats, bias,
                                      deterministic)
        else:
            out = x
            for layer in self.dec_layers:
                out = layer(out, cross_attn_feats, bias, deterministic)
        return self.final_linear(out)

    # -- incremental decode --------------------------------------------------
    def init_cache(self, batch: int, dtype=jnp.float32, enc_output=None):
        """Self-attn K/V buffers (+ precomputed cross K/V when the encoder
        memory is passed — its projections never change during decoding,
        so they run once per batch instead of once per token; the
        reference re-projects every step via the full-prefix re-forward,
        m3ae_decoder.py:149-181)."""
        cfg = self.cfg
        dh = cfg.d_model // cfg.num_heads
        layers = ([cfg.num_layers - 1] if cfg.bug_compat
                  else list(range(cfg.num_layers)))
        out = {}
        for i in layers:
            c = {
                "k": jnp.zeros((batch, cfg.num_heads, cfg.max_len + 1, dh),
                               dtype),
                "v": jnp.zeros((batch, cfg.num_heads, cfg.max_len + 1, dh),
                               dtype),
            }
            if enc_output is not None:
                c["cross"] = self.dec_layers[i](
                    enc_output, enc_output, None, precompute_cross=True)
            out[f"layer_{i}"] = c
        return out

    def decode_step(self, token: jax.Array, position: jax.Array,
                    cross_attn_feats: jax.Array, cache: Dict):
        """One greedy step: token [B, 1] at `position` -> (logits [B,V], cache)."""
        cfg = self.cfg
        x = self.embed(token, position_offset=position)
        layers = ([self.dec_layers[-1]] if cfg.bug_compat
                  else list(self.dec_layers))
        names = ([f"layer_{cfg.num_layers - 1}"] if cfg.bug_compat
                 else [f"layer_{i}" for i in range(cfg.num_layers)])
        for layer, name in zip(layers, names):
            x, cache[name] = layer(x, cross_attn_feats, None, True,
                                   cache=cache[name], cache_index=position)
        logits = self.final_linear(x)[:, 0]
        return logits, cache
