"""BERT / RoBERTa text encoder and the co-attention fusion layers.

JAX re-design of the components the reference actually uses from its
vendored HF-4.6 BERT fork (reference m3ae/modules/language_encoders/
bert_model.py):

  * BertEmbeddings      (bert_model.py:164-208; + RoBERTa position-id
                         offsetting from HF RobertaEmbeddings)
  * BertSelfAttention / BertSelfOutput / BertAttention (:211-413) with the
    cross-attention path (kv from the other modality stream)
  * BertIntermediate / BertOutput (post-LN FFN)
  * BertLayer           (standard encoder block, used as the text encoder)
  * BertCrossLayer      (:445-503 — self-attn -> cross-attn -> FFN; the
                         multimodal fusion block)

Parameter tree names mirror the torch module paths (query/key/value,
attention.output.dense, intermediate.dense, output.dense, LayerNorm) so the
checkpoint converter is a near-identity mapping.

Attention math runs through ops.attention (Pallas fused kernel on TPU).
Attention-probability dropout (HF semantics) runs in-kernel on the packed
pallas path (TPU PRNG seeded per head-program) and via jax.random on the
XLA path — see ops/attention.py:dot_product_attention_packed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.layers import Dense, LayerNorm, gelu_exact
from mm_vqa_healthcare_tpu.ops.attention import (
    attention_probs, dot_product_attention_packed)


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    pad_token_id: int = 0
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    is_roberta: bool = False
    attention_impl: str = "auto"


# Architecture presets for the pretrained text encoders the reference loads
# via from_pretrained (m3ae_module.py:65-68).
TEXT_ENCODER_PRESETS = {
    "bert-base-uncased": TextEncoderConfig(),
    "roberta-base": TextEncoderConfig(
        vocab_size=50265, max_position_embeddings=514, type_vocab_size=1,
        pad_token_id=1, is_roberta=True),
    "roberta-large": TextEncoderConfig(
        vocab_size=50265, hidden_size=1024, num_layers=24, num_heads=16,
        intermediate_size=4096, max_position_embeddings=514,
        type_vocab_size=1, pad_token_id=1, is_roberta=True),
    # Debug-scale tower for tests / multichip dry-runs (not in reference).
    "tiny-bert": TextEncoderConfig(
        vocab_size=200, hidden_size=64, num_layers=2, num_heads=2,
        intermediate_size=128, max_position_embeddings=64),
}


def text_encoder_config(tokenizer_name: str, **overrides) -> TextEncoderConfig:
    for key, preset in TEXT_ENCODER_PRESETS.items():
        if key in tokenizer_name:
            return dataclasses.replace(preset, **overrides)
    if "roberta" in tokenizer_name:
        return dataclasses.replace(TEXT_ENCODER_PRESETS["roberta-base"], **overrides)
    return dataclasses.replace(TEXT_ENCODER_PRESETS["bert-base-uncased"], **overrides)


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Config for BertCrossLayer fusion blocks (reference m3ae_module.py:24-44:
    BertConfig(hidden_size, num_heads, intermediate=hidden*mlp_ratio,
    dropout=drop_rate)); LN eps is the HF default 1e-12."""
    hidden_size: int = 768
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    attention_impl: str = "auto"


def roberta_position_ids(input_ids: jax.Array, pad_token_id: int) -> jax.Array:
    """HF create_position_ids_from_input_ids: pad tokens keep padding_idx,
    real tokens get padding_idx + running count."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


class BertEmbeddings(nn.Module):
    """Word + position + token-type embeddings, LN, dropout."""
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array,
                 token_type_ids: Optional[jax.Array] = None,
                 position_ids: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        seq_len = input_ids.shape[1]
        if position_ids is None:
            if cfg.is_roberta:
                position_ids = roberta_position_ids(input_ids, cfg.pad_token_id)
            else:
                position_ids = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                        embedding_init=nn.initializers.normal(0.02),
                        param_dtype=jnp.float32)(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="position_embeddings",
                       embedding_init=nn.initializers.normal(0.02),
                       param_dtype=jnp.float32)(position_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="token_type_embeddings",
                       embedding_init=nn.initializers.normal(0.02),
                       param_dtype=jnp.float32)(token_type_ids)
        x = word + tok + pos
        x = LayerNorm(eps=cfg.layer_norm_eps, name="LayerNorm")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x


class BertSelfAttention(nn.Module):
    """Self- or cross-attention core (kv from encoder_hidden_states if given)."""
    num_heads: int
    attention_dropout: float = 0.1
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, hidden_states: jax.Array,
                 attention_bias: Optional[jax.Array] = None,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 output_attentions: bool = False):
        d = hidden_states.shape[-1]
        kv_source = (encoder_hidden_states if encoder_hidden_states is not None
                     else hidden_states)
        q = Dense(d, name="query")(hidden_states)
        k = Dense(d, name="key")(kv_source)
        v = Dense(d, name="value")(kv_source)
        rate = 0.0 if deterministic else self.attention_dropout
        rng = self.make_rng("dropout") if rate > 0.0 else None
        # HF-style dropout on the attention probabilities — fused in-kernel
        # on the pallas path (TPU PRNG), jax.random on the XLA path.
        # Packed layout: heads are carved out of the lane dim in-kernel, so
        # no [B,S,H,D]<->[B,H,S,D] relayouts hit HBM.
        ctx = dot_product_attention_packed(
            q, k, v, self.num_heads, attention_bias,
            impl=self.attention_impl, dropout_rate=rate, dropout_rng=rng)
        if not output_attentions:
            return ctx
        # Introspection path (reference output_attentions=True,
        # bert_model.py:300-332): the fused kernel streams the softmax, so
        # the [B,H,Sq,Sk] probs are recomputed explicitly.  NOTE the
        # reference applies self.dropout to attention_probs BEFORE building
        # outputs (bert_model.py:316-332), so it returns POST-dropout probs;
        # this port deliberately returns pre-dropout probs — identical in
        # the deterministic/eval case (the intended visualization use),
        # different when deterministic=False (DEVIATIONS.md #9).  Static
        # flag — the hot path traces no extra ops when False.
        probs = attention_probs(q, k, self.num_heads, attention_bias)
        return ctx, probs


class BertSelfOutput(nn.Module):
    """dense -> dropout -> LN(x + residual) (reference bert_model.py:355-364)."""
    hidden_dropout: float
    layer_norm_eps: float

    @nn.compact
    def __call__(self, hidden_states, input_tensor, deterministic=True):
        x = Dense(input_tensor.shape[-1], name="dense")(hidden_states)
        x = nn.Dropout(self.hidden_dropout)(x, deterministic=deterministic)
        return LayerNorm(eps=self.layer_norm_eps, name="LayerNorm")(x + input_tensor)


class BertAttention(nn.Module):
    num_heads: int
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, attention_bias=None,
                 encoder_hidden_states=None, deterministic=True,
                 output_attentions=False):
        ctx = BertSelfAttention(self.num_heads, self.attention_dropout,
                                self.attention_impl, name="self")(
            hidden_states, attention_bias, encoder_hidden_states,
            deterministic, output_attentions)
        probs = None
        if output_attentions:
            ctx, probs = ctx
        out = BertSelfOutput(self.hidden_dropout, self.layer_norm_eps,
                             name="output")(ctx, hidden_states, deterministic)
        return (out, probs) if output_attentions else out


class BertIntermediate(nn.Module):
    intermediate_size: int

    @nn.compact
    def __call__(self, x):
        return gelu_exact(Dense(self.intermediate_size, name="dense")(x))


class BertOutput(nn.Module):
    hidden_size: int
    hidden_dropout: float
    layer_norm_eps: float

    @nn.compact
    def __call__(self, hidden_states, input_tensor, deterministic=True):
        x = Dense(self.hidden_size, name="dense")(hidden_states)
        x = nn.Dropout(self.hidden_dropout)(x, deterministic=deterministic)
        return LayerNorm(eps=self.layer_norm_eps, name="LayerNorm")(x + input_tensor)


class BertLayer(nn.Module):
    """Standard post-LN encoder block (text encoder layer)."""
    num_heads: int
    intermediate_size: int
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, attention_bias=None, deterministic=True):
        d = hidden_states.shape[-1]
        x = BertAttention(self.num_heads, self.hidden_dropout,
                          self.attention_dropout, self.layer_norm_eps,
                          self.attention_impl, name="attention")(
            hidden_states, attention_bias, None, deterministic)
        inter = BertIntermediate(self.intermediate_size, name="intermediate")(x)
        return BertOutput(d, self.hidden_dropout, self.layer_norm_eps,
                          name="output")(inter, x, deterministic)


class BertCrossLayer(nn.Module):
    """Fusion block: self-attn -> cross-attn -> FFN (bert_model.py:445-503).

    Queries come from `hidden_states`, cross-attention keys/values from
    `encoder_hidden_states` (the other modality stream).
    """
    num_heads: int
    intermediate_size: int
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states,
                 attention_bias=None, encoder_attention_bias=None,
                 deterministic=True, output_attentions=False):
        d = hidden_states.shape[-1]
        x = BertAttention(self.num_heads, self.hidden_dropout,
                          self.attention_dropout, self.layer_norm_eps,
                          self.attention_impl, name="attention")(
            hidden_states, attention_bias, None, deterministic,
            output_attentions)
        self_probs = None
        if output_attentions:
            x, self_probs = x
        x = BertAttention(self.num_heads, self.hidden_dropout,
                          self.attention_dropout, self.layer_norm_eps,
                          self.attention_impl, name="crossattention")(
            x, encoder_attention_bias, encoder_hidden_states, deterministic,
            output_attentions)
        cross_probs = None
        if output_attentions:
            x, cross_probs = x
        inter = BertIntermediate(self.intermediate_size, name="intermediate")(x)
        out = BertOutput(d, self.hidden_dropout, self.layer_norm_eps,
                         name="output")(inter, x, deterministic)
        if not output_attentions:
            return out
        # Tuple ordering mirrors the reference layer's
        # `(layer_output,) + (self_probs, cross_probs)`
        # (bert_model.py:457-498) minus the hidden state, which callers
        # take separately.
        return out, (self_probs, cross_probs)


class TextEncoder(nn.Module):
    """BertModel / RobertaModel equivalent: embeddings + N BertLayers.

    The reference drives the pretrained HF model manually — embeddings then
    each encoder layer in a loop (m3ae_module.py:230-235); the HF pooler is
    never used, so it is not built here (its weights are simply ignored by
    the checkpoint converter).
    """
    cfg: TextEncoderConfig

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg)
        self.layers = [
            BertLayer(self.cfg.num_heads, self.cfg.intermediate_size,
                      self.cfg.hidden_dropout, self.cfg.attention_dropout,
                      self.cfg.layer_norm_eps, self.cfg.attention_impl,
                      name=f"layer_{i}")
            for i in range(self.cfg.num_layers)
        ]

    def __call__(self, input_ids, attention_bias=None, deterministic=True):
        x = self.embeddings(input_ids, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, attention_bias, deterministic)
        return x
