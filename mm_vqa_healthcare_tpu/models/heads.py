"""Task and pretraining heads (reference m3ae/modules/prediction_heads.py and
the VQA classifier head built inline at m3ae_module.py:118-126)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.clip_vit import CLIPTransformer
from mm_vqa_healthcare_tpu.models.layers import Dense, LayerNorm, gelu_exact
from mm_vqa_healthcare_tpu.models.position_embeddings import get_2d_sincos_pos_embed


class Pooler(nn.Module):
    """First-token dense + tanh (prediction_heads.py:9-19)."""

    @nn.compact
    def __call__(self, hidden_states: jax.Array) -> jax.Array:
        first = hidden_states[:, 0]
        return jnp.tanh(Dense(first.shape[-1], name="dense")(first))


class MLMHead(nn.Module):
    """BertPredictionHeadTransform (dense+gelu+LN) + vocab decoder
    (prediction_heads.py:22-34)."""
    vocab_size: int
    layer_norm_eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Dense(x.shape[-1], name="transform_dense")(x)
        x = gelu_exact(x)
        x = LayerNorm(eps=self.layer_norm_eps, name="transform_LayerNorm")(x)
        x = Dense(self.vocab_size, use_bias=False, name="decoder")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,),
                          jnp.float32)
        return x + bias.astype(x.dtype)


class MIMHead(nn.Module):
    """MAE-style pixel decoder (prediction_heads.py:37-86).

    embed 768->384, insert mask tokens, unshuffle via ids_restore, add fixed
    2-D sin-cos positions, run a CLIP Transformer of
    (mim_decoder_num_layers + 1) configured layers — which, via the
    reference's layers-1 Transformer quirk, executes mim_decoder_num_layers
    actual blocks — then predict patch pixels.
    """
    hidden_size: int
    patch_size: int
    image_size: int
    decoder_hidden_size: int = 384
    decoder_num_layers: int = 4
    decoder_num_heads: int = 6
    attention_impl: str = "auto"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jax.Array, ids_restore: jax.Array) -> jax.Array:
        dhs = self.decoder_hidden_size
        x = Dense(dhs, name="decoder_embed")(x)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, dhs), jnp.float32)
        b = x.shape[0]
        n_masked = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(mask_token.astype(x.dtype),
                                       (b, n_masked, dhs))
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)  # drop cls
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)            # re-add cls

        pos = get_2d_sincos_pos_embed(dhs, int(self.num_patches ** 0.5), True)
        x = x + jnp.asarray(pos, x.dtype)[None]

        x = CLIPTransformer(self.decoder_num_layers + 1,
                            self.decoder_num_heads,
                            self.attention_impl, name="decoder")(x)
        x = LayerNorm(eps=1e-5, name="decoder_norm")(x)
        x = Dense(self.patch_size ** 2 * 3, name="decoder_pred")(x)
        return x[:, 1:, :]                                        # drop cls


class ITMHead(nn.Module):
    """1536 -> 2 linear (prediction_heads.py:89-96)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Dense(2, name="fc")(x)


class VQAClassifierHead(nn.Module):
    """Linear(2h,2h) -> LayerNorm -> GELU -> Linear(2h, label_size)
    (m3ae_module.py:118-126; torch Sequential indices 0/1/3 map to
    fc1/ln/fc2)."""
    label_size: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Dense(x.shape[-1], name="fc1")(x)
        x = LayerNorm(eps=1e-5, name="ln")(x)
        x = gelu_exact(x)
        return Dense(self.label_size, name="fc2")(x)
