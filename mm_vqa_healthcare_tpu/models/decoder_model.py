"""Decoder-head VQA model: frozen M3AE + generative transformer decoder
(reference DecoderModel, m3ae_decoder.py:185-388).

Encoder-input assembly per the ``mm_encoder_inputs_*`` flags
(m3ae_decoder.py:302-313):
  * include_imagetext_feats: [multi_modal_image_feats; multi_modal_text_feats]
  * include_cls_feats: multi_modal_cls_feats reshaped [B, 2, hidden]
concatenated along the sequence axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.decoder import Decoder, DecoderConfig
from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig


@dataclasses.dataclass(frozen=True)
class DecoderModelConfig:
    m3ae: M3AEConfig
    decoder: DecoderConfig
    include_cls_feats: bool = True
    include_imagetext_feats: bool = False
    max_answer_length: int = 12

    @classmethod
    def from_dict(cls, config: Dict[str, Any],
                  vocab_size: int = 30522) -> "DecoderModelConfig":
        # reference hardcodes (6 layers, d_model 768, 8 heads, ff 3072,
        # max_len 128) with hidden_size 768 (m3ae_decoder.py:196-204);
        # d_model follows hidden_size so debug scales work too.
        d_model = config["hidden_size"]
        return cls(
            m3ae=M3AEConfig.from_dict(config),
            decoder=DecoderConfig(
                num_layers=6, d_model=d_model,
                num_heads=8 if d_model % 8 == 0 and d_model >= 768
                else config["num_heads"],
                d_ff=d_model * 4,
                dropout=0.1, max_len=128, vocab_size=vocab_size,
                bug_compat=config.get("bug_compat", True),
                attention_impl=config.get("attention_impl", "auto")),
            include_cls_feats=config["mm_encoder_inputs_include_cls_feats"],
            include_imagetext_feats=config[
                "mm_encoder_inputs_include_imagetext_feats"],
        )


def assemble_encoder_memory(out: Dict[str, jax.Array],
                            cfg: "DecoderModelConfig") -> jax.Array:
    """Build the decoder cross-attention memory from M3AE infer outputs
    per the ``mm_encoder_inputs_*`` flags (m3ae_decoder.py:302-313).
    Shared by DecoderVQAModel.encode and the split-phase serving path."""
    feats = []
    if cfg.include_imagetext_feats:
        feats.append(out["multi_modal_image_feats"])
        feats.append(out["multi_modal_text_feats"])
    if cfg.include_cls_feats:
        cls = out["multi_modal_cls_feats"]
        feats.append(cls.reshape(cls.shape[0], 2, -1))
    return jnp.concatenate(feats, axis=1)


class DecoderVQAModel(nn.Module):
    cfg: DecoderModelConfig

    def setup(self):
        self.m3ae = M3AE(self.cfg.m3ae)
        self.decoder = Decoder(self.cfg.decoder)

    def encode(self, batch: Dict[str, jax.Array],
               deterministic: bool = True) -> jax.Array:
        """Frozen-M3AE features -> decoder cross-attention memory."""
        out = self.m3ae.infer(batch, deterministic=deterministic)
        enc = assemble_encoder_memory(out, self.cfg)
        # frozen backbone (m3ae_decoder.py:213-216)
        return jax.lax.stop_gradient(enc)

    def __call__(self, batch: Dict[str, jax.Array],
                 target_shifted: jax.Array,
                 padding_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        enc = self.encode(batch, deterministic=deterministic)
        return self.decoder(target_shifted, padding_mask, enc,
                            deterministic=deterministic)
