"""M3AE multimodal fusion model (TPU-native re-design of reference
m3ae/modules/m3ae_module.py:16-345, M3AETransformerSS).

The reference is a PyTorch-Lightning module mixing model math with trainer
hooks; here the model is a pure flax module (`M3AE.infer` is the functional
equivalent of M3AETransformerSS.infer, m3ae_module.py:203-312) and the
training loop / objectives live in `train/`.

Architecture (identical to reference):
  text ids  -> pretrained-BERT/RoBERTa tower -> linear proj -> +type-emb(0)
  image     -> CLIP-ViT (or Swin) tower      -> linear proj -> +type-emb(1)
  then `num_top_layer` *pairs* of BertCrossLayer run per fusion step —
  text-queries-image and image-queries-text co-attention in parallel
  (m3ae_module.py:266-285) — then first-token poolers per stream and
  cls feats = concat(text_pool, image_pool)  [B, 2*hidden].

MIM support: `mask_image=True` reproduces MAE random masking
(m3ae_module.py:153-183) — argsort-of-uniform keep-subset executed on
device inside jit (static keep length), position embedding applied inside
the masking step, split-phase ViT forward.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.bert import (
    BertCrossLayer, TextEncoder, text_encoder_config)
from mm_vqa_healthcare_tpu.models.clip_vit import (
    VisualTransformer, clip_vit_config, patchify_image)
from mm_vqa_healthcare_tpu.models.heads import (
    ITMHead, MIMHead, MLMHead, Pooler, VQAClassifierHead)
from mm_vqa_healthcare_tpu.models.layers import Dense
from mm_vqa_healthcare_tpu.ops.attention import extended_attention_mask


@dataclasses.dataclass(frozen=True)
class M3AEConfig:
    vit: str = "ViT-B/16"
    image_size: int = 384
    patch_size: int = 16
    tokenizer: str = "bert-base-uncased"
    vocab_size: int = 30522
    hidden_size: int = 768
    num_heads: int = 12
    num_top_layer: int = 6
    mlp_ratio: int = 4
    drop_rate: float = 0.1
    input_text_embed_size: int = 768
    input_image_embed_size: int = 768
    max_text_len: int = 32
    # MIM
    mim_prob: float = 0.75
    mim_decoder_hidden_size: int = 384
    mim_decoder_num_layers: int = 4
    mim_decoder_num_heads: int = 6
    norm_pix_loss: bool = True
    mim_layer: int = -1
    # Heads
    vqa_label_size: int = 498
    cls_label_size: int = 14
    use_mlm_head: bool = False
    use_mim_head: bool = False
    use_itm_head: bool = False
    use_vqa_head: bool = True
    use_cls_head: bool = False
    use_irtr_head: bool = False
    # TPU knobs
    attention_impl: str = "auto"
    compute_dtype: str = "float32"
    remat: str = "none"   # "none" | "full" (checkpoint encoder/fusion layers)

    @classmethod
    def from_dict(cls, config: Dict[str, Any]) -> "M3AEConfig":
        """Build from a composed reference-style config dict."""
        ln = config["loss_names"]
        return cls(
            vit=config["vit"],
            image_size=config["image_size"],
            patch_size=config["patch_size"],
            tokenizer=config["tokenizer"],
            vocab_size=config["vocab_size"],
            hidden_size=config["hidden_size"],
            num_heads=config["num_heads"],
            num_top_layer=config["num_top_layer"],
            mlp_ratio=config["mlp_ratio"],
            drop_rate=config["drop_rate"],
            input_text_embed_size=config["input_text_embed_size"],
            input_image_embed_size=config["input_image_embed_size"],
            max_text_len=config["max_text_len"],
            mim_prob=config["mim_prob"],
            mim_decoder_hidden_size=config["mim_decoder_hidden_size"],
            mim_decoder_num_layers=config["mim_decoder_num_layers"],
            mim_decoder_num_heads=config["mim_decoder_num_heads"],
            norm_pix_loss=config["norm_pix_loss"],
            mim_layer=config["mim_layer"],
            vqa_label_size=config["vqa_label_size"],
            use_mlm_head=ln["mlm"] > 0,
            use_mim_head=ln["mim"] > 0,
            use_itm_head=ln["itm"] > 0 or ln["irtr"] > 0,
            use_vqa_head=ln["vqa"] > 0,
            use_cls_head=ln["cls"] > 0,
            use_irtr_head=ln["irtr"] > 0,
            cls_label_size=(
                config["melinda_label_size"][config["label_column_name"]]
                if config.get("label_column_name") else
                config.get("mlc_label_size", 14)),
            attention_impl=config.get("attention_impl", "auto"),
            compute_dtype=config.get("compute_dtype", "float32"),
            remat=config.get("remat", "none"),
        )

    @property
    def is_clip(self) -> bool:
        return "swin" not in self.vit


class M3AE(nn.Module):
    cfg: M3AEConfig

    def setup(self):
        cfg = self.cfg
        text_cfg = text_encoder_config(
            cfg.tokenizer, attention_impl=cfg.attention_impl)
        if cfg.vocab_size != text_cfg.vocab_size:
            text_cfg = dataclasses.replace(text_cfg, vocab_size=cfg.vocab_size)
        self.text_cfg = text_cfg
        self.language_encoder = TextEncoder(text_cfg)
        if cfg.is_clip:
            self.vision_encoder = VisualTransformer(
                clip_vit_config(cfg.vit, cfg.image_size, cfg.attention_impl))
        else:
            from mm_vqa_healthcare_tpu.models.swin import (
                SwinTransformer, swin_config)
            self.vision_encoder = SwinTransformer(
                swin_config(cfg.vit, cfg.image_size, cfg.attention_impl))

        self.multi_modal_language_proj = Dense(cfg.hidden_size)
        self.multi_modal_vision_proj = Dense(cfg.hidden_size)
        self.modality_type_embeddings = nn.Embed(
            2, cfg.hidden_size, embedding_init=nn.initializers.normal(0.02),
            param_dtype=jnp.float32)

        fusion_kwargs = dict(
            num_heads=cfg.num_heads,
            intermediate_size=cfg.hidden_size * cfg.mlp_ratio,
            hidden_dropout=cfg.drop_rate,
            attention_dropout=cfg.drop_rate,
            attention_impl=cfg.attention_impl,
        )
        # remat="full": rematerialize fusion blocks in the backward pass
        # (jax.checkpoint) to trade FLOPs for activation memory
        cross_cls = (nn.remat(BertCrossLayer, static_argnums=(5, 6))
                     if cfg.remat == "full" else BertCrossLayer)
        self.multi_modal_language_layers = [
            cross_cls(**fusion_kwargs, name=f"multi_modal_language_layers_{i}")
            for i in range(cfg.num_top_layer)]
        self.multi_modal_vision_layers = [
            cross_cls(**fusion_kwargs, name=f"multi_modal_vision_layers_{i}")
            for i in range(cfg.num_top_layer)]
        self.multi_modal_language_pooler = Pooler()
        self.multi_modal_vision_pooler = Pooler()

        if cfg.use_mlm_head:
            self.mlm_head = MLMHead(vocab_size=text_cfg.vocab_size)
        if cfg.use_mim_head:
            self.mim_head = MIMHead(
                hidden_size=cfg.hidden_size, patch_size=cfg.patch_size,
                image_size=cfg.image_size,
                decoder_hidden_size=cfg.mim_decoder_hidden_size,
                decoder_num_layers=cfg.mim_decoder_num_layers,
                decoder_num_heads=cfg.mim_decoder_num_heads,
                attention_impl=cfg.attention_impl)
        if cfg.use_itm_head:
            self.itm_head = ITMHead()
        if cfg.use_vqa_head:
            self.vqa_head = VQAClassifierHead(label_size=cfg.vqa_label_size)
        # cls_head / irtr_head are referenced by the reference's objectives
        # (objectives.py:240,285) but never constructed in M3AETransformerSS
        # (SURVEY.md §1) — built here so the cls/irtr tasks actually run.
        if cfg.use_cls_head:
            self.cls_head = VQAClassifierHead(label_size=cfg.cls_label_size)
        if cfg.use_irtr_head:
            from mm_vqa_healthcare_tpu.models.layers import Dense as _Dense
            self.irtr_head = _Dense(1)

    # -- MAE random masking (reference m3ae_module.py:153-183) --------------
    def random_masking(self, x: jax.Array, mask_ratio: float,
                       rng: jax.Array):
        """x: [B, 1+L, D] patch tokens (cls first).  Returns
        (x_masked [B, 1+keep, D], mask [B, L] (1=removed), ids_restore)."""
        cls_tok = x[:, :1]
        x = x[:, 1:]
        pos_embed = self.vision_encoder.positional_embedding[None].astype(x.dtype)
        n, l, d = x.shape
        len_keep = int(l * (1 - mask_ratio))
        noise = jax.random.uniform(rng, (n, l))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x = x + pos_embed[:, 1:]
        x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((n, l), x.dtype).at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        cls_tok = cls_tok + pos_embed[:, :1]
        return jnp.concatenate([cls_tok, x_masked], axis=1), mask, ids_restore

    # -- core forward (reference infer, m3ae_module.py:203-312) -------------
    def infer(self, batch: Dict[str, jax.Array],
              mask_text: bool = False,
              mask_image: bool = False,
              image_token_type_idx: int = 1,
              img: Optional[jax.Array] = None,
              deterministic: bool = True,
              output_attentions: bool = False) -> Dict[str, jax.Array]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)

        if img is None:
            img_key = (f"image_{image_token_type_idx - 1}"
                       if f"image_{image_token_type_idx - 1}" in batch else "image")
            img = batch[img_key]
        do_mlm = "_mlm" if mask_text else ""
        text_ids = batch[f"text_ids{do_mlm}"]
        text_labels = batch.get(f"text_labels{do_mlm}")
        text_masks = batch["text_masks"]
        img = img.astype(dtype)

        ret: Dict[str, jax.Array] = {}

        # Text encoding
        ext_text_bias = extended_attention_mask(text_masks)
        uni_text = self.language_encoder(text_ids, ext_text_bias,
                                         deterministic=deterministic)
        uni_text = self.multi_modal_language_proj(uni_text.astype(dtype))

        # Image encoding
        if mask_image:
            tokens = self.vision_encoder.patch_embed(img)
            rng = self.make_rng("mim")
            tokens, mim_masks, mim_ids_restore = self.random_masking(
                tokens, cfg.mim_prob, rng)
            uni_image = self.vision_encoder.trans(tokens)
            ret["mim_masks"] = mim_masks
            ret["mim_ids_restore"] = mim_ids_restore
        else:
            if cfg.is_clip:
                uni_image = self.vision_encoder(img)
            else:
                # swin trains with stochastic depth (reference
                # swin_transformer.py:437 drop_path_rate=0.1 default)
                uni_image = self.vision_encoder(
                    img, deterministic=deterministic)
        uni_image = self.multi_modal_vision_proj(uni_image.astype(dtype))
        image_masks = jnp.ones(uni_image.shape[:2], jnp.int32)
        # image tokens are never padded (reference builds an all-ones mask,
        # m3ae_module.py:253) — a None bias skips streaming a zero tensor
        ext_image_bias = None

        # Modality-type embeddings
        type_emb = self.modality_type_embeddings
        uni_text = uni_text + type_emb(jnp.zeros_like(text_masks, jnp.int32)).astype(dtype)
        uni_image = uni_image + type_emb(
            jnp.full(image_masks.shape, image_token_type_idx, jnp.int32)).astype(dtype)

        # Multi-modal co-attention fusion
        # output_attentions mirrors the reference ret["attentions"] contract
        # (m3ae_module.py:210,267-283): per-layer lists of
        # (self_probs, cross_probs) tuples.  "image2text" = the vision
        # stream's cross-attention (image queries -> text keys,
        # [B, H, S_img, S_txt]); "text2image" the converse.  Unlike the
        # reference (which materializes probs unconditionally,
        # m3ae_module.py:276-277), the flag is static: when False the fused
        # kernels stream the softmax and no probs tensor is ever built.
        if output_attentions:
            ret["attentions"] = {"text2image_attns": [],
                                 "image2text_attns": []}
        else:
            # reference sets ret["attentions"] = None when the flag is off
            # (m3ae_module.py:210) — keep the key present so ported callers
            # that read it unconditionally see None, not KeyError.  None is
            # an empty pytree, so nothing extra flows through jit.
            ret["attentions"] = None
        x, y = uni_text, uni_image
        for layer_idx in range(cfg.num_top_layer):
            if mask_image and cfg.mim_layer == layer_idx:
                ret[f"multi_modal_text_feats_{layer_idx}"] = x
                ret[f"multi_modal_image_feats_{layer_idx}"] = y
            x1 = self.multi_modal_language_layers[layer_idx](
                x, y, ext_text_bias, ext_image_bias, deterministic,
                output_attentions)
            y1 = self.multi_modal_vision_layers[layer_idx](
                y, x, ext_image_bias, ext_text_bias, deterministic,
                output_attentions)
            if output_attentions:
                x1, t2i = x1
                y1, i2t = y1
                ret["attentions"]["text2image_attns"].append(t2i)
                ret["attentions"]["image2text_attns"].append(i2t)
            x, y = x1, y1

        text_cls = self.multi_modal_language_pooler(x)
        if cfg.is_clip:
            image_cls = self.multi_modal_vision_pooler(y)
        else:
            # Swin has no cls token: average-pool the sequence first
            # (reference vision_pooler branch, m3ae_module.py:292-295)
            avg = jnp.mean(y, axis=1, keepdims=True)
            image_cls = self.multi_modal_vision_pooler(avg)
        cls_feats = jnp.concatenate([text_cls, image_cls], axis=-1)

        ret.update({
            "images": img,
            "patched_images": patchify_image(img, cfg.patch_size),
            "text_ids": text_ids,
            "text_masks": text_masks,
            "multi_modal_text_feats": x,
            "multi_modal_image_feats": y,
            "multi_modal_cls_feats": cls_feats,
        })
        if text_labels is not None:
            ret["text_labels"] = text_labels
        return ret

    # -- split-phase encode (towers and fusion as separate jits) ------------
    # Mirrors the reference's split-phase vision forward
    # (clip_model.py:forward_pre/forward_post) at whole-model granularity:
    # each phase compiles to a much smaller XLA program than the monolithic
    # `infer`, which matters for remote-compilation limits and for
    # cache-friendly serving (encode towers once, fuse many times).
    # infer_text/infer_image/infer_fuse composed in order are numerically
    # identical to `infer` (tested in tests/test_golden.py).
    def infer_text(self, text_ids: jax.Array, text_masks: jax.Array,
                   deterministic: bool = True) -> jax.Array:
        """Text tower + projection (first half of `infer`'s text path)."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        ext_text_bias = extended_attention_mask(text_masks)
        uni_text = self.language_encoder(text_ids, ext_text_bias,
                                         deterministic=deterministic)
        return self.multi_modal_language_proj(uni_text.astype(dtype))

    def infer_image(self, img: jax.Array,
                    deterministic: bool = True) -> jax.Array:
        """Vision tower + projection (first half of `infer`'s image path)."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        uni_image = self.vision_encoder(img.astype(dtype))
        return self.multi_modal_vision_proj(uni_image.astype(dtype))

    def infer_fuse(self, uni_text: jax.Array, uni_image: jax.Array,
                   text_masks: jax.Array,
                   image_token_type_idx: int = 1,
                   deterministic: bool = True) -> Dict[str, jax.Array]:
        """Modality-type embeddings + co-attention fusion + poolers
        (second half of `infer`, m3ae_module.py:258-295)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        ext_text_bias = extended_attention_mask(text_masks)
        ext_image_bias = None  # image tokens are never padded (infer)

        type_emb = self.modality_type_embeddings
        uni_text = uni_text + type_emb(
            jnp.zeros_like(text_masks, jnp.int32)).astype(dtype)
        uni_image = uni_image + type_emb(jnp.full(
            uni_image.shape[:2], image_token_type_idx, jnp.int32)).astype(dtype)

        x, y = uni_text, uni_image
        for layer_idx in range(cfg.num_top_layer):
            x1 = self.multi_modal_language_layers[layer_idx](
                x, y, ext_text_bias, ext_image_bias, deterministic)
            y1 = self.multi_modal_vision_layers[layer_idx](
                y, x, ext_image_bias, ext_text_bias, deterministic)
            x, y = x1, y1

        text_cls = self.multi_modal_language_pooler(x)
        if cfg.is_clip:
            image_cls = self.multi_modal_vision_pooler(y)
        else:
            avg = jnp.mean(y, axis=1, keepdims=True)
            image_cls = self.multi_modal_vision_pooler(avg)
        cls_feats = jnp.concatenate([text_cls, image_cls], axis=-1)
        return {
            "multi_modal_text_feats": x,
            "multi_modal_image_feats": y,
            "multi_modal_cls_feats": cls_feats,
        }

    # -- heads as callable methods (for apply(..., method=...)) -------------
    def apply_vqa_head(self, cls_feats: jax.Array) -> jax.Array:
        return self.vqa_head(cls_feats)

    def apply_mlm_head(self, text_feats: jax.Array) -> jax.Array:
        return self.mlm_head(text_feats)

    def apply_mim_head(self, image_feats: jax.Array,
                       ids_restore: jax.Array) -> jax.Array:
        return self.mim_head(image_feats, ids_restore)

    def apply_itm_head(self, cls_feats: jax.Array) -> jax.Array:
        return self.itm_head(cls_feats)

    def apply_cls_head(self, cls_feats: jax.Array) -> jax.Array:
        return self.cls_head(cls_feats)

    def apply_irtr_head(self, cls_feats: jax.Array) -> jax.Array:
        return self.irtr_head(cls_feats)

    def __call__(self, batch: Dict[str, jax.Array],
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        """Plain forward = infer (used for nn.init of every submodule)."""
        ret = self.infer(batch, deterministic=deterministic)
        cfg = self.cfg
        # Touch every head once so init creates their params.
        if cfg.use_vqa_head:
            ret["vqa_logits"] = self.apply_vqa_head(ret["multi_modal_cls_feats"])
        if cfg.use_mlm_head:
            ret["mlm_logits"] = self.apply_mlm_head(ret["multi_modal_text_feats"])
        if cfg.use_itm_head:
            ret["itm_logits"] = self.apply_itm_head(ret["multi_modal_cls_feats"])
        if cfg.use_cls_head:
            ret["cls_logits"] = self.apply_cls_head(ret["multi_modal_cls_feats"])
        if cfg.use_irtr_head:
            ret["irtr_score"] = self.apply_irtr_head(ret["multi_modal_cls_feats"])
        if cfg.use_mim_head:
            n_patches = (cfg.image_size // cfg.patch_size) ** 2
            len_keep = int(n_patches * (1 - cfg.mim_prob))
            b = ret["multi_modal_image_feats"].shape[0]
            dummy_feats = ret["multi_modal_image_feats"][:, :1 + len_keep]
            dummy_restore = jnp.tile(jnp.arange(n_patches)[None], (b, 1))
            ret["mim_logits"] = self.apply_mim_head(dummy_feats, dummy_restore)
        return ret
