"""Torch <-> JAX checkpoint conversion for M3AE.

The reference saves PyTorch-Lightning ``.ckpt`` files whose ``state_dict``
uses torch module paths like
``vision_encoder.visual.transformer.resblocks.3.attn.in_proj_weight`` and
``language_encoder.encoder.layer.5.attention.self.query.weight``
(reference m3ae_module.py:104-142 load path).  This module maps those names
onto the flax param tree bidirectionally so reference checkpoints load
unchanged (and our checkpoints can be exported back for the reference).

Transforms applied per tensor kind:
  linear   : torch [out, in] -> flax kernel [in, out] (transpose)
  packed   : torch MHA in_proj [3d, d] -> flax in_proj_kernel [d, 3d]
  patch    : torch conv [width, 3, p, p] -> flax patch matmul [p*p*3, width]
             flattened in (row, col, channel) order (clip_vit.patchify_image)
  direct   : embeddings / LayerNorm / biases / 1-d params

Loading follows the reference's ``strict=False`` semantics: extra torch
keys are ignored, missing flax leaves keep their fresh init, and the CLIP
position embedding is bicubic-re-interpolated to the configured resolution
(clip_model.py:224-251) before the copy.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from mm_vqa_healthcare_tpu.checkpoint.interpolate import (
    adapt_clip_position_embedding)

FlatParams = Dict[Tuple[str, ...], np.ndarray]


def flatten(params) -> FlatParams:
    from flax.traverse_util import flatten_dict
    return dict(flatten_dict(params))


def unflatten(flat: FlatParams):
    from flax.traverse_util import unflatten_dict
    return unflatten_dict(flat)


# ---------------------------------------------------------------------------
# name mapping: torch key -> (flax path, transform)
# ---------------------------------------------------------------------------

def _ln(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", flax_path + ("scale",), "direct"),
        (f"{torch_prefix}.bias", flax_path + ("bias",), "direct"),
    ]


def _linear(torch_prefix: str, flax_path: Tuple[str, ...]):
    return [
        (f"{torch_prefix}.weight", flax_path + ("kernel",), "linear"),
        (f"{torch_prefix}.bias", flax_path + ("bias",), "direct"),
    ]


def _bert_self_attention(tp: str, fp: Tuple[str, ...]):
    rules = []
    for name in ("query", "key", "value"):
        rules += _linear(f"{tp}.self.{name}", fp + ("self", name))
    rules += _linear(f"{tp}.output.dense", fp + ("output", "dense"))
    rules += _ln(f"{tp}.output.LayerNorm", fp + ("output", "LayerNorm"))
    return rules


def _bert_layer(tp: str, fp: Tuple[str, ...], cross: bool):
    rules = _bert_self_attention(f"{tp}.attention", fp + ("attention",))
    if cross:
        rules += _bert_self_attention(f"{tp}.crossattention", fp + ("crossattention",))
    rules += _linear(f"{tp}.intermediate.dense", fp + ("intermediate", "dense"))
    rules += _linear(f"{tp}.output.dense", fp + ("output", "dense"))
    rules += _ln(f"{tp}.output.LayerNorm", fp + ("output", "LayerNorm"))
    return rules


def _clip_block(tp: str, fp: Tuple[str, ...]):
    return [
        (f"{tp}.attn.in_proj_weight", fp + ("attn", "in_proj_kernel"), "packed"),
        (f"{tp}.attn.in_proj_bias", fp + ("attn", "in_proj_bias"), "direct"),
        *_linear(f"{tp}.attn.out_proj", fp + ("attn", "out_proj")),
        *_ln(f"{tp}.ln_1", fp + ("ln_1",)),
        *_linear(f"{tp}.mlp.c_fc", fp + ("c_fc",)),
        *_linear(f"{tp}.mlp.c_proj", fp + ("c_proj",)),
        *_ln(f"{tp}.ln_2", fp + ("ln_2",)),
    ]


def _pooler(tp: str, fp: Tuple[str, ...]):
    return _linear(f"{tp}.dense", fp + ("dense",))


def build_rules(cfg) -> list:
    """Full (torch key, flax path, transform) rule list for an M3AEConfig."""
    from mm_vqa_healthcare_tpu.models.bert import text_encoder_config
    from mm_vqa_healthcare_tpu.models.clip_vit import clip_vit_config

    rules = []

    # -- text tower ----------------------------------------------------------
    text_cfg = text_encoder_config(cfg.tokenizer)
    emb = ("language_encoder", "embeddings")
    rules += [
        ("language_encoder.embeddings.word_embeddings.weight",
         emb + ("word_embeddings", "embedding"), "direct"),
        ("language_encoder.embeddings.position_embeddings.weight",
         emb + ("position_embeddings", "embedding"), "direct"),
        ("language_encoder.embeddings.token_type_embeddings.weight",
         emb + ("token_type_embeddings", "embedding"), "direct"),
    ]
    rules += _ln("language_encoder.embeddings.LayerNorm", emb + ("LayerNorm",))
    for i in range(text_cfg.num_layers):
        rules += _bert_layer(f"language_encoder.encoder.layer.{i}",
                             ("language_encoder", f"layer_{i}"), cross=False)

    # -- vision tower (CLIP) -------------------------------------------------
    if cfg.is_clip:
        vit_cfg = clip_vit_config(cfg.vit, cfg.image_size)
        v = ("vision_encoder",)
        rules += [
            ("vision_encoder.visual.conv1.weight", v + ("patch_kernel",), "patch"),
            ("vision_encoder.visual.class_embedding", v + ("class_embedding",), "direct"),
            ("vision_encoder.visual.positional_embedding",
             v + ("positional_embedding",), "clip_pos"),
        ]
        rules += _ln("vision_encoder.visual.ln_pre", v + ("ln_pre",))
        rules += _ln("vision_encoder.visual.ln_post", v + ("ln_post",))
        for i in range(vit_cfg.layers - 1):   # layers-1 quirk (clip_model.py:71)
            rules += _clip_block(
                f"vision_encoder.visual.transformer.resblocks.{i}",
                v + ("transformer", f"resblocks_{i}"))
    else:
        rules += swin_rules(cfg)

    # -- projections / type embeddings / fusion ------------------------------
    rules += _linear("multi_modal_language_proj", ("multi_modal_language_proj",))
    rules += _linear("multi_modal_vision_proj", ("multi_modal_vision_proj",))
    rules += [("modality_type_embeddings.weight",
               ("modality_type_embeddings", "embedding"), "direct")]
    for i in range(cfg.num_top_layer):
        rules += _bert_layer(f"multi_modal_language_layers.{i}",
                             (f"multi_modal_language_layers_{i}",), cross=True)
        rules += _bert_layer(f"multi_modal_vision_layers.{i}",
                             (f"multi_modal_vision_layers_{i}",), cross=True)
    rules += _pooler("multi_modal_language_pooler", ("multi_modal_language_pooler",))
    rules += _pooler("multi_modal_vision_pooler", ("multi_modal_vision_pooler",))

    # -- heads ---------------------------------------------------------------
    if cfg.use_vqa_head:
        rules += _linear("vqa_head.0", ("vqa_head", "fc1"))
        rules += _ln("vqa_head.1", ("vqa_head", "ln"))
        rules += _linear("vqa_head.3", ("vqa_head", "fc2"))
    if cfg.use_mlm_head:
        rules += _linear("mlm_head.transform.dense", ("mlm_head", "transform_dense"))
        rules += _ln("mlm_head.transform.LayerNorm", ("mlm_head", "transform_LayerNorm"))
        rules += [("mlm_head.decoder.weight", ("mlm_head", "decoder", "kernel"), "linear"),
                  ("mlm_head.bias", ("mlm_head", "bias"), "direct")]
    if cfg.use_itm_head:
        rules += _linear("itm_head.fc", ("itm_head", "fc"))
    if getattr(cfg, "use_cls_head", False):
        rules += _linear("cls_head.0", ("cls_head", "fc1"))
        rules += _ln("cls_head.1", ("cls_head", "ln"))
        rules += _linear("cls_head.3", ("cls_head", "fc2"))
    if getattr(cfg, "use_irtr_head", False):
        rules += _linear("irtr_head", ("irtr_head",))
    if cfg.use_mim_head:
        m = ("mim_head",)
        rules += _linear("mim_head.decoder_embed", m + ("decoder_embed",))
        rules += [("mim_head.mask_token", m + ("mask_token",), "direct")]
        for i in range(cfg.mim_decoder_num_layers):  # (n+1)-1 blocks built
            rules += _clip_block(f"mim_head.decoder.resblocks.{i}",
                                 m + ("decoder", f"resblocks_{i}"))
        rules += _ln("mim_head.decoder_norm", m + ("decoder_norm",))
        rules += _linear("mim_head.decoder_pred", m + ("decoder_pred",))
    return rules


def swin_rules(cfg) -> list:
    """Swin tower rules (timm names under the reference's vision_encoder.
    prefix; rel-pos bias tables re-interpolated to the configured window
    like swin_adapt_position_encoding, swin_helpers.py:18-42)."""
    from mm_vqa_healthcare_tpu.models.swin import swin_config
    scfg = swin_config(cfg.vit, cfg.image_size)
    v = ("vision_encoder",)
    rules = [
        ("vision_encoder.patch_embed.proj.weight", v + ("patch_kernel",), "patch"),
        ("vision_encoder.patch_embed.proj.bias", v + ("patch_bias",), "direct"),
    ]
    rules += _ln("vision_encoder.patch_embed.norm", v + ("patch_norm",))
    for i, depth in enumerate(scfg.depths):
        for j in range(depth):
            tp = f"vision_encoder.layers.{i}.blocks.{j}"
            fp = v + (f"layers_{i}_blocks_{j}",)
            rules += _ln(f"{tp}.norm1", fp + ("norm1",))
            rules += _linear(f"{tp}.attn.qkv", fp + ("attn", "qkv"))
            rules += [(f"{tp}.attn.relative_position_bias_table",
                       fp + ("attn", "relative_position_bias_table"),
                       "swin_relpos")]
            rules += _linear(f"{tp}.attn.proj", fp + ("attn", "proj"))
            rules += _ln(f"{tp}.norm2", fp + ("norm2",))
            rules += _linear(f"{tp}.mlp.fc1", fp + ("fc1",))
            rules += _linear(f"{tp}.mlp.fc2", fp + ("fc2",))
        if i < len(scfg.depths) - 1:
            tp = f"vision_encoder.layers.{i}.downsample"
            fp = v + (f"layers_{i}_downsample",)
            rules += [(f"{tp}.reduction.weight",
                       fp + ("reduction", "kernel"), "linear")]
            rules += _ln(f"{tp}.norm", fp + ("norm",))
    rules += _ln("vision_encoder.norm", v + ("norm",))
    # stash the target window size for the swin_relpos transform
    for idx, (tk, fp, tr) in enumerate(rules):
        if tr == "swin_relpos":
            rules[idx] = (tk, fp, ("swin_relpos", scfg.window_size))
    return rules


def _adapt_swin_relpos(table: np.ndarray, target_window: int) -> np.ndarray:
    """Bicubic re-interp of a [(2w-1)^2, heads] relative-position-bias
    table to a new window size (swin_helpers.py:18-42)."""
    from mm_vqa_healthcare_tpu.checkpoint.interpolate import bicubic_resize_2d
    n, heads = table.shape
    src = int(round(n ** 0.5))
    dst = 2 * target_window - 1
    if src == dst:
        return table
    grid = table.reshape(src, src, heads)
    return bicubic_resize_2d(grid, dst, dst).reshape(dst * dst, heads)


def build_decoder_head_rules(num_layers: int = 6) -> list:
    """Rules for the generative decoder head's own state_dict
    (reference Decoder, m3ae_decoder.py:93-138; loaded standalone from
    decoder_load_path's 'model_state_dict', m3ae_decoder.py:207-211)."""
    rules = [
        ("target_embedding.weight", ("target_embedding", "embedding"), "direct"),
        *_linear("final_linear", ("final_linear",)),
    ]
    for i in range(num_layers):
        tp = f"dec_layers.{i}"
        fp = (f"dec_layers_{i}",)
        rules += [
            (f"{tp}.mha1.in_proj_weight", fp + ("mha1", "in_proj_kernel"), "packed"),
            (f"{tp}.mha1.in_proj_bias", fp + ("mha1", "in_proj_bias"), "direct"),
            *_linear(f"{tp}.mha1.out_proj", fp + ("mha1", "out_proj")),
            (f"{tp}.mha2.in_proj_weight", fp + ("mha2", "in_proj_kernel"), "packed"),
            (f"{tp}.mha2.in_proj_bias", fp + ("mha2", "in_proj_bias"), "direct"),
            *_linear(f"{tp}.mha2.out_proj", fp + ("mha2", "out_proj")),
            *_linear(f"{tp}.ffn.0", fp + ("ffn1",)),
            *_linear(f"{tp}.ffn.2", fp + ("ffn2",)),
            *_ln(f"{tp}.pre_norm", fp + ("pre_norm",)),
            *_ln(f"{tp}.layernorm1", fp + ("layernorm1",)),
            *_ln(f"{tp}.layernorm2", fp + ("layernorm2",)),
            *_ln(f"{tp}.layernorm3", fp + ("layernorm3",)),
        ]
    return rules


def build_t5_rules(num_layers: int = 6, num_decoder_layers: int = 6,
                   prefix: str = "") -> list:
    """HF T5ForConditionalGeneration state_dict -> our T5 flax tree
    (reference loads 't5.*' keys from PL checkpoints,
    m3ae_t5_mm_encoder_input.py:70-71)."""
    def lin(tp, fp):
        return [(f"{prefix}{tp}.weight", fp + ("kernel",), "linear")]

    def lnw(tp, fp):
        return [(f"{prefix}{tp}.weight", fp + ("weight",), "direct")]

    rules = [(f"{prefix}shared.weight", ("shared", "embedding"), "direct")]
    for i in range(num_layers):
        tb, fb = f"encoder.block.{i}", (f"encoder_block_{i}",)
        for m in ("q", "k", "v", "o"):
            rules += lin(f"{tb}.layer.0.SelfAttention.{m}",
                         fb + ("self_attn", m))
        if i == 0:
            rules += [(f"{prefix}{tb}.layer.0.SelfAttention."
                       "relative_attention_bias.weight",
                       fb + ("self_attn", "relative_attention_bias",
                             "embedding"), "direct")]
        rules += lnw(f"{tb}.layer.0.layer_norm", fb + ("self_ln",))
        rules += lin(f"{tb}.layer.1.DenseReluDense.wi", fb + ("ff", "wi"))
        rules += lin(f"{tb}.layer.1.DenseReluDense.wo", fb + ("ff", "wo"))
        rules += lnw(f"{tb}.layer.1.layer_norm", fb + ("ff", "layer_norm"))
    rules += lnw("encoder.final_layer_norm", ("encoder_final_ln",))
    for i in range(num_decoder_layers):
        tb, fb = f"decoder.block.{i}", (f"decoder_block_{i}",)
        for m in ("q", "k", "v", "o"):
            rules += lin(f"{tb}.layer.0.SelfAttention.{m}",
                         fb + ("self_attn", m))
        if i == 0:
            rules += [(f"{prefix}{tb}.layer.0.SelfAttention."
                       "relative_attention_bias.weight",
                       fb + ("self_attn", "relative_attention_bias",
                             "embedding"), "direct")]
        rules += lnw(f"{tb}.layer.0.layer_norm", fb + ("self_ln",))
        for m in ("q", "k", "v", "o"):
            rules += lin(f"{tb}.layer.1.EncDecAttention.{m}",
                         fb + ("cross_attn", m))
        rules += lnw(f"{tb}.layer.1.layer_norm", fb + ("cross_ln",))
        rules += lin(f"{tb}.layer.2.DenseReluDense.wi", fb + ("ff", "wi"))
        rules += lin(f"{tb}.layer.2.DenseReluDense.wo", fb + ("ff", "wo"))
        rules += lnw(f"{tb}.layer.2.layer_norm", fb + ("ff", "layer_norm"))
    rules += lnw("decoder.final_layer_norm", ("decoder_final_ln",))
    return rules


def load_t5_state_dict(state_dict: Dict[str, np.ndarray], init_params,
                       num_layers: int = 6, num_decoder_layers: int = 6,
                       torch_prefix: str = "", flax_prefix: Tuple[str, ...] = ()):
    """Copy HF-T5 tensors into (a subtree of) a flax param tree."""
    flat = flatten({"params": init_params["params"]})
    rules = build_t5_rules(num_layers, num_decoder_layers, torch_prefix)
    loaded = []
    for tk, fp, tr in rules:
        if tk not in state_dict:
            continue
        path = ("params",) + flax_prefix + fp
        flat[path] = _to_flax(np.asarray(state_dict[tk]), tr,
                              None).astype(np.float32)
        loaded.append(tk)
    return unflatten(flat), loaded


def build_decoder_model_rules(dec_cfg) -> list:
    """Rules for a full DecoderVQAModel tree (PL checkpoints of the
    reference DecoderModel save 'm3ae.*' + 'decoder.*' keys)."""
    rules = [("m3ae." + tk, ("m3ae",) + fp, tr)
             for tk, fp, tr in build_rules(dec_cfg.m3ae)]
    rules += [("decoder." + tk, ("decoder",) + fp, tr)
              for tk, fp, tr in build_decoder_head_rules(
                  dec_cfg.decoder.num_layers)]
    return rules


def load_decoder_head_checkpoint(path: str, init_params, num_layers: int = 6):
    """Load a standalone decoder ckpt (decoder_load_path semantics) into the
    'decoder' subtree of DecoderVQAModel params."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    flat = flatten({"params": init_params["params"]})
    loaded = []
    for tk, fp, tr in build_decoder_head_rules(num_layers):
        if tk in sd:
            flat[("params", "decoder") + fp] = _to_flax(
                np.asarray(sd[tk]), tr, None).astype(np.float32)
            loaded.append(tk)
    return unflatten(flat), loaded


def _to_flax(value: np.ndarray, transform, cfg) -> np.ndarray:
    if isinstance(transform, tuple) and transform[0] == "swin_relpos":
        return _adapt_swin_relpos(value, transform[1])
    if transform == "direct":
        return value
    if transform in ("linear", "packed"):
        return np.ascontiguousarray(value.T)
    if transform == "patch":
        width = value.shape[0]
        return np.ascontiguousarray(
            value.transpose(2, 3, 1, 0).reshape(-1, width))
    if transform == "clip_pos":
        return adapt_clip_position_embedding(value, cfg.patch_size, cfg.image_size)
    raise ValueError(transform)


def _to_torch(value: np.ndarray, transform, cfg) -> np.ndarray:
    if isinstance(transform, tuple) and transform[0] == "swin_relpos":
        return value
    if transform in ("direct", "clip_pos"):
        return value
    if transform in ("linear", "packed"):
        return np.ascontiguousarray(value.T)
    if transform == "patch":
        width = value.shape[-1]
        p = cfg.patch_size
        return np.ascontiguousarray(
            value.reshape(p, p, 3, width).transpose(3, 2, 0, 1))
    raise ValueError(transform)


def torch_state_dict_to_params(state_dict: Dict[str, np.ndarray], cfg,
                               init_params=None, strict: bool = False):
    """Map a reference state_dict onto flax params.

    init_params: a freshly initialized param tree; leaves present in the
    state_dict are replaced (strict=False load, m3ae_module.py:113).  If
    None, a tree containing only the mapped leaves is returned.
    """
    rules = build_rules(cfg)
    flat = flatten({"params": init_params["params"]}) if init_params else {}
    loaded, missing = [], []
    for torch_key, flax_path, transform in rules:
        if torch_key not in state_dict:
            missing.append(torch_key)
            continue
        value = np.asarray(state_dict[torch_key])
        full_path = ("params",) + flax_path
        new_value = _to_flax(value, transform, cfg).astype(np.float32)
        if init_params is not None and full_path in flat:
            expected = flat[full_path].shape
            if tuple(new_value.shape) != tuple(expected):
                raise ValueError(
                    f"Shape mismatch for {torch_key}: torch {value.shape} -> "
                    f"{new_value.shape}, flax expects {expected}")
        flat[full_path] = new_value
        loaded.append(torch_key)
    if strict and missing:
        raise KeyError(f"Missing {len(missing)} keys, e.g. {missing[:5]}")
    return unflatten(flat), loaded, missing


def params_to_torch_state_dict(params, cfg) -> Dict[str, np.ndarray]:
    """Export flax params as a reference-layout torch state_dict (numpy)."""
    rules = build_rules(cfg)
    flat = flatten({"params": params["params"]})
    out: Dict[str, np.ndarray] = {}
    for torch_key, flax_path, transform in rules:
        full_path = ("params",) + flax_path
        if full_path not in flat:
            continue
        out[torch_key] = _to_torch(np.asarray(flat[full_path]), transform, cfg)
    return out


def bootstrap_vision_tower(cfg, init_params, path: str = None,
                           cache_dir: str = None):
    """Cold-start the vision tower from public pretrained weights — the
    reference's CLIP `build_model` download path (clip_model.py:259-276)
    and timm Swin `load_pretrained` (swin_helpers.py:181-416).  Raw tower
    state dicts (CLIP torchscript archives / timm pickles) carry keys
    without the `vision_encoder.` wrapper prefix the converter rules use;
    this prefixes and routes them through torch_state_dict_to_params
    (pos-embed / rel-pos-bias re-interp included)."""
    from mm_vqa_healthcare_tpu.checkpoint.fetch import (
        fetch_pretrained, load_state_dict)
    path = path or fetch_pretrained(cfg.vit, cache_dir)
    sd = load_state_dict(path)
    sd = {(k if k.startswith("vision_encoder.")
           else f"vision_encoder.{k}"): v for k, v in sd.items()}
    return torch_state_dict_to_params(sd, cfg, init_params)


def bootstrap_text_tower(cfg, init_params, path: str):
    """Cold-start the text tower from an HF-format torch state_dict (the
    reference's `BertModel.from_pretrained` cold start) — HF keys
    (`embeddings.*`, `encoder.layer.*`) get the `language_encoder.`
    prefix the converter rules use."""
    from mm_vqa_healthcare_tpu.checkpoint.fetch import load_state_dict
    sd = load_state_dict(path)
    sd = {(k if k.startswith("language_encoder.")
           else f"language_encoder.{k.removeprefix('bert.')}"): v
          for k, v in sd.items()}
    return torch_state_dict_to_params(sd, cfg, init_params)


def load_reference_checkpoint(path: str, cfg, init_params):
    """Load a reference PL .ckpt (or raw state_dict file) into flax params.

    Mirrors the reference load path: torch.load -> ["state_dict"] ->
    adapt_position_encoding -> load_state_dict(strict=False)
    (m3ae_module.py:104-142).

    Native `.msgpack` checkpoints (this framework's best/last saves) are
    dispatched to the flax loader so the same `load_path` config key
    round-trips both formats (serving CLI, test-only runs, resume).
    """
    if path.endswith(".msgpack"):
        from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
        params = ckpt_io.load_native(path, init_params)
        loaded = [".".join(str(p) for p in k) for k in flatten(params)]
        return params, loaded, []
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state_np = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in state_dict.items()}
    return torch_state_dict_to_params(state_np, cfg, init_params)
