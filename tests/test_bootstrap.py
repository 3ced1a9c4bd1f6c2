"""Pretrained-tower cold-start (bootstrap_vision_tower /
bootstrap_text_tower): raw CLIP-style and HF-style state dicts — keys
WITHOUT the reference wrapper prefixes — land on the right flax leaves.
(Value-level conversion correctness is covered by the torch-oracle tower
parity tests in tests/test_checkpoint.py; here we prove the raw-file
plumbing the reference gets from its download helpers.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.checkpoint import convert
from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=2, input_image_embed_size=64,
                     input_text_embed_size=64, vqa_label_size=7,
                     attention_impl="xla")
    model = M3AE(cfg)
    batch = {
        "text_ids": jnp.ones((1, 6), jnp.int32),
        "text_masks": jnp.ones((1, 6), jnp.int32),
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    return cfg, params


def test_bootstrap_vision_tower_raw_clip_file(tiny, tmp_path):
    torch = pytest.importorskip("torch")
    cfg, params = tiny
    flat = convert.flatten({"params": params["params"]})
    cls_shape = flat[("params", "vision_encoder", "class_embedding")].shape
    pos_shape = flat[("params", "vision_encoder",
                      "positional_embedding")].shape
    rng = np.random.default_rng(0)
    # raw CLIP archives carry `visual.*` keys — no vision_encoder. prefix
    sd = {
        "visual.class_embedding": torch.from_numpy(
            rng.normal(size=cls_shape).astype(np.float32)),
        "visual.positional_embedding": torch.from_numpy(
            rng.normal(size=pos_shape).astype(np.float32)),
        "visual.ln_pre.weight": torch.ones(cls_shape[0]),
        "visual.ln_pre.bias": torch.zeros(cls_shape[0]),
    }
    path = str(tmp_path / "raw_clip.pt")
    torch.save(sd, path)

    new_params, loaded, missing = convert.bootstrap_vision_tower(
        cfg, params, path=path)
    assert "vision_encoder.visual.class_embedding" in loaded
    assert "vision_encoder.visual.positional_embedding" in loaded
    new_flat = convert.flatten({"params": new_params["params"]})
    np.testing.assert_allclose(
        new_flat[("params", "vision_encoder", "class_embedding")],
        sd["visual.class_embedding"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        new_flat[("params", "vision_encoder", "positional_embedding")],
        sd["visual.positional_embedding"].numpy(), rtol=1e-6)
    # untouched leaves keep their random init
    np.testing.assert_array_equal(
        new_flat[("params", "multi_modal_vision_proj", "kernel")],
        flat[("params", "multi_modal_vision_proj", "kernel")])


def test_bootstrap_text_tower_hf_keys(tiny, tmp_path):
    torch = pytest.importorskip("torch")
    cfg, params = tiny
    flat = convert.flatten({"params": params["params"]})
    emb_shape = flat[("params", "language_encoder", "embeddings",
                      "word_embeddings", "embedding")].shape
    rng = np.random.default_rng(1)
    # HF BertModel state dicts use bare `embeddings.*` keys (or
    # `bert.embeddings.*` inside task checkpoints)
    w = rng.normal(size=emb_shape).astype(np.float32)
    for raw_key in ("embeddings.word_embeddings.weight",
                    "bert.embeddings.word_embeddings.weight"):
        path = str(tmp_path / f"{raw_key.split('.')[0]}.pth")
        torch.save({raw_key: torch.from_numpy(w)}, path)
        new_params, loaded, _ = convert.bootstrap_text_tower(
            cfg, params, path)
        assert "language_encoder.embeddings.word_embeddings.weight" in loaded
        new_flat = convert.flatten({"params": new_params["params"]})
        np.testing.assert_allclose(
            new_flat[("params", "language_encoder", "embeddings",
                      "word_embeddings", "embedding")], w, rtol=1e-6)
