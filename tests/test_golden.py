"""Golden-value regression tests.

Freezes the numerics of the core model paths (seed-0 tiny M3AE forward,
decoder teacher-forced logits, T5 logits) against committed golden arrays —
any future refactor that changes outputs beyond tolerance fails here.
Regenerate intentionally with:  python tests/test_golden.py regen
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_values.npz")


def _tiny_m3ae_outputs():
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=2, input_image_embed_size=64,
                     input_text_embed_size=64, vqa_label_size=7,
                     attention_impl="xla")
    model = M3AE(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, 200, (2, 8)), jnp.int32),
        "text_masks": jnp.asarray([[1] * 8, [1] * 5 + [0] * 3], jnp.int32),
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    out = model.apply(params, batch, method=M3AE.infer)
    logits = model.apply(params, out["multi_modal_cls_feats"],
                         method=M3AE.apply_vqa_head)
    return {
        "m3ae_cls_feats": np.asarray(out["multi_modal_cls_feats"]),
        "m3ae_vqa_logits": np.asarray(logits),
    }


def _tiny_decoder_outputs():
    from mm_vqa_healthcare_tpu.models.decoder import Decoder, DecoderConfig
    cfg = DecoderConfig(num_layers=2, d_model=32, num_heads=2, d_ff=64,
                        dropout=0.1, max_len=10, vocab_size=30,
                        bug_compat=True, attention_impl="xla")
    dec = Decoder(cfg)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 30, (2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    enc = jnp.asarray(rng.normal(size=(2, 3, 32)), jnp.float32)
    params = dec.init(jax.random.key(0), tokens, mask, enc)
    return {"decoder_logits": np.asarray(dec.apply(params, tokens, mask, enc))}


def _tiny_t5_outputs():
    from mm_vqa_healthcare_tpu.models.t5 import T5, T5Config
    cfg = T5Config(vocab_size=50, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                   num_layers=2, num_decoder_layers=2, dropout_rate=0.0)
    model = T5(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(2, 50, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), jnp.int32)
    labels = jnp.asarray(rng.integers(2, 50, (2, 4)), jnp.int32)
    params = model.init(jax.random.key(0), input_ids=ids,
                        attention_mask=mask, labels=labels)
    return {"t5_logits": np.asarray(
        model.apply(params, input_ids=ids, attention_mask=mask,
                    labels=labels))}


def _compute_all():
    out = {}
    out.update(_tiny_m3ae_outputs())
    out.update(_tiny_decoder_outputs())
    out.update(_tiny_t5_outputs())
    return out


@pytest.mark.skipif(not os.path.isfile(GOLDEN),
                    reason="golden file not generated yet")
def test_split_encode_matches_infer():
    """infer_text/infer_image/infer_fuse composed == monolithic infer
    (the split-phase serving/bench path must be numerically identical)."""
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=2, input_image_embed_size=64,
                     input_text_embed_size=64, vqa_label_size=7,
                     attention_impl="xla")
    model = M3AE(cfg)
    rng = np.random.default_rng(3)
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, 200, (2, 8)), jnp.int32),
        "text_masks": jnp.asarray([[1] * 8, [1] * 6 + [0] * 2], jnp.int32),
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    whole = model.apply(params, batch, method=M3AE.infer)
    ut = model.apply(params, batch["text_ids"], batch["text_masks"],
                     method=M3AE.infer_text)
    ui = model.apply(params, batch["image"], method=M3AE.infer_image)
    fused = model.apply(params, ut, ui, batch["text_masks"],
                        method=M3AE.infer_fuse)
    for key in ("multi_modal_text_feats", "multi_modal_image_feats",
                "multi_modal_cls_feats"):
        np.testing.assert_array_equal(np.asarray(fused[key]),
                                      np.asarray(whole[key]), err_msg=key)


def test_golden_values():
    golden = dict(np.load(GOLDEN))
    current = _compute_all()
    assert set(golden) == set(current)
    for key in golden:
        np.testing.assert_allclose(
            current[key], golden[key], atol=2e-4, rtol=2e-4,
            err_msg=f"golden mismatch: {key} — if intentional, regenerate "
                    f"with `python tests/test_golden.py regen`")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        np.savez(GOLDEN, **_compute_all())
        print(f"wrote {GOLDEN}")
