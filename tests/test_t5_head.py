"""T5 VQA head integration tests at debug scale (mm / combined variants):
soft-prompt assembly shapes, end-to-end fine-tune step, beam-search test
path using the tiny WordPiece tokenizer as a stand-in T5 tokenizer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def vqa_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("t5_fixture")
    return fixtures.make_vqa_fixture(str(root))


def _t5_cfg_tiny():
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    return T5Config(vocab_size=200, d_model=32, d_kv=8, num_heads=4,
                    d_ff=64, num_layers=2, num_decoder_layers=2)


def _trainer(vqa_data, variant, **overrides):
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, t5_max_length=8,
                               unfreeze_num_encoder_layers=1,
                               unfreeze_num_decoder_layers=1,
                               **overrides)
    tok = load_tokenizer("tiny-bert", vocab)
    # stand-in T5 tokenizer: WordPiece with SEP acting as EOS
    t = T5Trainer(cfg, variant=variant, tokenizer=tok)
    # shrink the T5 stack
    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    t5_mod.T5_PRESETS["t5-small"] = _t5_cfg_tiny()
    return t


@pytest.mark.parametrize("variant", ["mm", "combined", "text"])
def test_prepare_inputs_shapes(vqa_data, variant):
    t = _trainer(vqa_data, variant)
    t.setup_data()
    t.init_params()
    cfg = t.config
    b = 2
    batch = {
        "text_ids": jnp.ones((b, cfg["max_text_len"]), jnp.int32),
        "text_masks": jnp.ones((b, cfg["max_text_len"]), jnp.int32),
        "image": jnp.zeros((b, cfg["image_size"], cfg["image_size"], 3)),
        "t5_question_ids": jnp.ones((b, cfg["max_text_len"]), jnp.int32),
    }
    from mm_vqa_healthcare_tpu.models.t5_heads import T5VQAModel
    embeds, mask = t.model.apply(t.params, batch, jax.random.key(0),
                                 method=T5VQAModel.prepare_inputs)
    assert embeds.shape == (b, 512, 32)
    # reference: all-ones over the padded 512 — represented as mask=None
    # (exactly a zero additive bias) so the encoder kernel streams only
    # the shared relative-position bias
    assert mask is None


def test_encode_from_matches_encode(vqa_data):
    """Split-phase encode (M3AE towers -> encode_from) == monolithic encode
    bitwise; validates the t5_beam serving/bench path."""
    t = _trainer(vqa_data, "mm")
    t.setup_data()
    t.init_params()
    cfg = t.config
    b = 2
    rng = np.random.default_rng(5)
    batch = {
        "text_ids": jnp.asarray(
            rng.integers(1, 100, (b, cfg["max_text_len"])), jnp.int32),
        "text_masks": jnp.ones((b, cfg["max_text_len"]), jnp.int32),
        "image": jnp.asarray(rng.normal(
            size=(b, cfg["image_size"], cfg["image_size"], 3)), jnp.float32),
    }
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE
    from mm_vqa_healthcare_tpu.models.t5_heads import T5VQAModel
    key = jax.random.key(7)
    enc_a, mask_a = t.model.apply(t.params, batch, key,
                                  method=T5VQAModel.encode)
    m3ae_params = {"params": t.params["params"]["m3ae"]}
    m3ae = M3AE(t.model_cfg.m3ae)
    ut = m3ae.apply(m3ae_params, batch["text_ids"], batch["text_masks"],
                    method=M3AE.infer_text)
    ui = m3ae.apply(m3ae_params, batch["image"], method=M3AE.infer_image)
    fused = m3ae.apply(m3ae_params, ut, ui, batch["text_masks"],
                       method=M3AE.infer_fuse)
    enc_b, mask_b = t.model.apply(t.params, fused, batch, key,
                                  method=T5VQAModel.encode_from)
    np.testing.assert_array_equal(np.asarray(enc_a), np.asarray(enc_b))
    np.testing.assert_array_equal(np.asarray(mask_a), np.asarray(mask_b))


def test_fresh_projection_changes_with_rng(vqa_data):
    """bug_compat: the CLS projection is a fresh random layer per forward."""
    t = _trainer(vqa_data, "mm")
    t.setup_data()
    t.init_params()
    cfg = t.config
    batch = {
        "text_ids": jnp.ones((1, cfg["max_text_len"]), jnp.int32),
        "text_masks": jnp.ones((1, cfg["max_text_len"]), jnp.int32),
        "image": jnp.ones((1, cfg["image_size"], cfg["image_size"], 3)),
    }
    from mm_vqa_healthcare_tpu.models.t5_heads import T5VQAModel
    e1, _ = t.model.apply(t.params, batch, jax.random.key(1),
                          method=T5VQAModel.prepare_inputs)
    e2, _ = t.model.apply(t.params, batch, jax.random.key(2),
                          method=T5VQAModel.prepare_inputs)
    prefix_len = len(t.model_cfg.question_prefix_ids)
    # prefix embeds identical, projected CLS differs across rngs
    np.testing.assert_allclose(np.asarray(e1[:, :prefix_len]),
                               np.asarray(e2[:, :prefix_len]), atol=1e-6)
    assert not np.allclose(np.asarray(e1[:, prefix_len]),
                           np.asarray(e2[:, prefix_len]))


def test_repaired_seq_projection_stable(vqa_data):
    """bug_compat=False: the sequence-feature projections are drawn from a
    FIXED key shared across samples and forwards — the same features must
    map to the same soft prompt regardless of the step rng or the batch
    slot (under bug_compat=True they are fresh noise per forward, which
    is reference behavior but unlearnable; DEVIATIONS.md #5)."""
    t = _trainer(vqa_data, "mm", bug_compat=False,
                 mm_encoder_inputs_include_imagetext_feats=True,
                 mm_encoder_inputs_mm_feats_width=8)
    t.setup_data()
    t.init_params()
    cfg = t.config
    from mm_vqa_healthcare_tpu.models.t5_heads import T5VQAModel
    img = jnp.linspace(0, 1, 2 * cfg["image_size"] ** 2 * 3).reshape(
        (2, cfg["image_size"], cfg["image_size"], 3))
    batch = {
        "text_ids": jnp.tile(jnp.arange(cfg["max_text_len"],
                                        dtype=jnp.int32)[None], (2, 1)),
        "text_masks": jnp.ones((2, cfg["max_text_len"]), jnp.int32),
        "image": img,
    }
    e1, _ = t.model.apply(t.params, batch, jax.random.key(1),
                          method=T5VQAModel.prepare_inputs)
    e2, _ = t.model.apply(t.params, batch, jax.random.key(2),
                          method=T5VQAModel.prepare_inputs)
    # different step rngs -> identical soft prompt
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
    # identical samples in different batch slots -> identical prompt rows
    swapped = {k: v[::-1] for k, v in batch.items()}
    e3, _ = t.model.apply(t.params, swapped, jax.random.key(3),
                          method=T5VQAModel.prepare_inputs)
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e1[::-1]),
                               atol=1e-6)


def test_t5_finetune_and_beam_test(vqa_data):
    t = _trainer(vqa_data, "mm", fast_dev_run=True, max_epoch=1)
    metrics = t.fit()
    assert "test/exact_match" in metrics
    assert "test/bleu" in metrics


def test_t5_generate_device_beam_matches_host(vqa_data):
    """trainer.generate with beam_impl=device == host HF-protocol beam,
    token for token, through the real tiny T5."""
    t = _trainer(vqa_data, "mm")
    t.setup_data()
    t.init_params()
    cfg = t.config
    b = 4  # divisible by the test mesh's data axis
    rng = np.random.default_rng(11)
    batch = {
        "text_ids": jnp.asarray(
            rng.integers(1, 100, (b, cfg["max_text_len"])), jnp.int32),
        "text_masks": jnp.ones((b, cfg["max_text_len"]), jnp.int32),
        "image": jnp.asarray(rng.normal(
            size=(b, cfg["image_size"], cfg["image_size"], 3)),
            jnp.float32),
    }
    host = t.generate(batch, jax.random.key(2))
    t.config["beam_impl"] = "device"
    dev = t.generate(batch, jax.random.key(2))
    np.testing.assert_array_equal(dev, host)
    # single-program serving path: encode + cache + beam scan in ONE jit
    t.config["beam_impl"] = "device_onejit"
    onejit = t.generate(batch, jax.random.key(2))
    np.testing.assert_array_equal(onejit, host)


def test_unfreeze_partition(vqa_data):
    t = _trainer(vqa_data, "mm")
    t.setup_data()
    t.init_params()
    lbl = t._trainable_label(("params", "t5", "encoder_block_1", "self_attn",
                              "q", "kernel"))
    assert lbl == "train"     # top encoder block trainable
    lbl = t._trainable_label(("params", "t5", "encoder_block_0", "self_attn",
                              "q", "kernel"))
    assert lbl == "frozen"
    lbl = t._trainable_label(("params", "t5", "decoder_block_1", "ff", "wi",
                              "kernel"))
    assert lbl == "frozen"    # decoder FFN stays frozen (layer[2])
    lbl = t._trainable_label(("params", "t5", "decoder_block_1",
                              "cross_attn", "q", "kernel"))
    assert lbl == "train"
    lbl = t._trainable_label(("params", "m3ae", "vqa_head", "fc1", "kernel"))
    assert lbl == "frozen"


def test_offline_t5_tokenizer_cold_start(tmp_path):
    """cli.make_tokenizer builds a dir AutoTokenizer loads WITHOUT
    sentencepiece, with T5-style specials — the zero-egress cold-start
    path for the T5 CLI (load_t5_tokenizer via t5_tokenizer_path)."""
    from mm_vqa_healthcare_tpu.cli.make_tokenizer import build

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("yes\nno\nlung\nquestion\nwhat\n")
    out = tmp_path / "t5_tok"
    n = build(str(vocab), str(out))
    assert n == 8  # 5 words + 3 specials

    from mm_vqa_healthcare_tpu.train.t5_trainer import load_t5_tokenizer
    tok = load_t5_tokenizer({"t5_tokenizer_path": str(out)})
    assert tok.pad_token_id == 0 and tok.eos_token_id == 1
    enc = tok("what lung")["input_ids"]
    assert enc[-1] == 1  # eos appended like T5
    assert tok.batch_decode([enc], skip_special_tokens=True) == [
        "what lung"]
