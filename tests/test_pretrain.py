"""Pretraining path tests: MLM + MIM + ITM multi-task step on caption
arrows (reference pretrain_m3ae.sh path) at debug scale."""

import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def caption_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrain_fixture")
    data_root = fixtures.make_caption_fixture(str(root), name="roco")
    vocab = fixtures.write_vocab(str(root / "vocab.txt")
                                 if hasattr(root, "__truediv__")
                                 else root + "/vocab.txt")
    return data_root, vocab


def _pretrain_config(data_root, vocab, **overrides):
    from mm_vqa_healthcare_tpu import config as C
    cfg = C.compose(["task_pretrain_m3ae", "tiny_debug"])
    cfg.update(
        datasets=["roco"],
        data_root=data_root,
        tokenizer_path=vocab,
        attention_impl="xla",
        max_steps=2, max_epoch=1, warmup_steps=0,
        mim_layer=1,           # tiny model has 2 fusion layers
        mesh_shape={"data": 2},
        per_gpu_batchsize=2, batch_size=4,
        num_workers=0,
    )
    cfg.update(overrides)
    return cfg


def test_pretrain_step_all_objectives(caption_data):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, vocab = caption_data
    cfg = _pretrain_config(data_root, vocab, fast_dev_run=True)
    t = Trainer(cfg)
    dm = t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    train_step = t._get_jitted("train")
    import jax
    for batch in dm.train_loader(0):
        assert "text_ids_mlm" in batch and "false_image_0" in batch
        dev = t._device_batch(batch)
        t.params, t.opt_state, aux = train_step(
            t.params, t.opt_state, dev, jax.random.key(0))
        aux = jax.device_get(aux)
        assert np.isfinite(aux["loss"])
        assert np.isfinite(aux["mlm_loss_sum"])
        assert np.isfinite(aux["mim_loss_sum"])
        assert np.isfinite(aux["itm_loss_sum"])
        break


def test_mim_masking_invariants(caption_data):
    """random_masking: keep-count, binary mask, restore permutation
    (reference m3ae_module.py:153-183)."""
    import jax
    import jax.numpy as jnp
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=2, input_image_embed_size=64,
                     input_text_embed_size=64, mim_prob=0.75,
                     use_vqa_head=False, use_mim_head=True, mim_layer=1,
                     mim_decoder_hidden_size=32, mim_decoder_num_heads=2,
                     mim_decoder_num_layers=1, attention_impl="xla")
    model = M3AE(cfg)
    batch = {
        "text_ids": jnp.ones((2, 8), jnp.int32),
        "text_masks": jnp.ones((2, 8), jnp.int32),
        "image": jnp.ones((2, 32, 32, 3), jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    out = model.apply(params, batch, mask_image=True,
                      rngs={"mim": jax.random.key(5)}, method=M3AE.infer)
    mask = np.asarray(out["mim_masks"])        # [B, 4] (2x2 grid)
    restore = np.asarray(out["mim_ids_restore"])
    n_patches = 4
    len_keep = int(n_patches * 0.25)
    assert mask.shape == (2, n_patches)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert (mask.sum(axis=1) == n_patches - len_keep).all()
    for row in restore:
        assert sorted(row.tolist()) == list(range(n_patches))
    # kept sequence: cls + kept patches
    assert out["multi_modal_image_feats"].shape[1] == 1 + len_keep


def test_whole_word_masking_groups(caption_data):
    """Whole-word selection masks '##' continuations with their word."""
    from mm_vqa_healthcare_tpu.data.tokenization import (
        load_tokenizer, whole_word_mask_indices)
    _, vocab = caption_data
    tok = load_tokenizer("tiny-bert", vocab)
    tokens = ["[CLS]", "lung", "##s", "showing", "mass", "[SEP]"]
    rng = np.random.default_rng(0)
    hit_pairs = 0
    for _ in range(50):
        m = whole_word_mask_indices(tokens, 0.4, rng,
                                    {"[CLS]", "[SEP]", "[PAD]"})
        assert not m[0] and not m[5]
        # lung and ##s always together
        assert m[1] == m[2]
        hit_pairs += int(m[1])
    assert hit_pairs > 0


def test_pretrain_eval_all_objectives(caption_data):
    """Val-phase pretraining (mlm+mim+itm) — the eval step must supply
    the "mim" rng for val-time masked image modeling (regression: the
    hardware e2e pretrain run crashed with InvalidRngError in
    run_validation while every CPU test only drove the train step)."""
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, vocab = caption_data
    cfg = _pretrain_config(data_root, vocab)
    t = Trainer(cfg)
    t.setup_data()
    t.init_params()
    metrics = t.evaluate("val")
    assert np.isfinite(metrics["mim/loss"])
    assert np.isfinite(metrics["mlm/accuracy"])
    assert np.isfinite(metrics["itm/accuracy"])
