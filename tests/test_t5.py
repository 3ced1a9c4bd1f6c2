"""T5 stack parity vs HF transformers torch implementation (logits + beam
search token parity) and incremental-decode self-consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mm_vqa_healthcare_tpu.checkpoint.convert import load_t5_state_dict
from mm_vqa_healthcare_tpu.decode.beam import beam_search
from mm_vqa_healthcare_tpu.models.t5 import T5, T5Config


VOCAB, DM, HEADS, DKV, FF, LAYERS = 50, 32, 4, 8, 64, 2


@pytest.fixture(scope="module")
def models():
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration
    hf_cfg = HFT5Config(
        vocab_size=VOCAB, d_model=DM, d_kv=DKV, num_heads=HEADS, d_ff=FF,
        num_layers=LAYERS, num_decoder_layers=LAYERS, dropout_rate=0.0,
        decoder_start_token_id=0)
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config(vocab_size=VOCAB, d_model=DM, d_kv=DKV, num_heads=HEADS,
                   d_ff=FF, num_layers=LAYERS, num_decoder_layers=LAYERS,
                   dropout_rate=0.0)
    model = T5(cfg)
    ids = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.key(0), input_ids=ids,
                        attention_mask=jnp.ones((1, 6), jnp.int32),
                        labels=jnp.ones((1, 4), jnp.int32))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, loaded = load_t5_state_dict(sd, params, LAYERS, LAYERS)
    assert len(loaded) > 20
    return hf, model, params, cfg


def test_t5_logits_parity(models):
    hf, model, params, cfg = models
    rng = np.random.default_rng(0)
    ids = rng.integers(2, VOCAB, (2, 7))
    mask = np.ones((2, 7), np.int64)
    mask[1, 4:] = 0
    labels = rng.integers(2, VOCAB, (2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 labels=torch.tensor(labels)).logits.numpy()
    ours = model.apply(params, input_ids=jnp.asarray(ids, jnp.int32),
                       attention_mask=jnp.asarray(mask, jnp.int32),
                       labels=jnp.asarray(labels, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_t5_incremental_decode_matches_teacher_forced(models):
    _, model, params, cfg = models
    rng = np.random.default_rng(1)
    ids = rng.integers(2, VOCAB, (2, 6))
    mask = np.ones((2, 6), np.int64)
    enc = model.apply(params, input_ids=jnp.asarray(ids, jnp.int32),
                      attention_mask=jnp.asarray(mask, jnp.int32),
                      method=T5.encode)
    dec_ids = np.concatenate([[[0], [0]],
                              rng.integers(2, VOCAB, (2, 4))], axis=1)
    full = model.apply(params, jnp.asarray(dec_ids, jnp.int32), enc,
                       jnp.asarray(mask, jnp.int32), method=T5.decode)
    cache = model.apply(params, 2, 5, enc, method=T5.init_cache)
    for t in range(5):
        logits, cache = model.apply(
            params, jnp.asarray(dec_ids[:, t:t + 1], jnp.int32),
            jnp.asarray(t, jnp.int32), enc, jnp.asarray(mask, jnp.int32),
            cache, method=T5.decode_step)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, t]),
                                   atol=1e-4, rtol=1e-3,
                                   err_msg=f"step {t}")


@pytest.mark.parametrize("max_length,num_beams", [(8, 3), (6, 4)])
def test_beam_search_token_parity_with_hf(models, max_length, num_beams):
    hf, model, params, cfg = models
    rng = np.random.default_rng(2)
    b = 3
    ids = rng.integers(2, VOCAB, (b, 7))
    mask = np.ones((b, 7), np.int64)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=max_length, num_beams=num_beams, early_stopping=True,
            pad_token_id=0, eos_token_id=1).numpy()

    enc = model.apply(params, input_ids=jnp.asarray(ids, jnp.int32),
                      attention_mask=jnp.asarray(mask, jnp.int32),
                      method=T5.encode)
    enc_rep = jnp.repeat(enc, num_beams, axis=0)
    mask_rep = jnp.repeat(jnp.asarray(mask, jnp.int32), num_beams, axis=0)
    cache = model.apply(params, b * num_beams, max_length, enc_rep,
                        method=T5.init_cache)

    @jax.jit
    def step_fn(tokens, pos, cache):
        return model.apply(params, tokens, pos, enc_rep, mask_rep, cache,
                           method=T5.decode_step)

    @jax.jit
    def reorder_fn(cache, idx):
        return jax.tree_util.tree_map(lambda x: x[idx], cache)

    out = beam_search(step_fn, reorder_fn, cache, b, num_beams, max_length,
                      eos_token_id=1, pad_token_id=0,
                      decoder_start_token_id=0)
    # HF pads to its own output length; compare up to the shorter
    ln = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :ln], ref[:, :ln])
    assert out.shape == ref.shape


def test_beam_search_eos_heavy_parity(models):
    """Adversarial: boost the EOS embedding so beams hit EOS immediately —
    exercises the hypothesis pool / early-stopping / finalize padding
    corners against HF."""
    hf, model, params, cfg = models
    import copy
    # boost EOS logits via the tied embedding row (applies to both models)
    with torch.no_grad():
        hf.shared.weight[1] *= 3.0
    import jax
    emb = jnp.asarray(params["params"]["shared"]["embedding"])
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2["params"]["shared"]["embedding"] = emb.at[1].mul(3.0)

    rng = np.random.default_rng(7)
    ids = rng.integers(2, VOCAB, (2, 5))
    mask = np.ones((2, 5), np.int64)
    max_length, num_beams = 7, 3
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=max_length, num_beams=num_beams, early_stopping=True,
            pad_token_id=0, eos_token_id=1).numpy()
    # restore hf weights for other tests
    with torch.no_grad():
        hf.shared.weight[1] /= 3.0

    enc = model.apply(params2, input_ids=jnp.asarray(ids, jnp.int32),
                      attention_mask=jnp.asarray(mask, jnp.int32),
                      method=T5.encode)
    enc_rep = jnp.repeat(enc, num_beams, axis=0)
    mask_rep = jnp.repeat(jnp.asarray(mask, jnp.int32), num_beams, axis=0)
    cache = model.apply(params2, 2 * num_beams, max_length, enc_rep,
                        method=T5.init_cache)

    def step_fn(tokens, pos, cache):
        return model.apply(params2, tokens, pos, enc_rep, mask_rep, cache,
                           method=T5.decode_step)

    out = beam_search(step_fn, lambda c, i: jax.tree_util.tree_map(
        lambda x: x[i], c), cache, 2, num_beams, max_length,
        eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)
    ln = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :ln], ref[:, :ln])
    assert out.shape == ref.shape


def test_beam_search_length_penalty_parity(models):
    """length_penalty != 1 changes hypothesis ranking; match HF."""
    hf, model, params, cfg = models
    rng = np.random.default_rng(11)
    ids = rng.integers(2, VOCAB, (2, 6))
    mask = np.ones((2, 6), np.int64)
    max_length, num_beams, lp = 8, 3, 2.0
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            max_length=max_length, num_beams=num_beams, early_stopping=True,
            length_penalty=lp, pad_token_id=0, eos_token_id=1).numpy()
    enc = model.apply(params, input_ids=jnp.asarray(ids, jnp.int32),
                      attention_mask=jnp.asarray(mask, jnp.int32),
                      method=T5.encode)
    enc_rep = jnp.repeat(enc, num_beams, axis=0)
    mask_rep = jnp.repeat(jnp.asarray(mask, jnp.int32), num_beams, axis=0)
    cache = model.apply(params, 2 * num_beams, max_length, enc_rep,
                        method=T5.init_cache)

    def step_fn(tokens, pos, cache):
        return model.apply(params, tokens, pos, enc_rep, mask_rep, cache,
                           method=T5.decode_step)

    out = beam_search(step_fn, lambda c, i: jax.tree_util.tree_map(
        lambda x: x[i], c), cache, 2, num_beams, max_length,
        eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
        length_penalty=lp)
    ln = min(out.shape[1], ref.shape[1])
    np.testing.assert_array_equal(out[:, :ln], ref[:, :ln])
