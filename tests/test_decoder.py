"""Decoder head tests: teacher-forced forward, greedy search semantics,
cache-vs-full-forward parity, end-to-end decoder fine-tune at debug scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import fixtures
from mm_vqa_healthcare_tpu.models.decoder import Decoder, DecoderConfig


TINY = DecoderConfig(num_layers=2, d_model=32, num_heads=2, d_ff=64,
                     dropout=0.1, max_len=10, vocab_size=30,
                     bug_compat=True, attention_impl="xla")


def _init_decoder(cfg=TINY):
    dec = Decoder(cfg)
    b, t = 2, 5
    tokens = jnp.ones((b, t), jnp.int32)
    mask = jnp.ones((b, t), jnp.int32)
    enc = jnp.ones((b, 3, cfg.d_model), jnp.float32)
    params = dec.init(jax.random.key(0), tokens, mask, enc)
    return dec, params


def test_teacher_forced_shapes():
    dec, params = _init_decoder()
    logits = dec.apply(params, jnp.ones((2, 5), jnp.int32),
                       jnp.ones((2, 5), jnp.int32),
                       jnp.ones((2, 3, 32), jnp.float32))
    assert logits.shape == (2, 5, 30)


def test_causality():
    """Changing a later token must not affect earlier logits."""
    dec, params = _init_decoder()
    enc = jax.random.normal(jax.random.key(1), (1, 3, 32))
    t1 = jnp.array([[1, 2, 3, 4, 5]], jnp.int32)
    t2 = jnp.array([[1, 2, 3, 9, 9]], jnp.int32)
    l1 = dec.apply(params, t1, None, enc)
    l2 = dec.apply(params, t2, None, enc)
    np.testing.assert_allclose(np.asarray(l1[:, :3]), np.asarray(l2[:, :3]),
                               atol=1e-5)


@pytest.mark.parametrize("bug_compat", [True, False])
def test_cached_decode_matches_full_forward(bug_compat):
    """Greedy with KV cache == argmax over full-prefix re-forward
    (the reference search_path recomputes the prefix each step)."""
    import dataclasses
    cfg = dataclasses.replace(TINY, bug_compat=bug_compat)
    dec, params = _init_decoder(cfg)
    enc = jax.random.normal(jax.random.key(2), (2, 3, 32))
    cls_id, sep_id, pad_id = 2, 3, 0

    # full-prefix reference loop (mirrors search_path semantics)
    b = 2
    seq = np.full((b, 1), cls_id, np.int64)
    finished = np.zeros(b, bool)
    for step in range(cfg.max_len):
        logits = dec.apply(params, jnp.asarray(seq, jnp.int32), None, enc)
        nxt = np.asarray(jnp.argmax(
            jax.nn.log_softmax(logits[:, -1].astype(jnp.float32)), -1))
        finished |= (nxt == sep_id)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
        if finished.all():
            break
    ref = seq[:, 1:]
    for i in range(b):
        hits = np.where(ref[i] == sep_id)[0]
        if len(hits):
            ref[i, hits[0] + 1:] = pad_id
    ref = np.pad(ref, ((0, 0), (0, cfg.max_len - ref.shape[1])),
                 constant_values=pad_id)

    from mm_vqa_healthcare_tpu.decode.greedy import greedy_search
    out = np.asarray(greedy_search(dec, params, enc, cls_id, sep_id, pad_id))
    np.testing.assert_array_equal(out, ref)


def test_bug_compat_uses_last_layer_only():
    """In compat mode the output must equal running ONLY the last layer on
    the embedded input (the reference feeds target_embed to every layer)."""
    dec, params = _init_decoder()
    tokens = jnp.array([[1, 2, 3]], jnp.int32)
    enc = jax.random.normal(jax.random.key(3), (1, 3, 32))
    full = dec.apply(params, tokens, None, enc)

    # manual: embed (2*emb+pe) -> last layer -> final_linear
    from mm_vqa_healthcare_tpu.models.decoder import DecoderLayer
    from mm_vqa_healthcare_tpu.ops.attention import causal_bias
    emb = dec.apply(params, tokens, method=Decoder.embed)
    layer = DecoderLayer(TINY)
    lp = {"params": params["params"]["dec_layers_1"]}
    out = layer.apply(lp, emb, enc, causal_bias(3))
    fl = params["params"]["final_linear"]
    manual = jnp.dot(out, fl["kernel"]) + fl["bias"]
    np.testing.assert_allclose(np.asarray(full), np.asarray(manual),
                               atol=1e-5)


def test_decoder_checkpoint_roundtrip_torch_oracle():
    """Torch nn.MultiheadAttention-based oracle of one reference
    DecoderLayer vs ours after weight conversion."""
    import torch
    from mm_vqa_healthcare_tpu.checkpoint import convert

    d, h, ff, t, b = 32, 2, 64, 4, 2
    torch.manual_seed(0)

    class TorchDecoderLayer(torch.nn.Module):
        """Test oracle assembling the reference layer math
        (m3ae_decoder.py:38-90) from stock torch modules."""

        def __init__(self):
            super().__init__()
            self.mha1 = torch.nn.MultiheadAttention(d, h, dropout=0.0,
                                                    batch_first=True)
            self.mha2 = torch.nn.MultiheadAttention(d, h, dropout=0.0,
                                                    batch_first=True)
            self.ffn = torch.nn.Sequential(
                torch.nn.Linear(d, ff), torch.nn.ReLU(),
                torch.nn.Linear(ff, d))
            self.pre_norm = torch.nn.LayerNorm(d)
            self.layernorm1 = torch.nn.LayerNorm(d)
            self.layernorm2 = torch.nn.LayerNorm(d)
            self.layernorm3 = torch.nn.LayerNorm(d)

        def forward(self, x, enc, slf_mask):
            residual = x
            xn = self.pre_norm(x)
            a1, _ = self.mha1(xn, xn, xn, attn_mask=slf_mask)
            x = residual + a1
            residual = x
            x = self.layernorm1(x)
            a2, _ = self.mha2(x, enc, enc)
            x = a2 + residual
            residual = x
            x = self.layernorm2(x)
            f = self.ffn(x)
            x = f + residual
            return self.layernorm3(x)

    oracle = TorchDecoderLayer().eval()
    x = torch.randn(b, t, d)
    enc = torch.randn(b, 3, d)
    causal = ~torch.tril(torch.ones(t, t, dtype=torch.bool))
    with torch.no_grad():
        ref = oracle(x, enc, causal).numpy()

    sd = {f"dec_layers.0.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    from mm_vqa_healthcare_tpu.models.decoder import DecoderLayer
    import dataclasses
    cfg = dataclasses.replace(TINY, d_model=d, num_heads=h, d_ff=ff)
    layer = DecoderLayer(cfg)
    from mm_vqa_healthcare_tpu.ops.attention import causal_bias
    init = layer.init(jax.random.key(0), jnp.asarray(x.numpy()),
                      jnp.asarray(enc.numpy()), causal_bias(t))
    flat = convert.flatten(init)
    for tk, fp, tr in convert.build_decoder_head_rules(num_layers=1):
        if not tk.startswith("dec_layers.0"):
            continue
        path = ("params",) + fp[1:]
        assert tk in sd, tk
        flat[path] = convert._to_flax(np.asarray(sd[tk]), tr, None)
    params = convert.unflatten(flat)
    out = layer.apply(params, jnp.asarray(x.numpy()),
                      jnp.asarray(enc.numpy()), causal_bias(t))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


@pytest.fixture(scope="module")
def vqa_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("dec_fixture")
    return fixtures.make_vqa_fixture(str(root))


def test_decoder_finetune_tiny(vqa_data):
    from mm_vqa_healthcare_tpu.train.decoder_trainer import DecoderTrainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, max_epoch=1,
                               fast_dev_run=True)
    t = DecoderTrainer(cfg)
    # shrink decoder for test speed
    t.max_answer_length = 8
    metrics = t.fit()
    assert "test/exact_match" in metrics


def test_host_greedy_matches_while_loop():
    """greedy_search_host (host loop, jitted step) produces the same
    tokens as the lax.while_loop implementation."""
    import numpy as np
    from mm_vqa_healthcare_tpu.decode.greedy import (greedy_search,
                                                     greedy_search_host)
    dec, params = _init_decoder()
    enc = jax.random.normal(jax.random.key(9), (3, 4, 32))
    a = np.asarray(greedy_search(dec, params, enc, 2, 3, 0))
    b = np.asarray(greedy_search_host(dec, params, enc, 2, 3, 0))
    np.testing.assert_array_equal(a, b)
