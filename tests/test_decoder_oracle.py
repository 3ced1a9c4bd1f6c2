"""Decoder greedy search: token-for-token parity vs the reference torch
Decoder (m3ae_decoder.py:93-182) at real layer scale (d_model 768, 8 heads,
6 layers, bug-compat layer rewiring + double-PE quirks).

The reference re-forwards the whole prefix every step (search_path); ours
decodes with a KV cache — the tokens must still match exactly.  Weights
are random (torch), exported through the model_state_dict converter path
(decoder_load_path semantics, m3ae_decoder.py:207-211).
"""

import importlib
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tests.oracle_utils import (  # noqa: E402
    REFERENCE_ROOT, _install_reference_stubs)

VOCAB = 512
MAX_LEN = 16
CLS, SEP, PAD, EOS = 101, 102, 0, 99


class _Tok:
    cls_token_id = CLS
    sep_token_id = SEP
    pad_token_id = PAD
    eos_token_id = EOS


@pytest.fixture(scope="module")
def ref_decoder_mod():
    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "m3ae")):
        pytest.skip("reference tree unavailable")
    _install_reference_stubs()
    import sys
    # m3ae_decoder does `from m3ae.modules import M3AETransformerSS`; the
    # pre-seeded package stub needs the attribute set first
    mm = importlib.import_module("m3ae.modules.m3ae_module")
    sys.modules["m3ae.modules"].M3AETransformerSS = mm.M3AETransformerSS
    try:
        return importlib.import_module("m3ae.modules.m3ae_decoder")
    except Exception as e:
        pytest.skip(f"reference decoder not importable: {e}")


@pytest.fixture(scope="module")
def pair(ref_decoder_mod):
    torch.manual_seed(11)
    ref = ref_decoder_mod.Decoder(
        num_layers=6, d_model=768, num_heads=8, d_ff=3072, dropout=0.1,
        max_len=MAX_LEN, target_vocab_size=VOCAB).eval()

    from mm_vqa_healthcare_tpu.checkpoint.convert import (
        load_decoder_head_checkpoint)
    from mm_vqa_healthcare_tpu.models.decoder import Decoder, DecoderConfig

    cfg = DecoderConfig(num_layers=6, d_model=768, num_heads=8, d_ff=3072,
                        dropout=0.1, max_len=MAX_LEN, vocab_size=VOCAB,
                        bug_compat=True, attention_impl="xla")
    dec = Decoder(cfg)
    enc0 = jnp.zeros((1, 4, 768), jnp.float32)
    params = dec.init(jax.random.key(0), jnp.zeros((1, 3), jnp.int32),
                      None, enc0)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dec.ckpt")
        torch.save({"model_state_dict": ref.state_dict()}, path)
        wrapped, loaded = load_decoder_head_checkpoint(
            path, {"params": {"decoder": params["params"]}}, num_layers=6)
    # every learned tensor converts; positional_encoding.pe is a
    # deterministic buffer recomputed on our side
    learned = [k for k in ref.state_dict() if not k.endswith(".pe")]
    assert len(loaded) == len(learned), (len(loaded), len(learned))
    return ref, dec, {"params": wrapped["params"]["decoder"]}


def _enc_feats(seed, b=3, s=9):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, s, 768)).astype(np.float32)


def test_teacher_forced_logits_parity(pair):
    ref, dec, params = pair
    rng = np.random.default_rng(0)
    b, t = 3, 7
    tokens = rng.integers(1, VOCAB, (b, t)).astype(np.int64)
    tokens[:, 0] = CLS
    enc = _enc_feats(1)
    with torch.no_grad():
        ref_logits, _ = ref(torch.from_numpy(tokens), None,
                            torch.from_numpy(enc))
    mine = dec.apply(params, jnp.asarray(tokens.astype(np.int32)), None,
                     jnp.asarray(enc))
    diff = np.max(np.abs(np.asarray(mine) - ref_logits.numpy()))
    assert diff < 2e-3, f"teacher-forced logits diverge: {diff}"


@pytest.mark.parametrize("seed", [2, 3])
def test_greedy_tokens_match_reference(pair, seed):
    ref, dec, params = pair
    enc = _enc_feats(seed)
    with torch.no_grad():
        ref_tokens = ref.search_path(torch.from_numpy(enc), _Tok()).numpy()

    from mm_vqa_healthcare_tpu.decode.greedy import (
        greedy_search, greedy_search_host)
    mine = np.asarray(greedy_search(dec, params, jnp.asarray(enc),
                                    cls_id=CLS, sep_id=SEP, pad_id=PAD,
                                    eos_id=EOS))
    mine_host = np.asarray(greedy_search_host(
        dec, params, jnp.asarray(enc), cls_id=CLS, sep_id=SEP, pad_id=PAD,
        eos_id=EOS))
    assert mine.shape == ref_tokens.shape, (mine.shape, ref_tokens.shape)
    assert np.array_equal(mine, ref_tokens), (mine[:, :8], ref_tokens[:, :8])
    assert np.array_equal(mine_host, ref_tokens)
