"""Device-scan beam search vs the host HF-protocol implementation:
token-for-token parity across length penalties, early-stopping modes,
EOS-heavy distributions, and batch shapes.

A synthetic KV-cache-free "decoder" (logits = smooth deterministic
function of a per-beam rolling hash and the position) exercises the beam
*protocol* exhaustively without paying transformer compile time; an
integration test through the real tiny-T5 trainer path lives in
tests/test_t5_head.py::test_t5_finetune_and_beam_test (beam_impl=device
variant below).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.decode.beam import beam_search
from mm_vqa_healthcare_tpu.decode.beam_device import beam_search_device


def _make_step(vocab: int, seed: float, eos_bias: float):
    """Deterministic fake decoder: cache is a per-beam rolling hash of the
    generated prefix; logits vary smoothly with (hash, position).  Both
    beam implementations consume the exact same fp32 computation."""
    def step_fn(tokens, pos, cache):
        h = cache["h"] * 31 + tokens[:, 0]
        f = (h % 1009).astype(jnp.float32)
        cols = jnp.arange(vocab, dtype=jnp.float32)
        logits = 3.0 * jnp.sin(
            (f[:, None] + 1.0) * (cols * 0.7 + seed)
            + pos.astype(jnp.float32) * 1.3)
        logits = logits.at[:, 1].add(eos_bias)  # eos_token_id = 1
        return logits, {"h": h}
    return step_fn


def _reorder(cache, idx):
    return jax.tree_util.tree_map(lambda x: x[idx], cache)


@pytest.mark.parametrize("length_penalty,early_stopping,eos_bias", [
    (1.0, True, 0.0),
    (1.0, True, 2.5),     # EOS-heavy: pool churn, early finishes
    (0.7, True, 1.0),
    (2.0, False, 1.0),    # non-early-stopping is_done branch
    (1.0, False, 0.0),
])
def test_device_matches_host(length_penalty, early_stopping, eos_bias):
    b, k, vocab, max_len = 5, 4, 23, 9
    for seed in (0.3, 0.9, 1.7):
        step = _make_step(vocab, seed, eos_bias)
        cache0 = {"h": jnp.zeros((b * k,), jnp.int32)}
        host = beam_search(
            step, _reorder, cache0, b, k, max_len,
            eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
            length_penalty=length_penalty, early_stopping=early_stopping)
        dev = beam_search_device(
            step, cache0, b, k, max_len,
            eos_token_id=1, pad_token_id=0, decoder_start_token_id=0,
            length_penalty=length_penalty, early_stopping=early_stopping)
        np.testing.assert_array_equal(
            dev, host,
            err_msg=f"seed={seed} lp={length_penalty} "
                    f"es={early_stopping} eosb={eos_bias}")


def test_device_eos_flood():
    """vocab=2 with a huge EOS bias: every beam proposes EOS at rank < K
    on step one — pool fills instantly, all batches early-stop.  (The
    literal-zero refill branch itself is unreachable with a single EOS id
    — at most K of the top-2K candidates can be EOS — it exists for
    protocol fidelity with HF's equally-defensive zeros init.)"""
    b, k, vocab, max_len = 3, 4, 2, 6
    step = _make_step(vocab, 0.5, 50.0)
    cache0 = {"h": jnp.zeros((b * k,), jnp.int32)}
    host = beam_search(step, _reorder, cache0, b, k, max_len,
                       eos_token_id=1, pad_token_id=0,
                       decoder_start_token_id=0)
    dev = beam_search_device(step, cache0, b, k, max_len,
                             eos_token_id=1, pad_token_id=0,
                             decoder_start_token_id=0)
    np.testing.assert_array_equal(dev, host)


def test_device_no_eos_runs_to_max_length():
    """eos never sampled (large negative bias): finalize path adds all
    surviving beams at max_length on both implementations."""
    b, k, vocab, max_len = 2, 3, 11, 7
    step = _make_step(vocab, 1.1, -50.0)
    cache0 = {"h": jnp.zeros((b * k,), jnp.int32)}
    host = beam_search(step, _reorder, cache0, b, k, max_len,
                       eos_token_id=1, pad_token_id=0,
                       decoder_start_token_id=0)
    dev = beam_search_device(step, cache0, b, k, max_len,
                             eos_token_id=1, pad_token_id=0,
                             decoder_start_token_id=0)
    np.testing.assert_array_equal(dev, host)


def test_jit_cache_reuse_fresh_step_args():
    """The cached compiled scan must honor fresh step_args (encoder
    context as traced inputs, not baked constants)."""
    b, k, vocab, max_len = 2, 2, 13, 6

    def step_fn(tokens, pos, cache, shift):
        h = cache["h"] * 31 + tokens[:, 0]
        f = (h % 1009).astype(jnp.float32)
        cols = jnp.arange(vocab, dtype=jnp.float32)
        logits = 3.0 * jnp.sin((f[:, None] + 1.0) * (cols * 0.7 + 0.4)
                               + pos.astype(jnp.float32)) + shift
        return logits, {"h": h}

    jit_cache = {}
    outs = []
    for sval in (0.0, 5.0):
        shift = jnp.full((vocab,), 0.0).at[3].set(sval)
        cache0 = {"h": jnp.zeros((b * k,), jnp.int32)}
        dev = beam_search_device(step_fn, cache0, b, k, max_len,
                                 eos_token_id=1, pad_token_id=0,
                                 decoder_start_token_id=0,
                                 jit_cache=jit_cache, step_args=(shift,))
        host = beam_search(
            functools.partial(
                lambda t, p, c, s: step_fn(t, p, c, s), s=shift),
            _reorder, cache0, b, k, max_len,
            eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)
        np.testing.assert_array_equal(dev, host)
        outs.append(dev)
    assert len(jit_cache) == 1  # second call reused the compiled scan
    assert not np.array_equal(outs[0], outs[1])  # and saw the new args


def test_cache_split_parity():
    """`cache_split` (carry only the mutable cache part through the scan,
    static beam-invariant part as a closure constant — the T5 cross-K/V
    optimization) must be token-identical to both the unsplit device scan
    and the host protocol."""
    b, k, vocab, max_len = 4, 3, 19, 8
    # static part: per-item "encoder memory", identical across the K
    # beams of an item (like T5 cross K/V built from repeated enc_out)
    mem = jnp.repeat(jnp.arange(b, dtype=jnp.float32) * 0.37 + 0.5, k)

    def step_fn(tokens, pos, cache):
        h = cache["mut"]["h"] * 31 + tokens[:, 0]
        f = (h % 1009).astype(jnp.float32) + cache["static"]["m"] * 2.0
        cols = jnp.arange(vocab, dtype=jnp.float32)
        logits = 3.0 * jnp.sin((f[:, None] + 1.0) * (cols * 0.7 + 0.8)
                               + pos.astype(jnp.float32) * 1.3)
        logits = logits.at[:, 1].add(1.0)
        return logits, {"mut": {"h": h}, "static": cache["static"]}

    cache0 = {"mut": {"h": jnp.zeros((b * k,), jnp.int32)},
              "static": {"m": mem}}
    split = lambda c: ({"mut": c["mut"]}, {"static": c["static"]})
    merge = lambda mut, st: {"mut": mut["mut"], "static": st["static"]}
    common = dict(eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)
    host = beam_search(step_fn, _reorder, cache0, b, k, max_len, **common)
    dev_plain = beam_search_device(step_fn, cache0, b, k, max_len, **common)
    dev_split = beam_search_device(step_fn, cache0, b, k, max_len,
                                   cache_split=(split, merge), **common)
    np.testing.assert_array_equal(dev_plain, host)
    np.testing.assert_array_equal(dev_split, host)


def test_scan_beam_fused_in_outer_jit():
    """`scan_beam` must be traceable inside a LARGER jit (an "encoder" +
    the whole beam loop as one program — the serving one-jit path,
    bench.py device_onejit) and match beam_search_device exactly."""
    from mm_vqa_healthcare_tpu.decode.beam_device import (
        finalize_from_scan, scan_beam)

    b, k, vocab, max_len = 3, 4, 17, 8
    step = _make_step(vocab, 0.9, 1.0)

    def one_program(x):
        # a fake "encoder" producing the initial cache inside the jit
        h0 = (x * 7).astype(jnp.int32) % 5
        return scan_beam(step, {"h": h0}, (), b, k, max_len,
                         eos_token_id=1, pad_token_id=0,
                         decoder_start_token_id=0, length_penalty=1.0,
                         early_stopping=True)

    x = jnp.arange(b * k, dtype=jnp.float32)
    fused = finalize_from_scan(jax.jit(one_program)(x), b, k, max_len,
                               eos_token_id=1, pad_token_id=0,
                               decoder_start_token_id=0)
    ref = beam_search_device(step, {"h": (x * 7).astype(jnp.int32) % 5},
                             b, k, max_len, eos_token_id=1, pad_token_id=0,
                             decoder_start_token_id=0)
    np.testing.assert_array_equal(fused, ref)
