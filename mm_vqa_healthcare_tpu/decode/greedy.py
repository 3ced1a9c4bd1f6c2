"""Greedy decoding (reference Decoder.search_path, m3ae_decoder.py:141-182).

Token-for-token semantics of the reference loop, executed as a KV-cached
``lax.while_loop`` under jit (the reference re-forwards the whole prefix
every step — O(T^2); with deterministic eval + causal masking the cached
incremental decode produces identical argmax tokens in O(T)):

  * start token [CLS]; per step: argmax of log-softmax over the last
    position's logits,
  * a sequence is finished once it emits [SEP] (or the tokenizer's EOS if
    one exists); the loop stops when all are finished or max_len reached,
  * post-pass: everything strictly after the FIRST terminator becomes
    [PAD]; output is [B, max_len] (the leading CLS is dropped).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.decoder import Decoder


def greedy_search(decoder: Decoder, params, enc_feats: jax.Array,
                  cls_id: int, sep_id: int, pad_id: int,
                  eos_id: Optional[int] = None) -> jax.Array:
    cfg = decoder.cfg
    b = enc_feats.shape[0]
    max_len = cfg.max_len
    tokens0 = jnp.full((b, max_len + 1), pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(cls_id)
    cache0 = decoder.apply(params, b, enc_feats.dtype, enc_feats,
                           method=Decoder.init_cache)
    finished0 = jnp.zeros((b,), jnp.bool_)

    def cond(carry):
        _, finished, t, _ = carry
        return jnp.logical_and(t < max_len, ~jnp.all(finished))

    def body(carry):
        tokens, finished, t, cache = carry
        current = jax.lax.dynamic_slice(tokens, (0, t), (b, 1))
        logits, cache = decoder.apply(
            params, current, t, enc_feats, cache,
            method=Decoder.decode_step)
        nxt = jnp.argmax(jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1), axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t + 1))
        term = nxt == sep_id
        if eos_id is not None:
            term = term | (nxt == eos_id)
        finished = finished | term
        return tokens, finished, t + 1, cache

    tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (tokens0, finished0, jnp.asarray(0, jnp.int32), cache0))

    out = tokens[:, 1:]                      # drop the CLS start token
    return _pad_after_first_terminator(out, sep_id, pad_id, eos_id)


def _pad_after_first_terminator(out, sep_id, pad_id, eos_id):
    b = out.shape[0]
    term = out == sep_id
    if eos_id is not None:
        term = term | (out == eos_id)
    seen_before = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         jnp.cumsum(term.astype(jnp.int32), axis=1)[:, :-1]], axis=1)
    return jnp.where(seen_before > 0, pad_id, out)


def greedy_search_host(decoder: Decoder, params, enc_feats: jax.Array,
                       cls_id: int, sep_id: int, pad_id: int,
                       eos_id: Optional[int] = None,
                       jit_cache: Optional[dict] = None,
                       chunk: Optional[int] = None) -> jax.Array:
    """Host-driven variant of `greedy_search`: a jitted K-token scan chunk
    with the loop on host (identical tokens).  Useful on runtimes where
    lax.while_loop compiles pathologically slowly (e.g. remote-compiled
    tunnels); also what serving stacks typically do for early exit.

    `chunk` tokens decode per host round trip (jitted lax.scan over the
    cached decode step).  Early exit happens at chunk granularity — the
    reference loop also over-decodes finished rows until ALL rows finish
    and pads after the first terminator post-hoc (m3ae_decoder.py:149-181),
    so outputs are token-identical for any chunk value.  On remote-executed
    backends the per-round-trip latency dominates, so the default 16 is
    ~16x fewer syncs than a per-token loop (MMVQA_DECODE_CHUNK overrides)."""
    import os
    import numpy as np
    cfg = decoder.cfg
    b = enc_feats.shape[0]
    max_len = cfg.max_len
    if chunk is None:
        chunk = int(os.environ.get("MMVQA_DECODE_CHUNK", "16"))
    chunk = max(1, min(chunk, max_len))
    if jit_cache is None:
        jit_cache = {}
    if ("chunk", chunk) not in jit_cache:
        @functools.partial(jax.jit, static_argnums=5)
        def step(params, current, t0, enc, cache, k):
            def body(carry, i):
                cur, cache = carry
                logits, cache = decoder.apply(
                    params, cur, t0 + i, enc, cache,
                    method=Decoder.decode_step)
                nxt = jnp.argmax(jax.nn.log_softmax(
                    logits.astype(jnp.float32), -1), -1).astype(jnp.int32)
                return (nxt[:, None], cache), nxt

            (_, cache), toks = jax.lax.scan(
                body, (current, cache), jnp.arange(k, dtype=jnp.int32))
            return toks.T, cache  # [b, k]
        jit_cache[("chunk", chunk)] = step
    if "init_cache" not in jit_cache:
        # enc as a traced ARG (closure captures serialize as HLO
        # constants into remote-compile requests)
        jit_cache["init_cache"] = jax.jit(
            lambda p, e: decoder.apply(p, b, e.dtype, e,
                                       method=Decoder.init_cache))
    step = jit_cache[("chunk", chunk)]
    cache = jit_cache["init_cache"](params, enc_feats)
    tokens = np.full((b, max_len + 1), pad_id, np.int32)
    tokens[:, 0] = cls_id
    finished = np.zeros(b, bool)
    for t in range(0, max_len, chunk):
        k = min(chunk, max_len - t)
        toks, cache = step(params, jnp.asarray(tokens[:, t:t + 1]),
                           jnp.asarray(t, jnp.int32), enc_feats, cache, k)
        toks = np.asarray(jax.device_get(toks))
        tokens[:, t + 1:t + 1 + k] = toks
        finished |= (toks == sep_id).any(axis=1)
        if eos_id is not None:
            finished |= (toks == eos_id).any(axis=1)
        if finished.all():
            break
    out = jnp.asarray(tokens[:, 1:])
    return _pad_after_first_terminator(out, sep_id, pad_id, eos_id)
