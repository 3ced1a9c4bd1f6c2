"""Device-side beam search: the whole token loop is ONE jitted
`lax.scan` — no per-token host round trips (each costs ~90 ms through a
tunneled backend, and even on local-PCIe hosts per-token dispatch caps
serving throughput).

Protocol-faithful to the host implementation in `decode/beam.py` (HF
BeamSearchScorer / BeamHypotheses semantics — reference
m3ae_t5_mm_encoder_input.py:209-218): top-2K candidate expansion, EOS
candidates enter the finished pool only from the top-K ranks, capacity-K
pool with worst-score eviction, early_stopping / length-penalty `is_done`,
HF's literal-zero refill when fewer than K non-EOS candidates exist, and
the same finalize/padding rules.  Token-for-token parity vs the host path
is asserted in tests/test_beam_device.py.

On-device state is fixed-shape: beam scores [B,K], a finished pool kept as
(normalized score, sum-logprob, end step, end beam) quadruples [B,K], and
per-step (token, parent) tapes stacked by `scan`.  Sequences are
reconstructed on the host from the tapes after a single transfer —
hypothesis bookkeeping is O(B*K) ints, not sequence copies.

Known deviation (documented): candidates in the pool are kept in score
order rather than insertion order, so when two hypotheses have *bitwise
identical* scores the selected one may differ from HF's
first-inserted-wins; device accumulates scores in fp32 (host: fp64).
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.decode.beam import BeamHypotheses

_NEG = -1e9
# Two-stage candidate top-k (see body): tie-order-exact alternative to the
# single [B, K*vocab] top_k, but measured SLOWER on TPU (batch15: 50.8 vs
# 60.5 answers/s same-batch — XLA's one big top_k beats two smaller sorts
# plus the gather stitching).  Default off; knob kept for other backends.
_TWO_STAGE_TOPK = os.environ.get("MMVQA_BEAM_TWO_STAGE", "0") == "1"
# Candidate top-k algorithm: "rounds" (default) or "sort" (lax.top_k).
# XLA lowers lax.top_k on TPU to a FULL O(N log N) sort of the [B,
# K*vocab] candidate row — 143 ms/batch at b64·K4·vocab32128, 22% of the
# whole beam batch (xplane, PERF.md batch16).  2K rounds of masked argmax
# are 2K bandwidth-bound passes instead, and tie-order-EXACT vs lax.top_k:
# argmax returns the first (lowest-index) maximum, and re-masking selected
# indices yields equal values in ascending index order == top_k's
# lowest-index-first tie rule.
_TOPK_IMPL = os.environ.get("MMVQA_BEAM_TOPK", "rounds")


def _topk_rounds(scores: jax.Array, k: int):
    """Exact top-k over the last axis via k rounds of masked argmax.
    Tie-order-identical to `lax.top_k` (lowest index wins).  Each round
    re-masks the already-selected indices from the ORIGINAL array (a
    fused where+reduce pass) rather than scattering into a copy.

    Caveat (documented, unreachable from log_softmax outputs at K>=2): if
    a row has fewer than k finite entries, rounds past the last finite
    one all return the first -inf index (top_k would return distinct
    ascending indices); every such candidate carries score -inf and is
    discarded by the beam protocol either way."""
    b, n = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    vals, idxs = [], []
    eff = scores
    for _ in range(k):
        idx = jnp.argmax(eff, axis=1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(scores, idx[:, None], axis=1)[:, 0])
        idxs.append(idx)
        eff = jnp.where(col == idx[:, None], -jnp.inf, eff)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _finalize_outputs(best, batch_size: int, max_length: int,
                      pad_token_id: int, eos_token_id: int) -> np.ndarray:
    """HF finalize: pad to the longest selected hypothesis (+1 for EOS,
    capped at max_length) and append EOS when within bounds.  Shared
    semantics with decode/beam.py:140-153."""
    sent_lengths = [min(len(h) + 1, max_length) for h in best]
    out_len = min(max(sent_lengths), max_length)
    out = np.full((batch_size, out_len), pad_token_id, np.int64)
    for b, h in enumerate(best):
        ln = min(len(h), out_len)
        out[b, :ln] = h[:ln]
        if sent_lengths[b] < max_length:
            out[b, sent_lengths[b] - 1] = eos_token_id
    return out


def scan_beam(step_fn: Callable, cache, step_args: Tuple,
              batch_size: int, num_beams: int,
              max_length: int, eos_token_id: int, pad_token_id: int,
              decoder_start_token_id: int, length_penalty: float,
              early_stopping: bool, cache_split=None):
    """The traceable part: T = max_length-1 beam steps under lax.scan.
    Returns pool + tapes (all fixed-shape device arrays).  Pure jax — call
    it INSIDE a larger jit to fuse encoder forwards + the whole beam loop
    into a single program (zero host round trips per batch; see
    bench.py:bench_t5_beam `device_onejit`), then reconstruct sequences
    with `finalize_from_scan`.

    `cache_split`: optional `(split_fn, merge_fn)` pair — e.g.
    `(T5.split_cache, T5.merge_cache)` — separating the cache into a
    (mutable, beam-dependent) carry part and a static part that is
    identical across the K beams of a batch item and never written by
    `step_fn` (T5 cross-attention K/V).  Only the carry part goes through
    the scan and the per-step parent gather; the static part rides the
    scan body as a closure constant.  Exact: gathering beam-invariant
    values with within-item parent indices is the identity, so skipping
    it changes nothing but the HBM traffic."""
    b_sz, k = batch_size, num_beams
    n = b_sz * k
    t_steps = max_length - 1

    if cache_split is not None:
        split_fn, merge_fn = cache_split
        carry_cache, static_cache = split_fn(cache)
    else:
        carry_cache, static_cache = cache, None

    init_scores = jnp.full((b_sz, k), 0.0, jnp.float32).at[:, 1:].set(_NEG)
    carry0 = dict(
        cache=carry_cache,
        beam_scores=init_scores,
        last_tokens=jnp.full((b_sz, k), decoder_start_token_id, jnp.int32),
        done=jnp.zeros((b_sz,), bool),
        fin_score=jnp.full((b_sz, k), -jnp.inf, jnp.float32),
        fin_sum=jnp.zeros((b_sz, k), jnp.float32),
        fin_step=jnp.zeros((b_sz, k), jnp.int32),
        fin_beam=jnp.zeros((b_sz, k), jnp.int32),
        fin_valid=jnp.zeros((b_sz, k), bool),
    )

    def body(carry, t):
        cur_len = (t + 1).astype(jnp.float32)
        full_cache = (merge_fn(carry["cache"], static_cache)
                      if cache_split is not None else carry["cache"])
        logits, full_cache = step_fn(
            carry["last_tokens"].reshape(n, 1), t, full_cache,
            *step_args)
        cache = (split_fn(full_cache)[0] if cache_split is not None
                 else full_cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        next3 = (logp.reshape(b_sz, k, vocab)
                 + carry["beam_scores"][:, :, None])
        topk = min(2 * k, k * vocab)
        if _TWO_STAGE_TOPK:
            # Two-stage top-k: per-beam top-2K over vocab, then top-2K
            # over the K*2K survivors — the large sorted axis shrinks
            # from K*vocab to vocab.  EXACTLY tie-order equivalent to the
            # single-stage top_k (lax.top_k ties break by lowest index):
            # a candidate below its own beam's top-2K has 2K better-or-
            # tied-earlier candidates in that beam alone, so it can never
            # reach the global top-2K; within a beam, rank order IS
            # (value, lowest-token) order, and stage 2's flat candidate
            # index (beam*2K + rank) sorts ties by (beam, rank) == the
            # single-stage flat index (beam*vocab + token) order.
            t1 = min(topk, vocab)
            pb_val, pb_tok = jax.lax.top_k(next3, t1)     # [B, K, t1]
            top_val, cand = jax.lax.top_k(
                pb_val.reshape(b_sz, k * t1), topk)
            beam_id = cand // t1
            token = jnp.take_along_axis(
                pb_tok.reshape(b_sz, k * t1), cand, axis=1)
        elif _TOPK_IMPL == "rounds":
            top_val, top_idx = _topk_rounds(next3.reshape(b_sz, -1), topk)
            beam_id = top_idx // vocab
            token = top_idx % vocab
        else:
            top_val, top_idx = jax.lax.top_k(
                next3.reshape(b_sz, -1), topk)
            beam_id = top_idx // vocab
            token = top_idx % vocab
        is_eos = token == eos_token_id

        # --- EOS candidates from ranks < K enter the pool (beam.py:109-112)
        new_sum = top_val[:, :k]
        new_score = new_sum / cur_len ** length_penalty
        new_valid = is_eos[:, :k] & ~carry["done"][:, None]
        # merge old pool (first, so ties keep existing entries — matching
        # add()'s strict `score > worst`) with new entries in rank order
        all_score = jnp.concatenate(
            [carry["fin_score"],
             jnp.where(new_valid, new_score, -jnp.inf)], axis=1)
        all_sum = jnp.concatenate([carry["fin_sum"], new_sum], axis=1)
        all_step = jnp.concatenate(
            [carry["fin_step"], jnp.full((b_sz, k), t, jnp.int32)], axis=1)
        all_beam = jnp.concatenate([carry["fin_beam"], beam_id[:, :k]],
                                   axis=1)
        all_valid = jnp.concatenate([carry["fin_valid"], new_valid], axis=1)
        fin_score, sel = jax.lax.top_k(all_score, k)
        fin_sum = jnp.take_along_axis(all_sum, sel, axis=1)
        fin_step = jnp.take_along_axis(all_step, sel, axis=1)
        fin_beam = jnp.take_along_axis(all_beam, sel, axis=1)
        fin_valid = jnp.take_along_axis(all_valid, sel, axis=1)

        # --- continuing beams: first K non-EOS candidates in rank order
        rank = jnp.arange(topk)[None, :]
        order = jnp.argsort(jnp.where(is_eos, topk + rank, rank), axis=1)
        cont_idx = order[:, :k]
        cont_val = jnp.take_along_axis(top_val, cont_idx, axis=1)
        cont_tok = jnp.take_along_axis(token, cont_idx, axis=1)
        cont_parent = jnp.take_along_axis(beam_id, cont_idx, axis=1)
        # HF leaves literal zeros when fewer than K non-EOS exist
        # (beam.py:93-95 init arrays)
        navail = jnp.sum(~is_eos, axis=1)
        overflow = jnp.arange(k)[None, :] >= navail[:, None]
        cont_val = jnp.where(overflow, 0.0, cont_val)
        cont_tok = jnp.where(overflow, 0, cont_tok)
        cont_parent = jnp.where(overflow, 0, cont_parent)

        # --- is_done (beam.py:52-58,120-121); adds above already used the
        # pre-update `done`
        count = jnp.sum(fin_valid, axis=1)
        if early_stopping:
            newly_done = count >= k
        else:
            worst = jnp.min(jnp.where(fin_valid, fin_score, jnp.inf), axis=1)
            newly_done = (count >= k) & (
                top_val[:, 0] / cur_len ** length_penalty <= worst)
        done_prev = carry["done"]
        done = done_prev | newly_done

        # done batches freeze to (score 0, pad token, beam 0)
        # (beam.py:98-101)
        cont_val = jnp.where(done_prev[:, None], 0.0, cont_val)
        cont_tok = jnp.where(done_prev[:, None], pad_token_id, cont_tok)
        cont_parent = jnp.where(done_prev[:, None], 0, cont_parent)

        global_idx = (jnp.arange(b_sz)[:, None] * k + cont_parent).reshape(n)
        cache = jax.tree_util.tree_map(lambda x: x[global_idx], cache)

        carry = dict(cache=cache, beam_scores=cont_val,
                     last_tokens=cont_tok, done=done,
                     fin_score=fin_score, fin_sum=fin_sum,
                     fin_step=fin_step, fin_beam=fin_beam,
                     fin_valid=fin_valid)
        return carry, (cont_tok, cont_parent)

    carry, (tok_tape, par_tape) = jax.lax.scan(
        body, carry0, jnp.arange(t_steps))
    return dict(
        tok_tape=tok_tape, par_tape=par_tape, done=carry["done"],
        beam_scores=carry["beam_scores"], fin_sum=carry["fin_sum"],
        fin_step=carry["fin_step"], fin_beam=carry["fin_beam"],
        fin_valid=carry["fin_valid"])


def beam_search_device(step_fn: Callable, cache, batch_size: int,
                       num_beams: int, max_length: int, eos_token_id: int,
                       pad_token_id: int, decoder_start_token_id: int,
                       length_penalty: float = 1.0,
                       early_stopping: bool = True,
                       jit_cache: dict = None,
                       step_args: Tuple = (),
                       cache_split=None) -> np.ndarray:
    """Drop-in for decode/beam.py:beam_search with the token loop on
    device.  step_fn(tokens [N,1], pos, cache, *step_args) -> (logits
    [N,V], cache); cache reordering happens inside the scan (no reorder_fn
    needed).  Per-batch data (encoder memory, masks) must come in through
    `step_args` — they are traced jit inputs, so fresh batches reuse the
    compiled scan instead of baking stale constants."""
    key = ("scan_beam", batch_size, num_beams, max_length, eos_token_id,
           pad_token_id, decoder_start_token_id, length_penalty,
           early_stopping, cache_split is not None)
    if jit_cache is not None and key in jit_cache:
        scan = jit_cache[key]
    else:
        scan = jax.jit(lambda cache, *args: scan_beam(
            step_fn, cache, args, batch_size, num_beams, max_length,
            eos_token_id, pad_token_id, decoder_start_token_id,
            length_penalty, early_stopping, cache_split=cache_split))
        if jit_cache is not None:
            jit_cache[key] = scan
    return finalize_from_scan(
        scan(cache, *step_args), batch_size, num_beams, max_length,
        eos_token_id, pad_token_id, decoder_start_token_id,
        length_penalty, early_stopping)


def finalize_from_scan(out, batch_size: int, num_beams: int,
                       max_length: int, eos_token_id: int,
                       pad_token_id: int, decoder_start_token_id: int,
                       length_penalty: float = 1.0,
                       early_stopping: bool = True) -> np.ndarray:
    """Host half: backtrack the (token, parent) tapes from a `scan_beam`
    result into HF-finalized sequences (O(B*K*T) int work on tiny
    arrays)."""
    out = jax.device_get(out)
    tok_tape = out["tok_tape"]          # [T, B, K]
    par_tape = out["par_tape"]
    t_steps = tok_tape.shape[0]

    def backtrack(b: int, steps: int, j: int) -> np.ndarray:
        seq = np.empty(steps + 1, np.int64)
        seq[0] = decoder_start_token_id
        idx = j
        for it in range(steps - 1, -1, -1):
            seq[it + 1] = tok_tape[it, b, idx]
            idx = par_tape[it, b, idx]
        return seq

    best = []
    for b in range(batch_size):
        hyps = BeamHypotheses(num_beams, length_penalty, early_stopping)
        # pool entries re-added in (score-sorted) slot order; never evicts
        # since the pool holds at most K entries
        for slot in range(num_beams):
            if not out["fin_valid"][b, slot]:
                continue
            hyps.add(backtrack(b, int(out["fin_step"][b, slot]),
                               int(out["fin_beam"][b, slot])),
                     float(out["fin_sum"][b, slot]))
        if not out["done"][b]:
            # finalize: surviving beams enter through add() with its
            # capacity/eviction semantics (beam.py:133-138)
            for j in range(num_beams):
                hyps.add(backtrack(b, t_steps, j),
                         float(out["beam_scores"][b, j]))
        best.append(max(hyps.beams, key=lambda sb: sb[0])[1])
    return _finalize_outputs(best, batch_size, max_length,
                             pad_token_id, eos_token_id)
