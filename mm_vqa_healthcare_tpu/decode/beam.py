"""Beam search with HF `generate` semantics (reference T5 heads decode with
num_beams=4, early_stopping=True, max_length=t5_max_length —
m3ae_t5_mm_encoder_input.py:209-218).

Faithful re-implementation of transformers' BeamSearchScorer /
BeamHypotheses protocol so generated token sequences match HF exactly:
  * beam scores init [0, -1e9, ...], log-softmax accumulation,
  * top-2k candidate expansion per batch; EOS candidates enter the
    hypothesis pool only from the top-k ranks; others refill beams,
  * hypothesis score = sum_logprobs / len**length_penalty (len counts the
    prefix incl. decoder_start, excl. the EOS being added),
  * early_stopping=True: a batch is done once num_beams hypotheses exist,
  * finalize pads to max_length and appends EOS when within bounds.

Execution model: the per-token decoder step is a jitted KV-cached function;
beam bookkeeping (tiny: batch x 4 beams x <=12 steps) runs on host, and
cache reordering is a jitted gather.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BeamHypotheses:
    def __init__(self, num_beams: int, length_penalty: float,
                 early_stopping: bool):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self.beams: List[Tuple[float, np.ndarray]] = []
        self.worst_score = 1e9

    def __len__(self):
        return len(self.beams)

    def add(self, hyp: np.ndarray, sum_logprobs: float):
        score = sum_logprobs / (hyp.shape[-1] ** self.length_penalty)
        if len(self) < self.num_beams or score > self.worst_score:
            self.beams.append((score, hyp))
            if len(self) > self.num_beams:
                worst = sorted((s, i) for i, (s, _) in enumerate(self.beams))
                del self.beams[worst[0][1]]
                self.worst_score = worst[1][0]
            else:
                self.worst_score = min(score, self.worst_score)

    def is_done(self, best_sum_logprobs: float, cur_len: int) -> bool:
        if len(self) < self.num_beams:
            return False
        if self.early_stopping:
            return True
        return (best_sum_logprobs / cur_len ** self.length_penalty
                <= self.worst_score)


def beam_search(step_fn: Callable, reorder_fn: Callable, cache,
                batch_size: int, num_beams: int, max_length: int,
                eos_token_id: int, pad_token_id: int,
                decoder_start_token_id: int,
                length_penalty: float = 1.0,
                early_stopping: bool = True) -> np.ndarray:
    """step_fn(tokens [N,1], pos, cache) -> (log-probs-ready logits [N,V],
    cache); reorder_fn(cache, indices [N]) -> cache gathered on beam axis."""
    n = batch_size * num_beams
    input_ids = np.full((n, 1), decoder_start_token_id, np.int64)
    beam_scores = np.zeros((batch_size, num_beams), np.float64)
    beam_scores[:, 1:] = -1e9
    beam_scores = beam_scores.reshape(n)
    done = [False] * batch_size
    hyps = [BeamHypotheses(num_beams, length_penalty, early_stopping)
            for _ in range(batch_size)]
    cur_len = 1

    while cur_len < max_length:
        logits, cache = step_fn(
            jnp.asarray(input_ids[:, -1:], jnp.int32),
            jnp.asarray(cur_len - 1, jnp.int32), cache)
        logp = np.asarray(
            jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            np.float64)                                       # [N, V]
        vocab = logp.shape[-1]
        next_scores = logp + beam_scores[:, None]
        next_scores = next_scores.reshape(batch_size, num_beams * vocab)
        topk = min(2 * num_beams, next_scores.shape[1])
        top_idx = np.argsort(-next_scores, axis=1, kind="stable")[:, :topk]
        top_val = np.take_along_axis(next_scores, top_idx, axis=1)

        next_beam_scores = np.zeros((batch_size, num_beams), np.float64)
        next_beam_tokens = np.zeros((batch_size, num_beams), np.int64)
        next_beam_indices = np.zeros((batch_size, num_beams), np.int64)

        for b in range(batch_size):
            if done[b]:
                next_beam_scores[b] = 0.0
                next_beam_tokens[b] = pad_token_id
                next_beam_indices[b] = 0
                continue
            beam_idx_in_batch = 0
            for rank in range(topk):
                flat = int(top_idx[b, rank])
                score = float(top_val[b, rank])
                beam_id, token = divmod(flat, vocab)
                bb = b * num_beams + beam_id
                if token == eos_token_id:
                    if rank >= num_beams:
                        continue
                    hyps[b].add(input_ids[bb].copy(), score)
                else:
                    next_beam_scores[b, beam_idx_in_batch] = score
                    next_beam_tokens[b, beam_idx_in_batch] = token
                    next_beam_indices[b, beam_idx_in_batch] = bb
                    beam_idx_in_batch += 1
                if beam_idx_in_batch == num_beams:
                    break
            done[b] = done[b] or hyps[b].is_done(
                float(next_scores[b].max()), cur_len)

        beam_scores = next_beam_scores.reshape(n)
        beam_idx = next_beam_indices.reshape(n)
        input_ids = np.concatenate(
            [input_ids[beam_idx], next_beam_tokens.reshape(n, 1)], axis=1)
        cache = reorder_fn(cache, jnp.asarray(beam_idx, jnp.int32))
        cur_len += 1
        if all(done):
            break

    # finalize
    for b in range(batch_size):
        if done[b]:
            continue
        for beam_id in range(num_beams):
            bb = b * num_beams + beam_id
            hyps[b].add(input_ids[bb].copy(), float(beam_scores[bb]))

    # select best per batch, pad/append eos like HF finalize
    best = []
    for b in range(batch_size):
        best_hyp = max(hyps[b].beams, key=lambda sb: sb[0])[1]
        best.append(best_hyp)
    sent_lengths = [min(len(h) + 1, max_length) for h in best]
    out_len = min(max(sent_lengths), max_length)
    out = np.full((batch_size, out_len), pad_token_id, np.int64)
    for b, h in enumerate(best):
        ln = min(len(h), out_len)
        out[b, :ln] = h[:ln]
        if sent_lengths[b] < max_length:
            out[b, sent_lengths[b] - 1] = eos_token_id
    return out
