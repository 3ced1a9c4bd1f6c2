"""Explicit fixtures pinning transformers-4.6 beam-search edge semantics.

The reference pins transformers==4.6.0 (reference requirements.txt:4); the
T5 heads decode with num_beams=4, early_stopping=True
(m3ae_t5_mm_encoder_input.py:209-218).  The oracle tests in test_t5.py
compare against the INSTALLED transformers (4.57.x) — fine for the stable
core protocol, but the 4.6 edge rules deserve fixtures that cannot drift
with the installed version (VERDICT r2 item 6).  Each scenario scripts
per-step logits, hand-derives the 4.6-rule outcome (worked in comments),
and asserts exact output token sequences + step counts:

  1. early_stopping=True stops the batch the moment num_beams hypotheses
     exist, even when continuing could surface better hypotheses
     (BeamHypotheses.is_done, 4.6 generation_beam_search).
  2. hypothesis score = sum_logprobs / len**length_penalty with len
     counting the prefix INCLUDING decoder_start and EXCLUDING the EOS
     being added — the normalization that makes length_penalty flip
     short-vs-long winners.
  3. EOS candidates enter the hypothesis pool ONLY from the top-num_beams
     ranks of the 2k expansion; an EOS at rank >= num_beams is discarded
     (not a beam, not a hypothesis).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.decode.beam import beam_search

pytestmark = pytest.mark.fast

PAD, EOS, T2, T3 = 0, 1, 2, 3


def _scripted(step_tables):
    """step_fn keyed on (step index, last token); counts calls.
    step_tables: list per step of {last_token: logits[V]}."""
    calls = {"n": 0}

    def step_fn(tokens, pos, cache):
        step = int(cache)
        table = step_tables[step]
        toks = np.asarray(tokens)[:, 0]
        logits = np.stack([np.asarray(table[int(t)], np.float32)
                           for t in toks])
        calls["n"] += 1
        return jnp.asarray(logits), cache + 1

    return step_fn, (lambda cache, idx: cache), calls


def _run(step_tables, lp=1.0, es=True, max_length=4, num_beams=2):
    step_fn, reorder, calls = _scripted(step_tables)
    out = beam_search(step_fn, reorder, 0, batch_size=1,
                      num_beams=num_beams, max_length=max_length,
                      eos_token_id=EOS, pad_token_id=PAD,
                      decoder_start_token_id=0, length_penalty=lp,
                      early_stopping=es)
    return out, calls["n"]


def test_early_stopping_halts_at_num_beams_hypotheses():
    # Step 1 (all beams at start token): ranks t2 > eos > t3; eos at rank 1
    # (< num_beams) becomes hypothesis #1 (seq [0], sum=-1.1804).
    # Step 2 (beam [0,2] leads): eos tops its expansion -> hypothesis #2
    # ([0,2], sum=-0.6896, len 2 -> -0.3448).  Two hypotheses == num_beams
    # -> early_stopping=True is done; step_fn ran exactly 2 times; best
    # hypothesis is [0,2] -> output [0,2,EOS].
    tables = [
        {0: [-10.0, -0.5, 0.0, -1.0]},
        {T2: [-10.0, 0.0, -5.0, -6.0],
         T3: [-10.0, -3.0, -0.1, -2.0]},
        # step 3 only reached without early stopping
        {T2: [-10.0, 0.0, -5.0, -6.0],
         T3: [-10.0, -3.0, -0.1, -2.0]},
    ]
    out, n_steps = _run(tables, es=True)
    np.testing.assert_array_equal(out, [[0, T2, EOS]])
    assert n_steps == 2
    # without early stopping the same logits keep searching one more step
    # (is_done: best/cur_len**lp <= worst only at step 3)
    out2, n_steps2 = _run(tables, es=False)
    np.testing.assert_array_equal(out2, [[0, T2, EOS]])
    assert n_steps2 == 3


def test_length_penalty_normalizes_by_prefix_len():
    # s_short = logp(eos@1) = -1.4636 (len 1: prefix [0]);
    # s_long = logp(t2@1)+logp(eos@2) = -0.2636 + -3.3851 = -3.6487 (len 2).
    # lp=1: -1.4636 > -1.8243 -> SHORT wins -> [0, EOS].
    # lp=2: -1.4636 < -3.6487/4 = -0.9122 -> LONG wins -> [0, T2, EOS].
    tables = [
        {0: [-10.0, -1.2, 0.0, -8.0]},
        {T2: [-10.0, -3.4, -0.05, -8.0],
         T3: [-10.0, -3.4, -0.05, -8.0]},
    ]
    out_lp1, _ = _run(tables, lp=1.0)
    np.testing.assert_array_equal(out_lp1, [[0, EOS]])
    out_lp2, _ = _run(tables, lp=2.0)
    np.testing.assert_array_equal(out_lp2, [[0, T2, EOS]])


def test_eos_beyond_top_num_beams_ranks_is_discarded():
    # Step 1: no eos in play -> beams [0,2] (-0.4742), [0,3] (-0.9742).
    # Step 2 candidate ranking: eos@beam0 (rank 0 -> hypothesis),
    # t2@beam0 (rank 1 -> beam), eos@beam1 (rank 2 >= num_beams ->
    # DISCARDED by the 4.6 rule), t2@beam1 (-> beam).  Only ONE hypothesis
    # exists, so the batch is NOT done; max_length=3 ends the loop and
    # finalize adds the open beams, whose best ([0,2,2], -1.2187/3 =
    # -0.4062) beats the eos hypothesis ([0,2], -1.1187/2 = -0.5593).
    # An implementation that wrongly pools rank-2 EOS candidates would be
    # done at step 2 (two hypotheses + early stopping) and emit [0,2,EOS].
    tables = [
        {0: [-10.0, -9.0, 0.0, -0.5]},
        {T2: [-10.0, -0.3, -0.4, -10.0],
         T3: [-10.0, -0.6, -0.7, -10.0]},
    ]
    out, n_steps = _run(tables, max_length=3)
    np.testing.assert_array_equal(out, [[0, T2, T2]])
    assert n_steps == 2
