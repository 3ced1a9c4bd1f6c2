"""Metric-class tests (reference my_metrics.py semantics), incl. the
VQARADScore bug-compat switch and BLEU smoothing-1 values."""

import numpy as np

from mm_vqa_healthcare_tpu.train import metrics as M
from mm_vqa_healthcare_tpu.utils.text_metrics import (
    porter_stem, rouge_n_recall, sentence_bleu)


def test_accuracy_ignores_minus_100():
    m = M.Accuracy()
    logits = np.asarray([[0.1, 0.9], [0.9, 0.1], [0.2, 0.8]])
    target = np.asarray([1, 1, -100])
    m.update(logits, target)
    assert m.compute() == 0.5


def test_scalar_running_mean():
    m = M.Scalar()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.compute() == 2.0


def test_vqa_score_soft_targets():
    m = M.VQAScore()
    logits = np.asarray([[3.0, 0.0], [0.0, 3.0]])
    target = np.asarray([[1.0, 0.0], [0.3, 0.0]])
    m.update(logits, target)
    assert abs(m.compute() - 0.5) < 1e-6  # (1.0 + 0.0)/2


def test_vqarad_closed_open_correct_mode():
    m = M.VQARADScore(bug_compat=False)
    logits = np.asarray([[3.0, 0.0], [0.0, 3.0], [3.0, 0.0]])
    target = np.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 1.0]])
    types = np.asarray([0, 0, 1])
    m.update(logits, target, types)
    assert m.compute() == 2.0 / 3.0
    assert m.close_score / m.close_total == 1.0
    assert m.open_score / m.open_total == 0.0
    best = m.get_best_score()
    assert abs(best - 2.0 / 3.0) < 1e-9
    assert m.get_best_close_score() == 1.0


def test_vqarad_bug_compat_mode_differs():
    args = (np.asarray([[3.0, 0.0]]), np.asarray([[1.0, 0.0]]),
            np.asarray([0]))
    correct = M.VQARADScore(bug_compat=False)
    correct.update(*args)
    buggy = M.VQARADScore(bug_compat=True)
    buggy.update(*args)
    # buggy multiplies the running TOTAL score into the type mask
    assert buggy.close_score == buggy.score
    assert correct.close_score == 1.0


def test_bleu_single_token_self_reference():
    """BLEU of a 1-token answer vs itself: p1=1, p2..4 smoothed to 0.1
    -> (0.1^3)^(1/4) ~ 0.178 (what the reference's self-reference BLEU
    yields on single-word answers)."""
    score = sentence_bleu([["yes"]], ["yes"])
    assert abs(score - (0.1 ** 3) ** 0.25) < 1e-9


def test_bleu_exact_4gram():
    hyp = "a b c d e".split()
    assert abs(sentence_bleu([hyp], hyp) - 1.0) < 1e-9


def test_rouge_recall_with_stemming():
    assert rouge_n_recall("running tests", "running", 1) == 0.5
    # stemming: 'running' -> 'run', 'runs' -> 'run'
    assert rouge_n_recall("running", "runs", 1) == 1.0


def test_porter_stem_samples():
    for word, stem in [("caresses", "caress"), ("ponies", "poni"),
                       ("relational", "relat"), ("hopeful", "hope"),
                       ("electrical", "electr"), ("running", "run")]:
        assert porter_stem(word) == stem, (word, porter_stem(word))


def test_exact_match_list_unwrap():
    m = M.VQAExactMatch()
    m.update([["yes"], "no"], [["yes"], "yes"])
    assert m.compute() == 0.5


def test_roc_f1_metrics():
    roc = M.ROCScore()
    f1 = M.F1Score()
    logits = np.asarray([2.0, -2.0, 1.5, -1.0])
    target = np.asarray([1.0, 0.0, 1.0, 0.0])
    roc.update(logits, target)
    f1.update(logits, target)
    assert roc.compute() == 1.0
    assert f1.compute() == 1.0
