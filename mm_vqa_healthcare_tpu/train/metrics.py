"""Metric classes with the reference API (m3ae/gadgets/my_metrics.py).

numpy running-state re-implementations of every torchmetrics class the
reference defines, update/compute/reset compatible, plus multi-host
aggregation via collectives (the dist_reduce_fx="sum" equivalent).

VQARADScore reproduces the reference's closed/open accounting bug behind
``bug_compat`` (my_metrics.py:178-186 multiplies the *running total score*
into the per-type sums); the default here is the corrected math —
SURVEY.md §2.6 notes the upstream accounting is broken, and the headline
overall score is identical either way.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from mm_vqa_healthcare_tpu.utils.text_metrics import (
    rouge_n_recall, sentence_bleu)


class Metric:
    def reset(self):
        raise NotImplementedError

    def sync(self):
        """Multi-host sum of the numeric states."""
        from mm_vqa_healthcare_tpu.parallel import collectives
        if collectives.process_count() == 1:
            return
        for name in self._sum_states():
            vals = collectives.all_gather_object(getattr(self, name))
            setattr(self, name, float(np.sum(vals)))

    def _sum_states(self) -> Sequence[str]:
        return ()


class Accuracy(Metric):
    """argmax == target, ignoring -100 (my_metrics.py:13-36)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.correct = 0.0
        self.total = 0.0

    def _sum_states(self):
        return ("correct", "total")

    def update(self, logits: np.ndarray, target: np.ndarray):
        logits, target = np.asarray(logits), np.asarray(target)
        preds = logits.argmax(-1)
        mask = target != -100
        self.correct += float((preds[mask] == target[mask]).sum())
        self.total += float(mask.sum())

    def compute(self) -> float:
        return self.correct / self.total if self.total else 0.0


class Scalar(Metric):
    """Running mean of a scalar (my_metrics.py:39-54)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.scalar = 0.0
        self.total = 0.0

    def _sum_states(self):
        return ("scalar", "total")

    def update(self, value):
        self.scalar += float(value)
        self.total += 1.0

    def compute(self) -> float:
        return self.scalar / self.total if self.total else 0.0


class VQAScore(Metric):
    """one_hot(argmax) . soft-target (my_metrics.py:57-77)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.score = 0.0
        self.total = 0.0

    def _sum_states(self):
        return ("score", "total")

    def update(self, logits: np.ndarray, target: np.ndarray):
        logits, target = np.asarray(logits), np.asarray(target)
        preds = logits.argmax(1)
        sample_scores = np.take_along_axis(target, preds[:, None], 1)[:, 0]
        self.score += float(sample_scores.sum())
        self.total += float(len(preds))
        return sample_scores

    def compute(self) -> float:
        return self.score / self.total if self.total else 0.0


class VQARADScore(VQAScore):
    """VQAScore + closed/open splits + sticky best tracking
    (my_metrics.py:165-199)."""

    def __init__(self, bug_compat: bool = False):
        self.bug_compat = bug_compat
        super().__init__()
        self.best_score = 0.0
        self.best_close_score = 0.0
        self.best_open_score = 0.0

    def reset(self):
        super().reset()
        self.close_score = 0.0
        self.close_total = 0.0
        self.open_score = 0.0
        self.open_total = 0.0

    def _sum_states(self):
        return ("score", "total", "close_score", "close_total",
                "open_score", "open_total")

    def update(self, logits, target, types: Optional[np.ndarray] = None):
        sample_scores = super().update(logits, target)
        types = np.asarray(types)
        if self.bug_compat:
            # reference multiplies the RUNNING TOTAL into per-type masks
            # (my_metrics.py:180-186) and counts numel() per batch
            close = (types == 0).astype(np.float32) * self.score
            open_ = (types == 1).astype(np.float32) * self.score
            self.close_score += float(close.sum())
            self.close_total += float(close.size)
            self.open_score += float(open_.sum())
            self.open_total += float(open_.size)
        else:
            self.close_score += float(sample_scores[types == 0].sum())
            self.close_total += float((types == 0).sum())
            self.open_score += float(sample_scores[types == 1].sum())
            self.open_total += float((types == 1).sum())

    def get_best_score(self) -> float:
        if self.total and (self.score / self.total) > self.best_score:
            self.best_score = self.compute()
            self.best_close_score = (self.close_score / self.close_total
                                     if self.close_total else 0.0)
            self.best_open_score = (self.open_score / self.open_total
                                    if self.open_total else 0.0)
        return self.best_score

    def get_best_close_score(self) -> float:
        return self.best_close_score

    def get_best_open_score(self) -> float:
        return self.best_open_score


class VQAExactMatch(Metric):
    def __init__(self):
        self.reset()

    def reset(self):
        self.exact = 0.0
        self.total = 0.0

    def _sum_states(self):
        return ("exact", "total")

    def update(self, preds, targets):
        for p, t in zip(preds, targets):
            p = p[0] if isinstance(p, list) else p
            t = t[0] if isinstance(t, list) else t
            self.exact += float(p == t)
            self.total += 1

    def compute(self):
        return self.exact / self.total if self.total else 0.0


class ROUGEScore(Metric):
    """ROUGE-N recall with stemming (my_metrics.py:99-134)."""

    def __init__(self, n: int):
        self.n = n
        self.reset()

    def reset(self):
        self.score = 0.0
        self.total = 0.0

    def _sum_states(self):
        return ("score", "total")

    def update(self, preds, targets):
        for p, t in zip(preds, targets):
            p = p[0] if isinstance(p, list) else p
            t = t[0] if isinstance(t, list) else t
            self.score += rouge_n_recall(t, p, self.n)
            self.total += 1

    def compute(self):
        return self.score / self.total if self.total else 0.0


def ROUGE1Score():
    return ROUGEScore(1)


def ROUGE2Score():
    return ROUGEScore(2)


class BLEUScore(Metric):
    """NLTK sentence_bleu smoothing-1; the reference tokenizes the
    prediction as its own reference (my_metrics.py:152) — bug_compat."""

    def __init__(self, tokenizer=None, bug_compat: bool = True):
        self.tokenizer = tokenizer
        self.bug_compat = bug_compat
        self.reset()

    def reset(self):
        self.score = 0.0
        self.total = 0.0

    def _sum_states(self):
        return ("score", "total")

    def _tok(self, text):
        return (self.tokenizer.tokenize(text) if self.tokenizer is not None
                else text.split())

    def update(self, preds, targets):
        for p, t in zip(preds, targets):
            p = p[0] if isinstance(p, list) else p
            t = t[0] if isinstance(t, list) else t
            hyp = self._tok(p)
            ref = self._tok(p if self.bug_compat else t)
            self.score += sentence_bleu([ref], hyp)
            self.total += 1

    def compute(self):
        return self.score / self.total if self.total else 0.0


class ROCScore(Metric):
    """sklearn AUROC on sigmoid outputs (my_metrics.py:202-224; unused at
    reference HEAD but part of the API)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.y_true: List[np.ndarray] = []
        self.y_score: List[np.ndarray] = []

    def update(self, logits, target):
        self.y_true.append(np.asarray(target, np.float32))
        self.y_score.append(1.0 / (1.0 + np.exp(-np.asarray(logits,
                                                            np.float32))))

    def compute(self):
        try:
            import sklearn.metrics as sklm
            return float(sklm.roc_auc_score(
                np.concatenate(self.y_true), np.concatenate(self.y_score)))
        except Exception:
            return 0.0


class F1Score(Metric):
    """sklearn F1 on thresholded sigmoid outputs (my_metrics.py:227-250)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.y_true: List[np.ndarray] = []
        self.y_pred: List[np.ndarray] = []

    def update(self, logits, target):
        self.y_true.append(np.asarray(target, np.float32))
        prob = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float32)))
        self.y_pred.append((prob > 0.5).astype(np.float32))

    def compute(self):
        try:
            import sklearn.metrics as sklm
            return float(sklm.f1_score(
                np.concatenate(self.y_true), np.concatenate(self.y_pred)))
        except Exception:
            return 0.0
