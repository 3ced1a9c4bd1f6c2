"""Text metrics for generative VQA (reference m3ae/gadgets/my_metrics.py).

Dependency-free re-implementations with the reference's exact formulas:
  * ROUGE-1/2 *recall* with Porter stemming (my_metrics.py:99-134 uses
    google rouge_scorer recall; tokenization = lowercase, non-alphanumeric
    -> space, stem tokens longer than 3 chars).
  * BLEU via NLTK sentence_bleu semantics: 4-gram geometric mean,
    smoothing method1 (eps=0.1 on zero numerators), denominators clamped
    to 1, standard brevity penalty (my_metrics.py:138-162).
    NOTE the reference tokenizes the *prediction* as the BLEU reference
    (my_metrics.py:152) so BLEU measures self-similarity; `bug_compat=True`
    (default, for score parity) reproduces that; False scores against the
    true label.
  * Exact match (my_metrics.py:80-96).

The stemmer is the classic Porter algorithm.  (rouge_score uses NLTK's
Porter with NLTK_EXTENSIONS; the outputs agree on all but a handful of
irregular words, and VQA answers are short medical terms — documented
deviation.)
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import List, Sequence

# ---------------------------------------------------------------------------
# Porter stemmer (classic algorithm)
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    forms = ""
    for i in range(len(stem)):
        forms += "c" if _is_cons(stem, i) else "v"
    return forms.count("vc")  # number of VC sequences


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _is_cons(word, len(word) - 1))


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (_is_cons(word, len(word) - 3)
            and not _is_cons(word, len(word) - 2)
            and _is_cons(word, len(word) - 1)
            and word[-1] not in "wxy")


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
             ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
             ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
             ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
             ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
             ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
             ("biliti", "ble")]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
             ("ical", "ic"), ("ful", ""), ("ness", "")]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    step4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
             "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
             "ous", "ive", "ize"]
    for suf in sorted(step4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    continue
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        if _measure(stem) > 1 or (_measure(stem) == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# ROUGE recall (rouge_score semantics)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def rouge_tokenize(text: str, stem: bool = True) -> List[str]:
    tokens = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if stem:
        tokens = [porter_stem(t) if len(t) > 3 else t for t in tokens]
    return tokens


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def rouge_n_recall(target: str, prediction: str, n: int) -> float:
    """rouge_scorer.score(target, pred)['rougeN'].recall"""
    t = _ngrams(rouge_tokenize(target), n)
    p = _ngrams(rouge_tokenize(prediction), n)
    if not t:
        return 0.0
    overlap = sum(min(cnt, p[g]) for g, cnt in t.items())
    return overlap / sum(t.values())


# ---------------------------------------------------------------------------
# BLEU (nltk sentence_bleu, smoothing method1)
# ---------------------------------------------------------------------------

def sentence_bleu(references: List[List[str]], hypothesis: List[str],
                  max_n: int = 4, eps: float = 0.1) -> float:
    if len(hypothesis) == 0:
        return 0.0
    weights = [1.0 / max_n] * max_n
    log_sum = 0.0
    for n in range(1, max_n + 1):
        hyp_ngrams = _ngrams(hypothesis, n)
        max_ref = Counter()
        for ref in references:
            for g, c in _ngrams(ref, n).items():
                max_ref[g] = max(max_ref[g], c)
        numerator = sum(min(c, max_ref[g]) for g, c in hyp_ngrams.items())
        denominator = max(1, sum(hyp_ngrams.values()))
        p_n = numerator / denominator if numerator > 0 else eps / denominator
        if p_n == 0.0:
            return 0.0
        log_sum += weights[n - 1] * math.log(p_n)
    c = len(hypothesis)
    ref_lens = [len(r) for r in references]
    r = min(ref_lens, key=lambda rl: (abs(rl - c), rl))
    bp = 1.0 if c > r else math.exp(1 - r / c) if c > 0 else 0.0
    return bp * math.exp(log_sum)


# ---------------------------------------------------------------------------
# Aggregating metric states (reference my_metrics.py classes)
# ---------------------------------------------------------------------------

class TextMetrics:
    """Running ROUGE1/2, BLEU, exact-match over (pred, target) string pairs
    — semantics of ROUGE1Score/ROUGE2Score/BLEUScore/VQAExactMatch
    (my_metrics.py:80-162).  `tokenizer` supplies BLEU tokenization (the
    reference BERT-tokenizes); falls back to whitespace."""

    def __init__(self, tokenizer=None, bug_compat: bool = True):
        self.tokenizer = tokenizer
        self.bug_compat = bug_compat
        self.reset()

    def reset(self):
        self.rouge1 = self.rouge2 = self.bleu = self.exact = 0.0
        self.total = 0

    def _bleu_tokens(self, text: str) -> List[str]:
        if self.tokenizer is not None:
            return self.tokenizer.tokenize(text)
        return text.split()

    def update(self, preds: Sequence, targets: Sequence):
        for pred, target in zip(preds, targets):
            p = pred[0] if isinstance(pred, list) else pred
            t = target[0] if isinstance(target, list) else target
            self.rouge1 += rouge_n_recall(t, p, 1)
            self.rouge2 += rouge_n_recall(t, p, 2)
            hyp = self._bleu_tokens(p)
            ref = self._bleu_tokens(p if self.bug_compat else t)
            self.bleu += sentence_bleu([ref], hyp)
            self.exact += float(p == t)
            self.total += 1

    def compute(self) -> dict:
        n = max(1, self.total)
        return {"rouge1": self.rouge1 / n, "rouge2": self.rouge2 / n,
                "bleu": self.bleu / n, "exact_match": self.exact / n}
