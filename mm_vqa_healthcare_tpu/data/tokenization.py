"""Tokenizer loading and MLM collation.

The reference uses HF fast tokenizers (BertTokenizerFast /
RobertaTokenizerFast, base_datamodule.py:13-26) and the HF
DataCollatorForWholeWordMask / DataCollatorForLanguageModeling
(base_datamodule.py:62-69).  This module:

  * loads tokenizers offline — from an explicit path (vocab.txt dir /
    tokenizer.json), the HF cache when present, or hub as a last resort,
  * re-implements both MLM collators in numpy with HF-identical semantics
    (15% selection; of masked: 80% [MASK], 10% random, 10% unchanged;
    whole-word grouping via the "##" word-piece continuation convention),
    so there is no torch dependency in the input pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


def load_tokenizer(name: str, tokenizer_path: str = ""):
    """Resolve a tokenizer offline-first.  `name` is the reference config's
    `tokenizer` key; `tokenizer_path` (TPU-config addition) points at local
    files when the HF cache is unavailable (zero-egress environments)."""
    from transformers import AutoTokenizer, BertTokenizerFast, RobertaTokenizerFast
    if tokenizer_path:
        path = tokenizer_path
        if os.path.isdir(path):
            return AutoTokenizer.from_pretrained(path)
        if path.endswith("vocab.txt"):
            lower = "uncased" in name or "roberta" not in name
            return BertTokenizerFast(vocab_file=path, do_lower_case=lower)
        raise FileNotFoundError(f"tokenizer_path {path!r} not found")
    try:
        return AutoTokenizer.from_pretrained(name)
    except Exception as e:  # offline without cache
        raise RuntimeError(
            f"Cannot load tokenizer {name!r} (offline, no cache). "
            f"Set config tokenizer_path to a local vocab dir.") from e


def _is_special(token: str, special_tokens: set) -> bool:
    return token in special_tokens


def whole_word_mask_indices(tokens: List[str], mlm_prob: float,
                            rng: np.random.Generator,
                            special_tokens: set,
                            max_predictions: int = 512) -> np.ndarray:
    """HF DataCollatorForWholeWordMask candidate selection: group "##"
    continuations with the preceding token, shuffle word starts, take words
    until ceil(prob * len) tokens are covered.  Returns 0/1 mask array."""
    cand_indexes: List[List[int]] = []
    for i, token in enumerate(tokens):
        if _is_special(token, special_tokens):
            continue
        if cand_indexes and token.startswith("##"):
            cand_indexes[-1].append(i)
        else:
            cand_indexes.append([i])
    rng.shuffle(cand_indexes)
    num_to_predict = min(max_predictions,
                         max(1, int(round(len(tokens) * mlm_prob))))
    mask = np.zeros(len(tokens), dtype=bool)
    covered = 0
    for word in cand_indexes:
        if covered >= num_to_predict:
            break
        if covered + len(word) > num_to_predict:
            continue
        for idx in word:
            mask[idx] = True
        covered += len(word)
    return mask


class MLMCollator:
    """Masks token ids like HF DataCollatorForLanguageModeling /
    DataCollatorForWholeWordMask (mlm_probability=0.15,
    base_datamodule.py:62-69).

    Input: already-padded [B, L] int ids + the tokenizer.  Output:
    (masked_ids, labels) with labels = -100 on unmasked positions.
    """

    def __init__(self, tokenizer, mlm_prob: float = 0.15,
                 whole_word: bool = True, seed: int | None = None):
        self.tokenizer = tokenizer
        self.mlm_prob = mlm_prob
        self.whole_word = whole_word
        self.rng = np.random.default_rng(seed)
        self.mask_token_id = tokenizer.mask_token_id
        self.vocab_size = len(tokenizer)
        self.special_tokens = set(tokenizer.all_special_tokens)
        self.special_ids = np.asarray(tokenizer.all_special_ids, np.int64)

    def _selection_mask(self, ids: np.ndarray) -> np.ndarray:
        b, l = ids.shape
        if self.whole_word:
            sel = np.zeros((b, l), dtype=bool)
            for i in range(b):
                tokens = self.tokenizer.convert_ids_to_tokens(list(ids[i]))
                sel[i] = whole_word_mask_indices(
                    tokens, self.mlm_prob, self.rng, self.special_tokens)
            # never mask padding
            sel &= ids != self.tokenizer.pad_token_id
            return sel
        prob = np.full((b, l), self.mlm_prob)
        special = np.isin(ids, self.special_ids)
        prob[special] = 0.0
        prob[ids == self.tokenizer.pad_token_id] = 0.0
        return self.rng.random((b, l)) < prob

    def __call__(self, ids: np.ndarray):
        ids = np.asarray(ids, np.int64)
        labels = ids.copy()
        sel = self._selection_mask(ids)
        labels[~sel] = -100
        masked = ids.copy()
        # 80% -> [MASK]
        replace = sel & (self.rng.random(ids.shape) < 0.8)
        masked[replace] = self.mask_token_id
        # 10% (half of remainder) -> random token
        random_tok = (sel & ~replace
                      & (self.rng.random(ids.shape) < 0.5))
        masked[random_tok] = self.rng.integers(
            0, self.vocab_size, size=int(random_tok.sum()))
        # remaining 10% unchanged
        return masked, labels


def encode_texts(tokenizer, texts: Sequence[str],
                 max_text_len: int) -> Dict[str, np.ndarray]:
    """Tokenize a batch to fixed length (reference get_text,
    base_dataset.py:113-129: padding='max_length', truncation=True)."""
    enc = tokenizer(
        list(texts), padding="max_length", truncation=True,
        max_length=max_text_len, return_attention_mask=True)
    return {
        "input_ids": np.asarray(enc["input_ids"], np.int32),
        "attention_mask": np.asarray(enc["attention_mask"], np.int32),
    }
