"""Build an offline HF *fast* tokenizer directory from a plain wordlist.

Zero-egress hosts cannot fetch the T5 sentencepiece model (and the
`sentencepiece` package itself may be absent).  This writes a WordLevel
`tokenizers` pipeline + `tokenizer_config.json` that
`transformers.AutoTokenizer.from_pretrained(out_dir)` loads as a
`PreTrainedTokenizerFast` with T5-style specials (pad=0, </s>=1, unk=2)
— enough for the whole T5 trainer/decode stack (encode, pad/eos ids,
batch_decode).  Intended for smoke tests and fixtures; point
`t5_tokenizer_path` at a real sentencepiece dir for production quality.

  python -m mm_vqa_healthcare_tpu.cli.make_tokenizer \
      --vocab vocab.txt --out t5_tok/
"""

from __future__ import annotations

import argparse
import json
import os


def build(vocab_path: str, out_dir: str) -> int:
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    words = [l.strip() for l in open(vocab_path) if l.strip()]
    vocab = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for w in words:
        if w not in vocab:
            vocab[w] = len(vocab)
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", pair="$A </s> $B </s>",
        special_tokens=[("</s>", 1)])
    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "<pad>", "eos_token": "</s>",
                   "unk_token": "<unk>", "model_max_length": 512}, f)
    return len(vocab)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vocab", required=True, help="one token per line")
    p.add_argument("--out", required=True, help="output tokenizer dir")
    args = p.parse_args(argv)
    n = build(args.vocab, args.out)
    print(f"wrote {args.out}: {n} tokens (pad=0, </s>=1, unk=2)")


if __name__ == "__main__":
    main()
