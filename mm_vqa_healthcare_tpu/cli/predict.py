"""Batch inference / serving entry: answer (image, question) pairs.

Not present in the reference (which only evaluates over Arrow splits);
this wraps the same model paths for deployment use:

  python -m mm_vqa_healthcare_tpu.cli.predict with \
      task_finetune_vqa_vqa_rad clip16 text_roberta image_size=384 \
      tokenizer=roberta-base load_path=ckpt.ckpt \
      -- --input pairs.jsonl --output answers.jsonl [--head classifier]

pairs.jsonl lines: {"image": "/path/to/img.png", "question": "..."}
Answers stream to --output as {"question", "answer", "qid"} lines.

The compiled step is cached across batches (static shapes), images are
host-decoded once and normalized on device.
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mm_vqa_healthcare_tpu.config import parse_cli
from mm_vqa_healthcare_tpu.data.tokenization import encode_texts, load_tokenizer
from mm_vqa_healthcare_tpu.data.transforms import key_to_transform
from mm_vqa_healthcare_tpu.models.m3ae import M3AE
from mm_vqa_healthcare_tpu.train.trainer import Trainer


class Predictor:
    """Classifier-head answerer over a loaded checkpoint."""

    def __init__(self, config, batch_size: int = 16):
        self.config = config
        self.batch_size = batch_size
        self.trainer = Trainer(config)
        self.trainer.init_params()
        self.tokenizer = load_tokenizer(config["tokenizer"],
                                        config.get("tokenizer_path", ""))
        self.label2ans = self.trainer.label2ans or {}
        tkey = config["val_transform_keys"][0]
        self.transform = key_to_transform(tkey, config["image_size"])
        self._predict = None

    def _build(self):
        model = self.trainer.model
        params = self.trainer.params

        @jax.jit
        def predict(batch):
            out = model.apply(params, batch, method=M3AE.infer)
            logits = model.apply(params, out["multi_modal_cls_feats"],
                                 method=M3AE.apply_vqa_head)
            return jnp.argmax(logits, axis=-1), jax.nn.softmax(
                logits.astype(jnp.float32), -1).max(-1)
        return predict

    def answer(self, image_paths: List[str], questions: List[str]):
        if self._predict is None:
            self._predict = self._build()
        results = []
        bs = self.batch_size
        for start in range(0, len(questions), bs):
            imgs = []
            for p in image_paths[start:start + bs]:
                imgs.append(self.transform(Image.open(p).convert("RGBA")))
            qs = questions[start:start + bs]
            n = len(qs)
            pad = bs - n
            images = np.stack(imgs + [imgs[-1]] * pad).astype(np.float32)
            enc = encode_texts(self.tokenizer, qs + [qs[-1]] * pad,
                               self.config["max_text_len"])
            batch = {
                "image": jnp.asarray(images),
                "text_ids": jnp.asarray(enc["input_ids"]),
                "text_masks": jnp.asarray(enc["attention_mask"]),
            }
            preds, confs = jax.device_get(self._predict(batch))
            for i in range(n):
                label = str(int(preds[i]))
                results.append({
                    "answer": self.label2ans.get(label, label),
                    "confidence": float(confs[i]),
                })
        return results


def main():
    if "--" in sys.argv:
        split_at = sys.argv.index("--")
        cfg_args, rest = sys.argv[1:split_at], sys.argv[split_at + 1:]
    else:
        cfg_args, rest = sys.argv[1:], []
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", default="-")
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args(rest)

    config = parse_cli(cfg_args)
    predictor = Predictor(config, args.batch_size)
    pairs = [json.loads(line) for line in open(args.input) if line.strip()]
    answers = predictor.answer([p["image"] for p in pairs],
                               [p["question"] for p in pairs])
    out = (sys.stdout if args.output == "-" else open(args.output, "w"))
    for pair, ans in zip(pairs, answers):
        out.write(json.dumps({"question": pair["question"],
                              "qid": pair.get("qid"), **ans}) + "\n")


if __name__ == "__main__":
    main()
