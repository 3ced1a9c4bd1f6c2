"""Batch inference / serving entry: answer (image, question) pairs.

Not present in the reference (which only evaluates over Arrow splits);
this wraps the same model paths for deployment use:

  python -m mm_vqa_healthcare_tpu.cli.predict with \
      task_finetune_vqa_vqa_rad clip16 text_roberta image_size=384 \
      tokenizer=roberta-base load_path=ckpt.ckpt \
      -- --input pairs.jsonl --output answers.jsonl \
         [--head classifier|decoder|t5] [--variant mm]

pairs.jsonl lines: {"image": "/path/to/img.png", "question": "..."}
Answers stream to --output as {"question", "answer", "qid"} lines
(classifier adds "confidence"; decoder runs KV-cached greedy; t5 runs
beam-4 — set beam_impl=device in the config for the single-scan device
beam).  --batch_size must be divisible by the data-mesh axis.

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


class _BatchPrep:
    """Shared host-side batching: PIL decode + transform + tokenize, padded
    to a fixed batch (static shapes keep one compiled program)."""

    def _prep(self, image_paths, questions):
        imgs = [self.transform(Image.open(p).convert("RGBA"))
                for p in image_paths]
        n = len(questions)
        pad = self.batch_size - n
        images = np.stack(imgs + [imgs[-1]] * pad).astype(np.float32)
        enc = encode_texts(self.tokenizer, questions + [questions[-1]] * pad,
                           self.config["max_text_len"])
        return {
            "image": jnp.asarray(images),
            "text_ids": jnp.asarray(enc["input_ids"]),
            "text_masks": jnp.asarray(enc["attention_mask"]),
        }, n


class Predictor(_BatchPrep):
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

        # params as a jit ARGUMENT: closure-captured arrays serialize as
        # constants into remote-compile requests (HTTP 413 at model scale)
        @jax.jit
        def predict(params, batch):
            out = model.apply(params, batch, method=M3AE.infer)
            logits = model.apply(params, out["multi_modal_cls_feats"],
                                 method=M3AE.apply_vqa_head)
            return jnp.argmax(logits, axis=-1), jax.nn.softmax(
                logits.astype(jnp.float32), -1).max(-1)
        return lambda batch: predict(self.trainer.params, batch)

    def answer(self, image_paths: List[str], questions: List[str]):
        if self._predict is None:
            self._predict = self._build()
        results = []
        bs = self.batch_size
        for start in range(0, len(questions), bs):
            batch, n = self._prep(image_paths[start:start + bs],
                                  questions[start:start + bs])
            preds, confs = jax.device_get(self._predict(batch))
            for i in range(n):
                label = str(int(preds[i]))
                results.append({
                    "answer": self.label2ans.get(label, label),
                    "confidence": float(confs[i]),
                })
        return results


class DecoderPredictor(_BatchPrep):
    """Generative decoder-head answerer: KV-cached greedy search
    (reference test_m3ae_decoder.sh path)."""

    def __init__(self, config, batch_size: int = 16):
        from mm_vqa_healthcare_tpu.train.decoder_trainer import (
            DecoderTrainer)
        self.config = config
        self.batch_size = batch_size
        self.trainer = DecoderTrainer(config)
        self.trainer.init_params()
        self.tokenizer = self.trainer.tokenizer
        tkey = config["val_transform_keys"][0]
        self.transform = key_to_transform(tkey, config["image_size"])

    def answer(self, image_paths: List[str], questions: List[str]):
        decode = self.trainer._get_jitted("decode")
        results = []
        bs = self.batch_size
        for start in range(0, len(questions), bs):
            batch, n = self._prep(image_paths[start:start + bs],
                                  questions[start:start + bs])
            tokens = np.asarray(jax.device_get(
                decode(self.trainer.params, batch)))
            for seq in tokens[:n]:
                results.append({"answer": self.tokenizer.decode(
                    seq, skip_special_tokens=True)})
        return results


class T5Predictor(_BatchPrep):
    """Generative T5-head answerer: beam-4 search (reference
    m3ae_t5_mm_encoder_input generate path).  `beam_impl=device` runs the
    whole token loop as one jitted scan (decode/beam_device.py)."""

    def __init__(self, config, batch_size: int = 16, variant: str = "mm",
                 t5_tokenizer=None):
        from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer
        self.config = config
        self.batch_size = batch_size
        self.trainer = T5Trainer(config, variant=variant,
                                 tokenizer=t5_tokenizer)
        self.trainer.init_params()
        self.tokenizer = load_tokenizer(config["tokenizer"],
                                        config.get("tokenizer_path", ""))
        tkey = config["val_transform_keys"][0]
        self.transform = key_to_transform(tkey, config["image_size"])

    def answer(self, image_paths: List[str], questions: List[str]):
        tok = self.trainer.t5_tokenizer
        results = []
        bs = self.batch_size
        for start in range(0, len(questions), bs):
            batch, n = self._prep(image_paths[start:start + bs],
                                  questions[start:start + bs])
            seqs = self.trainer.generate(batch, jax.random.key(0))
            for text in tok.batch_decode(seqs[:n],
                                         skip_special_tokens=True):
                results.append({"answer": text})
        return results


HEADS = {"classifier": Predictor, "decoder": DecoderPredictor,
         "t5": T5Predictor}


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
    parser.add_argument("--head", choices=sorted(HEADS),
                        default="classifier")
    parser.add_argument("--variant", default="mm",
                        help="T5 head variant (mm|combined|text)")
    args = parser.parse_args(rest)

    config = parse_cli(cfg_args)
    if args.head == "t5":
        predictor = T5Predictor(config, args.batch_size,
                                variant=args.variant)
    else:
        predictor = HEADS[args.head](config, args.batch_size)
    pairs = [json.loads(line) for line in open(args.input) if line.strip()]
    answers = predictor.answer([p["image"] for p in pairs],
                               [p["question"] for p in pairs])
    out = (sys.stdout if args.output == "-" else open(args.output, "w"))
    for pair, ans in zip(pairs, answers):
        out.write(json.dumps({"question": pair["question"],
                              "qid": pair.get("qid"), **ans}) + "\n")


if __name__ == "__main__":
    main()
