"""Synthetic dataset fixtures: tiny images + VQA arrows + WordPiece vocab.

Generates data in the reference's exact on-disk formats (prepro arrow
schemas + label2ans.json + HF vocab.txt) at debug scale.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np
from PIL import Image

QUESTIONS = [
    ("is there cardiomegaly", "yes", "closed"),
    ("is the lung normal", "no", "closed"),
    ("what is the location of the mass", "left lower lobe", "open"),
    ("what imaging modality was used", "xray", "open"),
    ("is there pleural effusion", "no", "closed"),
    ("what organ is shown", "lung", "open"),
    ("is the heart enlarged", "yes", "closed"),
    ("what abnormality is seen", "mass", "open"),
]

VOCAB_WORDS = [
    "is", "there", "the", "a", "what", "of", "was", "used", "shown", "seen",
    "cardiomegaly", "lung", "normal", "location", "mass", "imaging",
    "modality", "xray", "pleural", "effusion", "organ", "heart", "enlarged",
    "abnormality", "yes", "no", "left", "lower", "lobe", "and", "or",
    "##s", "##ing", "##ed", "caption", "chest", "radiograph", "showing",
    "opacity", "in", "an", "with", "patient",
]


def write_vocab(path: str) -> str:
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab = specials + VOCAB_WORDS
    vocab += [f"[unused{i}]" for i in range(200 - len(vocab))]
    with open(path, "w") as f:
        f.write("\n".join(vocab))
    return path


def make_images(img_dir: str, n: int = 6, size: int = 48):
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), np.uint8)
        p = os.path.join(img_dir, f"img_{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def make_vqa_fixture(root: str) -> Tuple[str, str, str]:
    """Returns (data_root, label2ans_path, vocab_path)."""
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow_vqa_m3ae

    img_paths = make_images(os.path.join(root, "images"))
    data = {"train": [], "val": [], "test": []}
    qid = 0
    for split, count in [("train", 8), ("val", 4), ("test", 4)]:
        for i in range(count):
            q, a, at = QUESTIONS[qid % len(QUESTIONS)]
            data[split].append({
                "img_path": img_paths[qid % len(img_paths)],
                "qid": qid, "question": q, "answer": a, "answer_type": at,
            })
            qid += 1
    data_root = os.path.join(root, "arrows")
    label2ans = os.path.join(data_root, "label2ans.json")
    os.makedirs(data_root, exist_ok=True)
    make_arrow_vqa_m3ae(data, "vqa_vqa_rad", data_root,
                        label2ans_path=label2ans)
    vocab = write_vocab(os.path.join(root, "vocab.txt"))
    return data_root, label2ans, vocab


def make_caption_fixture(root: str, name: str = "roco") -> str:
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow

    img_paths = make_images(os.path.join(root, "cap_images"), n=10)
    data = {"train": [], "val": [], "test": []}
    captions = ["chest radiograph showing opacity",
                "xray of the lung with mass",
                "normal chest radiograph",
                "heart enlarged in patient"]
    next_img = 0
    for split, count in [("train", 6), ("val", 2), ("test", 2)]:
        for i in range(count):
            data[split].append({
                "img_path": img_paths[next_img],
                "texts": [captions[i % len(captions)]],
            })
            next_img += 1
    data_root = os.path.join(root, "cap_arrows")
    make_arrow(data, name, data_root)
    return data_root


def tiny_config(data_root: str, vocab_path: str, label2ans_path: str = "",
                task: str = "task_finetune_vqa_vqa_rad", **overrides):
    from mm_vqa_healthcare_tpu import config as C
    cfg = C.compose([task, "tiny_debug"])
    cfg.update(
        data_root=data_root,
        tokenizer_path=vocab_path,
        vqa_label_size=_label_count(data_root),
        attention_impl="xla",
        num_workers=0,
        max_steps=2,
        max_epoch=1,
        warmup_steps=0,
        device_transforms=False,
        mesh_shape={"data": 2},
        per_gpu_batchsize=2,
        batch_size=4,
    )
    cfg.update(overrides)
    return cfg


def _label_count(data_root: str) -> int:
    with open(os.path.join(data_root, "label2ans.json")) as f:
        return len(json.load(f))
