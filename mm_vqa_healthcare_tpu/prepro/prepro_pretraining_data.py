"""Pretraining data preprocessing (reference prepro/prepro_pretraining_data.py).

MedICaT: parse the s2_full_figures jsonl, keep radiology-only samples,
seeded shuffle split (train / 1000 val / 1000 test), captions + s2orc
references, min 3 words.  ROCO: join dlinks.txt id mapping + medicat roco
reference jsonls + captions.txt.

CLI:  python -m mm_vqa_healthcare_tpu.prepro.prepro_pretraining_data \
          [medicat|roco|all] [--data_root DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import re

from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow


def _clean_texts(texts, min_length):
    texts = [re.sub(r"\s+", " ", t.strip()) for t in texts]
    return [t for t in texts if len(t.split()) >= min_length]


def prepro_medicat(data_root="data/pretrain_data/medicat",
                   out="data/pretrain_arrows/", min_length=3):
    random.seed(42)
    image_root = f"{data_root}/release/figures/"
    ann_path = (f"{data_root}/release/"
                "s2_full_figures_oa_nonroco_combined_medical_top4_public.jsonl")
    samples = [json.loads(s) for s in open(ann_path).read().strip().split("\n")]
    samples = [s for s in samples if s["radiology"]]
    indices = list(range(len(samples)))
    random.shuffle(indices)
    splits = {"train": indices[:-2000], "val": indices[-2000:-1000],
              "test": indices[-1000:]}
    data = {"train": [], "val": [], "test": []}
    for split, split_indices in splits.items():
        for idx in split_indices:
            sample = samples[idx]
            img_path = os.path.join(
                image_root, sample["pdf_hash"] + "_" + sample["fig_uri"])
            texts = []
            if sample.get("s2_caption"):
                texts.append(sample["s2_caption"])
            if sample.get("s2orc_references"):
                texts.extend(sample["s2orc_references"])
            texts = _clean_texts(texts, min_length)
            if texts:
                data[split].append({"img_path": img_path, "texts": texts})
    make_arrow(data, "medicat", out)


def prepro_roco(data_root="data/pretrain_data", out="data/pretrain_arrows/",
                min_length=3):
    random.seed(42)
    roco_root = f"{data_root}/roco"
    image_root = roco_root + "/{}/radiology/images/"
    medicat_root = f"{data_root}/medicat"
    ref_paths = {
        s: (f"{medicat_root}/net/nfs2.corp/allennlp/sanjays/roco_files/"
            f"roco_{s}_references.jsonl")
        for s in ["train", "val", "test"]}

    medicat2roco = {}
    for split in ["train", "val", "test"]:
        with open(f"{roco_root}/{split}/radiology/dlinks.txt") as fp:
            for line in fp:
                cols = line.strip().split("\t")
                key = (cols[1].split(" ")[2].split("/")[-1].split(".")[0]
                       + "_" + cols[-1])
                medicat2roco[key] = cols[0]

    data = {"train": [], "val": [], "test": []}
    for split, path in ref_paths.items():
        if not os.path.isfile(path):
            continue
        for raw in open(path).read().strip().split("\n"):
            sample = json.loads(raw)
            img_path = os.path.join(
                image_root.format(split),
                medicat2roco[sample["roco_image_id"]] + ".jpg")
            texts = _clean_texts(sample.get("gorc_references") or [],
                                 min_length)
            if texts:
                data[split].append({"img_path": img_path, "texts": texts})

    for split in ["train", "val", "test"]:
        with open(f"{roco_root}/{split}/radiology/captions.txt") as fp:
            for line in fp:
                cols = line.strip().split("\t")
                if len(cols) == 2:
                    img_path = os.path.join(image_root.format(split),
                                            cols[0] + ".jpg")
                    texts = _clean_texts([cols[1]], min_length)
                    if texts:
                        data[split].append({"img_path": img_path,
                                            "texts": texts})
    make_arrow(data, "roco", out)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("task", nargs="?", default="all",
                        choices=["medicat", "roco", "all"])
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    kwargs = {}
    if args.data_root:
        kwargs["data_root"] = args.data_root
    if args.out:
        kwargs["out"] = args.out
    if args.task in ("medicat", "all"):
        prepro_medicat(**kwargs)
    if args.task in ("roco", "all"):
        prepro_roco(**{k: v for k, v in kwargs.items()})
