"""Fine-tuning data preprocessing (reference prepro/prepro_finetuning_data.py).

Reads `{train,val,test}set.json` files of
{image_name, qid, question, answer, answer_type} records and writes the
classifier arrows + label2ans.json (`prepro_vqa_vqa_rad_m3ae`,
data/finetune_arrows_m3ae/) or the generative test-only arrows
(`prepro_vqa_vqa_rad` / `prepro_vqa_ehr_xqa`, data/finetune_arrows/).

CLI:  python -m mm_vqa_healthcare_tpu.prepro.prepro_finetuning_data \
          [vqa_rad_m3ae|vqa_rad|ehr_xqa] [--data_root DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import random

from mm_vqa_healthcare_tpu.prepro.make_arrow import (
    make_arrow_vqa, make_arrow_vqa_m3ae)


def _read_split(data_root: str, image_root: str, split: str):
    out = []
    with open(f"{data_root}/{split}set.json") as fp:
        for sample in json.load(fp):
            out.append({
                "img_path": os.path.join(image_root, sample["image_name"]),
                "qid": sample["qid"],
                "question": sample["question"],
                "answer": sample["answer"],
                "answer_type": sample["answer_type"],
            })
    return out


def prepro_vqa_vqa_rad_m3ae(data_root="data/finetune_data/vqa_rad",
                            out="data/finetune_arrows_m3ae/"):
    random.seed(42)
    image_root = f"{data_root}/images"
    data = {s: _read_split(data_root, image_root, s)
            for s in ["train", "val", "test"]}
    make_arrow_vqa_m3ae(data, "vqa_vqa_rad", out)


def prepro_vqa_vqa_rad(data_root="data/finetune_data/vqa_rad",
                       out="data/finetune_arrows/"):
    random.seed(42)
    image_root = f"{data_root}/images"
    data = {s: _read_split(data_root, image_root, s)
            for s in ["train", "val", "test"]}
    make_arrow_vqa(data, "vqa_vqa_rad", out)


def prepro_vqa_ehr_xqa(data_root="data/finetune_data/ehr_xqa",
                       out="data/finetune_arrows/"):
    random.seed(42)
    data = {"test": _read_split(data_root, data_root, "test")}
    make_arrow_vqa(data, "vqa_ehr_xqa", out)


TASKS = {
    "vqa_rad_m3ae": prepro_vqa_vqa_rad_m3ae,
    "vqa_rad": prepro_vqa_vqa_rad,
    "ehr_xqa": prepro_vqa_ehr_xqa,
}


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("task", nargs="?", default="vqa_rad_m3ae",
                        choices=sorted(TASKS))
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()
    kwargs = {}
    if args.data_root:
        kwargs["data_root"] = args.data_root
    if args.out:
        kwargs["out"] = args.out
    TASKS[args.task](**kwargs)
