"""Arrow writers (reference prepro/make_arrow.py).

Byte-compatible schemas so Arrow files interoperate with the reference:
  caption datasets:  [image, caption, image_id, split]       (:40-63)
  VQA classifier:    [image, questions, answers, answer_labels,
                      answer_scores, image_id, question_id, answer_type,
                      split] + label2ans.json vocab             (:126-204)
  VQA generative:    same schema, test-only                    (:207-279)

Rows are per-image; question-level fields are parallel lists indexed by the
datasets' (row, question-idx) index mapper.  Vocabulary: normalized
lowercase answers over ALL splits, insertion-ordered (Counter order), soft
score 1.0 (get_score, :104-105); answer_type closed->0 / open->1.
"""

from __future__ import annotations

import json
import os
from collections import Counter, defaultdict
from typing import Dict, List

import pandas as pd
import pyarrow as pa

from mm_vqa_healthcare_tpu.prepro.glossary import normalize_word


def _write_table(dataframe: pd.DataFrame, path: str):
    table = pa.Table.from_pandas(dataframe)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with pa.OSFile(path, "wb") as sink:
        with pa.RecordBatchFileWriter(sink, table.schema) as writer:
            writer.write_table(table)


def get_score(occurences: int) -> float:
    return 1.0


def make_arrow(data: Dict[str, List[dict]], dataset_name: str, save_dir: str):
    """Caption datasets.  data[split] = [{"img_path", "texts"}]."""
    iid2captions = defaultdict(list)
    iid2split = dict()
    for split, split_data in data.items():
        for sample in split_data:
            iid2captions[sample["img_path"]].extend(sample["texts"])
            iid2split[sample["img_path"]] = split

    caption_paths = [p for p in iid2captions if os.path.exists(p)]
    print(f"+ {len(caption_paths)} images / {len(iid2captions)} annotations")

    rows = []
    for path in caption_paths:
        with open(path, "rb") as fp:
            binary = fp.read()
        rows.append([binary, iid2captions[path], path, iid2split[path]])

    for split in ["train", "val", "test"]:
        batch = [r for r in rows if r[-1] == split]
        df = pd.DataFrame(batch, columns=["image", "caption", "image_id", "split"])
        _write_table(df, f"{save_dir}/{dataset_name}_{split}.arrow")


def make_arrow_mimic_cxr(data: Dict[str, List[dict]], dataset_name: str,
                         save_dir: str):
    """MIMIC-CXR caption arrows with chexpert labels
    (reference make_arrow.py:66-101).  data[split] = [{"img_path", "texts",
    "chexpert"}]; schema [image, caption, image_id, chexpert, split]."""
    from collections import defaultdict as dd
    iid2captions, iid2chexpert = dd(list), dd(list)
    iid2split = {}
    for split, split_data in data.items():
        for sample in split_data:
            iid2captions[sample["img_path"]].extend(sample["texts"])
            iid2chexpert[sample["img_path"]].extend(sample["chexpert"])
            iid2split[sample["img_path"]] = split
    rows = []
    for path in iid2captions:
        if not os.path.exists(path):
            continue
        with open(path, "rb") as fp:
            binary = fp.read()
        rows.append([binary, iid2captions[path], path, iid2chexpert[path],
                     iid2split[path]])
    for split in ["train", "val", "test"]:
        batch = [r for r in rows if r[-1] == split]
        df = pd.DataFrame(batch, columns=["image", "caption", "image_id",
                                          "chexpert", "split"])
        _write_table(df, f"{save_dir}/{dataset_name}_{split}.arrow")


def make_arrow_melinda(data: Dict[str, List[dict]], dataset_name: str,
                       save_dir: str):
    """MELINDA classification arrows (reference make_arrow.py:300-355;
    the live pdb.set_trace at :337-338 is not replicated).  data[split] =
    [{"img_path", "texts", "i_meth", "p_meth", "i_meth_label",
    "p_meth_label"}]; string labels are mapped via sorted vocabularies."""
    from collections import defaultdict as dd
    cols = ["i_meth", "p_meth", "i_meth_label", "p_meth_label"]
    iid2captions = dd(list)
    iid2labels = {c: dd(list) for c in cols}
    iid2split = {}
    for split, split_data in data.items():
        for sample in split_data:
            iid2captions[sample["img_path"]].extend(sample["texts"])
            iid2split[sample["img_path"]] = split
            for c in cols:
                iid2labels[c][sample["img_path"]].append(sample[c])
    vocab = {c: {v: i for i, v in enumerate(sorted(
        {vv for vals in iid2labels[c].values() for vv in vals}))}
        for c in cols}
    rows = []
    for path in iid2captions:
        if not os.path.exists(path):
            continue
        with open(path, "rb") as fp:
            binary = fp.read()
        label_lists = [[vocab[c][v] for v in iid2labels[c][path]]
                       for c in cols]
        for lst in label_lists:
            assert len(lst) == len(iid2captions[path])
        rows.append([binary, iid2captions[path], path, *label_lists,
                     iid2split[path]])
    for split in ["train", "val", "test"]:
        batch = [r for r in rows if r[-1] == split]
        df = pd.DataFrame(batch, columns=["image", "caption", "image_id",
                                          *cols, "split"])
        _write_table(df, f"{save_dir}/{dataset_name}_{split}.arrow")
    return vocab


def build_answer_vocab(all_answers: List[str]):
    """Insertion-ordered vocab over normalized answers (make_arrow.py:137-146)."""
    normalized = [normalize_word(str(a).lower()) for a in all_answers]
    counter = {k: v for k, v in Counter(normalized).items() if v >= 0}
    ans2label = {k: i for i, k in enumerate(counter.keys())}
    label2ans = {i: k for i, k in enumerate(counter.keys())}
    return ans2label, label2ans


def make_arrow_vqa_m3ae(data: Dict[str, List[dict]], dataset_name: str,
                        save_dir: str, label2ans_path: str = "label2ans.json"):
    """Classifier-head VQA arrows + answer vocab.
    data[split] = [{"img_path", "qid", "question", "answer", "answer_type"}].
    """
    all_answers = [q["answer"] for split in ["train", "val", "test"]
                   for q in data.get(split, [])]
    ans2label, label2ans = build_answer_vocab(all_answers)
    with open(label2ans_path, "w") as f:
        json.dump({str(k): v for k, v in label2ans.items()}, f)
    print(f"Label size ({dataset_name}): {len(ans2label)}.")

    for split in ["train", "val", "test"]:
        per_image = defaultdict(lambda: defaultdict(dict))
        for q in data.get(split, []):
            answer = normalize_word(str(q["answer"]).lower())
            assert answer in ans2label
            at = q["answer_type"].strip().lower()
            assert at in ("closed", "open"), at
            per_image[q["img_path"]][q["qid"]] = {
                "question": q["question"],
                "labels": [ans2label[answer]],
                "scores": [get_score(1)],
                "answer_type": 0 if at == "closed" else 1,
            }
        rows = []
        for path, qas in per_image.items():
            if not os.path.exists(path):
                continue
            with open(path, "rb") as fp:
                binary = fp.read()
            qids = list(qas.keys())
            entries = [qas[qid] for qid in qids]
            rows.append([
                binary,
                [e["question"] for e in entries],
                [[label2ans[l] for l in e["labels"]] for e in entries],
                [e["labels"] for e in entries],
                [e["scores"] for e in entries],
                path,
                qids,
                [e["answer_type"] for e in entries],
                split,
            ])
        df = pd.DataFrame(rows, columns=[
            "image", "questions", "answers", "answer_labels",
            "answer_scores", "image_id", "question_id", "answer_type",
            "split"])
        print(f"{split} set: {len(rows)} images, "
              f"{sum(len(r[1]) for r in rows)} questions")
        _write_table(df, f"{save_dir}/{dataset_name}_{split}.arrow")
    return ans2label, label2ans


def make_arrow_vqa(data: Dict[str, List[dict]], dataset_name: str,
                   save_dir: str):
    """Generative (T5/decoder) path: test-only arrows, raw answers as
    strings with no vocab requirement (make_arrow.py:207-279)."""
    test = {"test": data["test"], "train": [], "val": []}
    all_answers = [q["answer"] for q in data["test"]]
    ans2label, label2ans = build_answer_vocab(all_answers)
    per_image = defaultdict(lambda: defaultdict(dict))
    for q in data["test"]:
        answer = normalize_word(str(q["answer"]).lower())
        at = q["answer_type"].strip().lower()
        per_image[q["img_path"]][q["qid"]] = {
            "question": q["question"],
            "labels": [ans2label[answer]],
            "scores": [get_score(1)],
            "answer_type": 0 if at == "closed" else 1,
        }
    rows = []
    for path, qas in per_image.items():
        if not os.path.exists(path):
            continue
        with open(path, "rb") as fp:
            binary = fp.read()
        qids = list(qas.keys())
        entries = [qas[qid] for qid in qids]
        rows.append([
            binary,
            [e["question"] for e in entries],
            [[label2ans[l] for l in e["labels"]] for e in entries],
            [e["labels"] for e in entries],
            [e["scores"] for e in entries],
            path, qids,
            [e["answer_type"] for e in entries],
            "test",
        ])
    df = pd.DataFrame(rows, columns=[
        "image", "questions", "answers", "answer_labels", "answer_scores",
        "image_id", "question_id", "answer_type", "split"])
    _write_table(df, f"{save_dir}/{dataset_name}_test.arrow")
