"""Pretraining-prepro end-to-end: synthetic MedICaT + ROCO raw layouts ->
prepro_pretraining_data -> caption arrows -> dataset layer (closes the
round-1 COVERAGE partial: "logic mirrored; needs real data to exercise").

Layouts mirror the reference's expectations exactly
(reference prepro/prepro_pretraining_data.py:9-49 medicat, :52-108 roco):
MedICaT s2_full_figures jsonl with radiology flags and pdf_hash/fig_uri
image naming; ROCO dlinks.txt three-column tab format whose middle column's
third space-token is a URL (basename-stem + "_" + last column keys the
medicat->roco id join), per-split captions.txt, and the
net/nfs2.corp/.../roco_files reference jsonls.
"""

import io
import json
import os

import numpy as np
import pyarrow as pa
from PIL import Image

from tests import fixtures


def _jpeg_bytes(seed: int = 0, size: int = 32) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (size, size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _read_arrow(path):
    return pa.ipc.RecordBatchFileReader(pa.memory_map(str(path))).read_all()


def test_prepro_medicat_end_to_end(tmp_path):
    """2010 radiology entries -> seeded split (train / 1000 val / 1000 test
    like the reference), radiology + min-word filters applied, arrows
    readable by MedicatDataset."""
    from mm_vqa_healthcare_tpu.prepro.prepro_pretraining_data import (
        prepro_medicat)

    root = tmp_path / "medicat"
    fig_dir = root / "release" / "figures"
    os.makedirs(fig_dir)
    jpg = _jpeg_bytes()

    entries = []
    n = 2010
    for i in range(n):
        entries.append({
            "radiology": True,
            "pdf_hash": f"hash{i:05d}",
            "fig_uri": f"fig{i:05d}.jpg",
            "s2_caption": f"chest radiograph number {i} showing findings",
            "s2orc_references": [f"reference sentence for figure {i}"],
        })
        with open(fig_dir / f"hash{i:05d}_fig{i:05d}.jpg", "wb") as f:
            f.write(jpg)
    # non-radiology entry must be dropped by the filter
    entries.append({"radiology": False, "pdf_hash": "dropme",
                    "fig_uri": "fig.jpg", "s2_caption": "a perfectly fine caption",
                    "s2orc_references": []})
    with open(fig_dir / "dropme_fig.jpg", "wb") as f:
        f.write(jpg)
    # radiology entry whose only text is <3 words must be dropped too
    entries.append({"radiology": True, "pdf_hash": "short",
                    "fig_uri": "fig.jpg", "s2_caption": "two words",
                    "s2orc_references": []})
    with open(fig_dir / "short_fig.jpg", "wb") as f:
        f.write(jpg)
    with open(root / "release" /
              "s2_full_figures_oa_nonroco_combined_medical_top4_public.jsonl",
              "w") as f:
        f.write("\n".join(json.dumps(e) for e in entries))

    out = tmp_path / "arrows"
    prepro_medicat(data_root=str(root), out=str(out))

    counts = {}
    ids = set()
    for split in ["train", "val", "test"]:
        t = _read_arrow(out / f"medicat_{split}.arrow")
        assert t.column_names == ["image", "caption", "image_id", "split"]
        counts[split] = t.num_rows
        ids |= set(t.column("image_id").to_pylist())
    # reference split sizes over the 2011 post-radiology-filter samples:
    # all-but-2000 / 1000 / 1000; the min-length-filtered "short" entry is
    # dropped from whichever split the seeded shuffle put it in
    assert counts["train"] + counts["val"] + counts["test"] == n
    assert counts["train"] in (n - 2000, n - 1999)
    assert counts["val"] in (999, 1000)
    assert counts["test"] in (999, 1000)
    assert not any("dropme" in i or "short" in i for i in ids)

    from mm_vqa_healthcare_tpu.data.arrow_dataset import MedicatDataset
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    vocab = fixtures.write_vocab(str(tmp_path / "vocab.txt"))
    ds = MedicatDataset(data_dir=str(out), transform_keys=["clip"],
                        image_size=32, split="val", max_text_len=16)
    ds.tokenizer = load_tokenizer("tiny-bert", vocab)
    assert len(ds) >= 1000  # one row per (image, caption) pair
    item = ds[0]
    assert sorted(item["image"][0].shape) == [3, 32, 32]
    assert isinstance(item["text"][0], str)


def test_prepro_roco_end_to_end(tmp_path):
    """dlinks join + reference jsonls + captions.txt -> roco arrows ->
    ROCODataset."""
    from mm_vqa_healthcare_tpu.prepro.prepro_pretraining_data import prepro_roco

    root = tmp_path / "pretrain_data"
    jpg = _jpeg_bytes(1)
    per_split = {"train": 3, "val": 2, "test": 2}
    for split, k in per_split.items():
        rdir = root / "roco" / split / "radiology"
        os.makedirs(rdir / "images")
        dlinks, caps = [], []
        for i in range(k):
            rid = f"ROCO_{split}_{i:04d}"
            # middle column: "cmd arg http://host/dir/<stem>.pdf extra"
            dlinks.append(f"{rid}\tdl x http://h/p/{split}doc{i}.pdf y\tF{i}")
            caps.append(f"{rid}\tradiology caption for image {i} of {split}")
            with open(rdir / "images" / f"{rid}.jpg", "wb") as f:
                f.write(jpg)
        # caption line with too few words -> filtered; malformed line -> skipped
        caps.append(f"ROCO_{split}_bad\ttwo words")
        caps.append("malformed_line_no_tab")
        with open(rdir / "dlinks.txt", "w") as f:
            f.write("\n".join(dlinks))
        with open(rdir / "captions.txt", "w") as f:
            f.write("\n".join(caps))

    ref_dir = (root / "medicat" / "net" / "nfs2.corp" / "allennlp" /
               "sanjays" / "roco_files")
    os.makedirs(ref_dir)
    for split, k in per_split.items():
        rows = []
        for i in range(min(k, 2)):
            rows.append(json.dumps({
                "roco_image_id": f"{split}doc{i}_F{i}",
                "gorc_references": [f"a gorc reference about image {i}"],
            }))
        with open(ref_dir / f"roco_{split}_references.jsonl", "w") as f:
            f.write("\n".join(rows))

    out = tmp_path / "arrows"
    prepro_roco(data_root=str(root), out=str(out))

    t = _read_arrow(out / "roco_train.arrow")
    assert t.column_names == ["image", "caption", "image_id", "split"]
    # 3 caption rows + 2 reference rows share 3 images -> 3 image rows,
    # with the doubly-annotated images carrying 2 captions each
    assert t.num_rows == 3
    caption_counts = sorted(len(c) for c in t.column("caption").to_pylist())
    assert caption_counts == [1, 2, 2]

    from mm_vqa_healthcare_tpu.data.arrow_dataset import ROCODataset
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    vocab = fixtures.write_vocab(str(tmp_path / "vocab.txt"))
    ds = ROCODataset(data_dir=str(out), transform_keys=["clip"],
                     image_size=32, split="train", max_text_len=16)
    ds.tokenizer = load_tokenizer("tiny-bert", vocab)
    assert len(ds) == 5  # index mapper: one entry per (image, caption)
    item = ds[0]
    assert "text" in item and "image" in item
