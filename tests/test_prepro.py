"""Offline-prepro tests: raw-JSON -> arrows end-to-end (the reference
prepro_finetuning_data flow), answer normalization, sincos table parity
with the reference's numpy implementation."""

import json
import os

import numpy as np
import pytest

from tests import fixtures
from tests.oracle_utils import load_reference_module


def test_prepro_finetuning_end_to_end(tmp_path):
    """trainset.json + images -> prepro_vqa_vqa_rad_m3ae -> readable arrows
    + label2ans.json in the layout main.py consumes."""
    from mm_vqa_healthcare_tpu.prepro.prepro_finetuning_data import (
        prepro_vqa_vqa_rad_m3ae)
    data_root = tmp_path / "vqa_rad"
    img_dir = data_root / "images"
    paths = fixtures.make_images(str(img_dir), n=4)
    qid = 0
    for split, count in [("train", 4), ("val", 2), ("test", 2)]:
        samples = []
        for i in range(count):
            q, a, at = fixtures.QUESTIONS[qid % len(fixtures.QUESTIONS)]
            samples.append({"image_name": os.path.basename(paths[qid % 4]),
                            "qid": qid, "question": q, "answer": a,
                            "answer_type": at})
            qid += 1
        with open(data_root / f"{split}set.json", "w") as f:
            json.dump(samples, f)

    out = tmp_path / "arrows"
    cwd = os.getcwd()
    os.chdir(tmp_path)  # label2ans.json is written to CWD like the reference
    try:
        prepro_vqa_vqa_rad_m3ae(data_root=str(data_root), out=str(out))
    finally:
        os.chdir(cwd)
    assert (out / "vqa_vqa_rad_train.arrow").exists()
    assert (tmp_path / "label2ans.json").exists()

    import pyarrow as pa
    table = pa.ipc.RecordBatchFileReader(
        pa.memory_map(str(out / "vqa_vqa_rad_train.arrow"))).read_all()
    assert table.column_names == [
        "image", "questions", "answers", "answer_labels", "answer_scores",
        "image_id", "question_id", "answer_type", "split"]
    # dataset layer can read what prepro wrote
    from mm_vqa_healthcare_tpu.data.arrow_dataset import VQAVQARADDataset
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    vocab = fixtures.write_vocab(str(tmp_path / "vocab.txt"))
    ds = VQAVQARADDataset(data_dir=str(out), transform_keys=["clip"],
                          image_size=32, split="train", max_text_len=16)
    ds.tokenizer = load_tokenizer("tiny-bert", vocab)
    assert len(ds) == 4
    item = ds[0]
    assert item["vqa_answer"][0] in json.load(
        open(tmp_path / "label2ans.json")).values()


def test_normalize_word_reference_semantics():
    from mm_vqa_healthcare_tpu.prepro.glossary import normalize_word
    assert normalize_word("Yes") == "yes"
    assert normalize_word("The lung") == "lung"          # article dropped
    assert normalize_word("two") == "2"                  # number word
    assert normalize_word("left, lower") == "left lower" # comma handling
    assert normalize_word("dont") == "don't"             # contraction
    assert normalize_word("x-ray") == "x ray"            # dash -> space
    assert normalize_word("u.s.") == "us"                # period strip


def test_sincos_matches_reference_numpy():
    """Our 2-D sin-cos table vs the reference's numpy implementation
    (position_embeddings.py is importable: numpy-only)."""
    ref = load_reference_module("m3ae/modules/position_embeddings.py",
                                "ref_pos_embed")
    if ref is None:
        pytest.skip("reference position_embeddings not importable")
    from mm_vqa_healthcare_tpu.models.position_embeddings import (
        get_2d_sincos_pos_embed)
    ours = get_2d_sincos_pos_embed(64, 6, cls_token=True)
    try:
        theirs = ref.get_2d_sincos_pos_embed(64, 6, cls_token=True)
    except AttributeError:
        # the reference uses numpy<2 APIs removed since (np.float)
        pytest.skip("reference sincos needs numpy<2")
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_sincos_independent_formula():
    """Numpy-2-proof parity check (the oracle test above skips when the
    reference needs numpy<2): re-derive the MAE sincos table from the
    formula (reference position_embeddings.py:21-68 — meshgrid(w, h),
    grid[0] encodes the FIRST half of the channels, omega = 10000^-(2k/d))
    and diff against our implementation."""
    from mm_vqa_healthcare_tpu.models.position_embeddings import (
        get_2d_sincos_pos_embed)

    d, g = 16, 3
    grid_w, grid_h = np.meshgrid(np.arange(g, dtype=np.float32),
                                 np.arange(g, dtype=np.float32))

    def one_d(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64)
                                / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    expected = np.concatenate([one_d(d // 2, grid_w), one_d(d // 2, grid_h)],
                              axis=1)
    expected = np.concatenate([np.zeros((1, d)), expected], axis=0)
    ours = get_2d_sincos_pos_embed(d, g, cls_token=True)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)
