"""Data layer tests: arrow round-trip, index mapper, collate shapes,
MLM collators, transforms."""

import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def vqa_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa_fixture")
    return fixtures.make_vqa_fixture(str(root))


@pytest.fixture(scope="module")
def tokenizer(vqa_data):
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    _, _, vocab = vqa_data
    return load_tokenizer("tiny-bert", vocab)


def test_vqa_dataset_reads_arrow(vqa_data, tokenizer):
    from mm_vqa_healthcare_tpu.data.arrow_dataset import VQAVQARADDataset
    data_root, label2ans, _ = vqa_data
    ds = VQAVQARADDataset(
        data_dir=data_root, transform_keys=["clip"], image_size=32,
        split="train", max_text_len=16)
    ds.tokenizer = tokenizer
    assert len(ds) == 8
    item = ds[0]
    assert item["image"][0].shape == (32, 32, 3)
    assert isinstance(item["vqa_answer"], list)
    assert isinstance(item["vqa_labels"][0], int)
    assert item["answer_types"] in (0, 1)
    assert item["text"][0]  # question string
    assert len(item["text"][1]["input_ids"]) == 16


def test_collate_static_shapes(vqa_data, tokenizer):
    from mm_vqa_healthcare_tpu.data.arrow_dataset import VQAVQARADDataset
    from mm_vqa_healthcare_tpu.data.collate import collate
    data_root, _, _ = vqa_data
    ds = VQAVQARADDataset(
        data_dir=data_root, transform_keys=["clip"], image_size=32,
        split="train", max_text_len=16)
    ds.tokenizer = tokenizer
    batch = collate([ds[i] for i in range(4)])
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["text_ids"].shape == (4, 16)
    assert batch["text_masks"].shape == (4, 16)
    assert (batch["text_labels"] == -100).all()
    assert len(batch["vqa_answer"]) == 4


def test_mlm_collator_statistics(tokenizer):
    from mm_vqa_healthcare_tpu.data.tokenization import MLMCollator
    texts = ["is there cardiomegaly in the chest radiograph"] * 64
    enc = tokenizer(texts, padding="max_length", truncation=True,
                    max_length=16)
    ids = np.asarray(enc["input_ids"])
    coll = MLMCollator(tokenizer, mlm_prob=0.15, whole_word=True, seed=0)
    masked, labels = coll(ids)
    sel = labels != -100
    # some tokens masked, none on pad/special rows beyond limits
    assert sel.sum() > 0
    frac = sel.sum() / (ids != tokenizer.pad_token_id).sum()
    assert 0.05 < frac < 0.35
    # labels hold original ids at masked positions
    np.testing.assert_array_equal(labels[sel], ids[sel])
    # ~80% of selected become [MASK]
    mask_frac = (masked[sel] == tokenizer.mask_token_id).mean()
    assert 0.6 < mask_frac <= 1.0
    # unselected positions unchanged
    np.testing.assert_array_equal(masked[~sel], ids[~sel])


def test_mlm_collator_plain(tokenizer):
    from mm_vqa_healthcare_tpu.data.tokenization import MLMCollator
    texts = ["what organ is shown"] * 128
    enc = tokenizer(texts, padding="max_length", max_length=16)
    ids = np.asarray(enc["input_ids"])
    coll = MLMCollator(tokenizer, whole_word=False, seed=1)
    masked, labels = coll(ids)
    sel = labels != -100
    assert 0.03 < sel.mean() < 0.12  # ~15% of real (non-pad) tokens


def test_datamodule_end_to_end(vqa_data):
    from mm_vqa_healthcare_tpu.data.datamodule import MTDataModule
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab)
    dm = MTDataModule(cfg)
    dm.setup()
    batches = list(dm.train_loader())
    assert batches, "no train batches"
    b = batches[0]
    assert b["image"].shape[0] == cfg["per_gpu_batchsize"]
    assert b["text_ids"].dtype == np.int32
    # test loader pads the last batch and reports real count
    test_batches = list(dm.test_loader())
    assert test_batches[-1]["_real_count"] <= cfg["per_gpu_batchsize"]


def test_transform_pipeline_resize_crop():
    from PIL import Image
    from mm_vqa_healthcare_tpu.data.transforms import key_to_transform
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (60, 90, 3), np.uint8))
    tr = key_to_transform("clip", 32)
    out = tr(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    tr8 = key_to_transform("clip", 32, device_normalize=True)
    out8 = tr8(img)
    assert out8.dtype == np.uint8


def test_randaug_runs():
    from PIL import Image
    from mm_vqa_healthcare_tpu.data.randaug import RandAugment
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (48, 48, 3), np.uint8))
    aug = RandAugment(2, 9)
    for _ in range(10):
        out = aug(img, rng)
        assert out.size == img.size


def test_eval_strips_randaug(vqa_data, tokenizer):
    from mm_vqa_healthcare_tpu.data.arrow_dataset import VQAVQARADDataset
    data_root, _, _ = vqa_data
    ds = VQAVQARADDataset(
        data_dir=data_root, transform_keys=["clip_randaug"], image_size=32,
        split="test", max_text_len=16)
    assert not ds.transforms[0].randaug  # reference base_dataset.py:39-41
