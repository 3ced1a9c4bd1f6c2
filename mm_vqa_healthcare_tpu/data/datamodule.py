"""Data modules: dataset registry, loaders, per-host sharding.

Replaces the reference's BaseDataModule / MTDataModule
(m3ae/datamodules/base_datamodule.py, multitask_datamodule.py):

  * registry maps config["datasets"] keys to dataset classes
    (reference datamodules/__init__.py:7-13),
  * train/val/test dataset construction incl. `no_false` variants for
    retrieval eval (base_datamodule.py:106-130) and test_only
    (:145-157),
  * multi-dataset concat (ConcatDataset, multitask_datamodule.py:34-40),
  * instead of torch DataLoader + DistributedSampler, a thread-prefetched
    iterator that shards each global batch across the data-parallel mesh
    axis (per-host sharding on multi-host; jax.process_index-strided like
    the reference's rank-strided DistributedSampler).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from mm_vqa_healthcare_tpu.data.arrow_dataset import (
    IRTRROCODataset, MedicatDataset, ROCODataset, VQAEHRXQADataset,
    VQAVQARADDataset)
from mm_vqa_healthcare_tpu.data.collate import collate
from mm_vqa_healthcare_tpu.data.tokenization import MLMCollator, load_tokenizer

DATASET_REGISTRY = {
    "vqa_vqa_rad": VQAVQARADDataset,
    "vqa_ehr_xqa": VQAEHRXQADataset,
    "roco": ROCODataset,
    "medicat": MedicatDataset,
    "irtr_roco": IRTRROCODataset,
}


class ConcatDataset:
    def __init__(self, datasets: List):
        self.datasets = datasets
        self.offsets = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self.offsets[-1]) if len(self.datasets) else 0

    def __getitem__(self, idx: int):
        ds_idx = int(np.searchsorted(self.offsets, idx, side="right"))
        prev = 0 if ds_idx == 0 else int(self.offsets[ds_idx - 1])
        return self.datasets[ds_idx][idx - prev]


class MTDataModule:
    """Multi-task data module composed from config (reference
    multitask_datamodule.py:11-83)."""

    def __init__(self, config: Dict, dist: bool = False,
                 device_count: int = 1):
        self.config = config
        self.dist = dist
        # Global per-step batch = per-device batch x local data-parallel
        # devices (the reference's per_gpu_batchsize is per-GPU; DDP runs
        # one process per GPU — here one SPMD program spans all chips).
        per_dev = config["per_gpu_batchsize"] or config["batch_size"]
        self.dataset_keys = config["datasets"]
        self.batch_size = per_dev * device_count
        self.eval_batch_size = self.batch_size
        self.tokenizer = load_tokenizer(config["tokenizer"],
                                        config.get("tokenizer_path", ""))
        self.mlm_collator = MLMCollator(
            self.tokenizer, mlm_prob=config["mlm_prob"],
            whole_word=config["whole_word_masking"], seed=config["seed"])
        self._datasets: Dict[str, object] = {}

    # -- dataset construction ------------------------------------------------
    def _make(self, key: str, split: str, no_false: bool = False):
        cfg = self.config
        cls = DATASET_REGISTRY[key]
        ds = cls(
            data_dir=cfg["data_root"],
            transform_keys=(cfg["train_transform_keys"] if split == "train"
                            else cfg["val_transform_keys"]),
            image_size=cfg["image_size"],
            max_text_len=cfg["max_text_len"],
            draw_false_image=0 if no_false else cfg["draw_false_image"],
            draw_false_text=0 if no_false else cfg["draw_false_text"],
            image_only=cfg["image_only"],
            split=split,
            device_normalize=cfg.get("device_transforms", False),
            device_resize=cfg.get("device_resize", False),
            device_resize_cap=cfg.get("device_resize_cap", 512),
        )
        ds.tokenizer = self.tokenizer
        return ds

    def setup(self, stage: Optional[str] = None):
        test_only = self.config.get("test_only", False)
        splits = ["test"] if test_only else ["train", "val", "test"]
        for split in splits:
            self._datasets[split] = ConcatDataset(
                [self._make(k, split) for k in self.dataset_keys])

    def dataset(self, split: str) -> ConcatDataset:
        if split not in self._datasets:
            self.setup()
        return self._datasets[split]

    def make_no_false_val_dset(self, image_only: bool = False):
        ds = self._make(self.dataset_keys[0], "val", no_false=True)
        ds.image_only = image_only
        return ds

    # -- loaders -------------------------------------------------------------
    def _iterate(self, split: str, batch_size: int, shuffle: bool,
                 seed: int, drop_last: bool,
                 use_mlm: bool = True) -> Iterator[dict]:
        ds = self.dataset(split)
        n = len(ds)
        import jax
        num_shards = jax.process_count() if self.dist else 1
        shard = jax.process_index() if self.dist else 0
        order = np.arange(n)
        if shuffle:
            order = np.random.default_rng(seed).permutation(n)
        order = order[shard::num_shards]
        mlm = self.mlm_collator if use_mlm else None
        for start in range(0, len(order), batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) < batch_size:
                if drop_last:
                    return
                # static shapes: wrap around to fill the final batch, and
                # report the real count so metrics ignore the filler
                pad = batch_size - len(idxs)
                idxs = np.concatenate([idxs, order[:pad]])
                batch = collate([ds[int(i)] for i in idxs], mlm)
                batch["_real_count"] = batch_size - pad
                yield batch
                return
            batch = collate([ds[int(i)] for i in idxs], mlm)
            batch["_real_count"] = batch_size
            yield batch

    def train_loader(self, epoch: int = 0) -> Iterator[dict]:
        return _prefetch(self._iterate(
            "train", self.batch_size, shuffle=True,
            seed=self.config["seed"] + epoch, drop_last=True))

    def val_loader(self) -> Iterator[dict]:
        return _prefetch(self._iterate(
            "val", self.eval_batch_size, shuffle=False,
            seed=0, drop_last=False))

    def test_loader(self) -> Iterator[dict]:
        return _prefetch(self._iterate(
            "test", self.eval_batch_size, shuffle=False,
            seed=0, drop_last=False))


def _prefetch(it: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Background-thread prefetch so host collation overlaps device steps."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
