"""Memory-mapped Arrow datasets (reference m3ae/datasets/*).

Reads the exact on-disk format the reference's prepro writes (caption schema
[image, caption, image_id, split]; VQA schema [image, questions, answers,
answer_labels, answer_scores, image_id, question_id, answer_type, split] —
reference prepro/make_arrow.py:40-63,126-204), with:

  * the (row, caption-idx) flat index mapper (base_dataset.py:69-79),
  * random false-image / false-text draws for ITM/IRTR (:107-143),
  * the resample-on-error retry loop (:145-163),
  * RGBA decode for clip transforms (:88-95).

TPU-first addition: an optional in-memory decoded-image cache — datasets at
this scale (VQA-RAD ~2k images) decode once and then stream at memory speed,
which matters on few-vCPU TPU VM hosts where per-step PIL decode would
starve the chip.
"""

from __future__ import annotations

import io
import os
import random
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
from PIL import Image

from mm_vqa_healthcare_tpu.data.transforms import (
    eval_transform_keys, keys_to_transforms)


class BaseDataset:
    def __init__(
        self,
        data_dir: str,
        transform_keys: List[str],
        image_size: int,
        names: List[str],
        text_column_name: str = "",
        max_text_len: int = 40,
        draw_false_image: int = 0,
        draw_false_text: int = 0,
        image_only: bool = False,
        label_column_name: str = "",
        device_normalize: bool = False,
        device_resize: bool = False,
        device_resize_cap: int = 512,
        cache_images: bool = True,
    ):
        assert len(transform_keys) >= 1
        self.text_column_name = text_column_name
        self.names = names
        self.max_text_len = max_text_len
        self.draw_false_image = draw_false_image
        self.draw_false_text = draw_false_text
        self.image_only = image_only
        self.data_dir = data_dir
        self.label_column_name = label_column_name
        self.tokenizer = None  # bound by the datamodule

        if names and "train" not in names[0]:
            transform_keys = eval_transform_keys(transform_keys)
        self.transforms = keys_to_transforms(transform_keys, image_size,
                                             device_normalize,
                                             device_resize,
                                             device_resize_cap)
        self.clip_transform = any("clip" in k for k in transform_keys)
        self._rng = np.random.default_rng()

        tables = [
            pa.ipc.RecordBatchFileReader(
                pa.memory_map(f"{data_dir}/{name}.arrow", "r")).read_all()
            for name in names
            if os.path.isfile(f"{data_dir}/{name}.arrow")
        ]
        self.table_names: List[str] = []
        for i, name in enumerate(names):
            if i < len(tables):
                self.table_names += [name] * len(tables[i])
        self.table = pa.concat_tables(tables, promote_options="default") if tables else None

        if text_column_name != "" and self.table is not None:
            self.all_texts = self.table[text_column_name].to_pylist()
            assert isinstance(self.all_texts[0][0], str)
        else:
            self.all_texts = []

        # (row, caption-idx) index mapper
        self.index_mapper: Dict[int, tuple] = {}
        if text_column_name != "" and not image_only:
            j = 0
            for i, texts in enumerate(self.all_texts):
                for _j in range(len(texts)):
                    self.index_mapper[j] = (i, _j)
                    j += 1
        elif self.table is not None:
            for i in range(len(self.table)):
                self.index_mapper[i] = (i, None)

        self._image_cache: Optional[dict] = {} if cache_images else None
        # Decoded-frame cache: this host decodes ~50 img/s PIL while one
        # chip consumes 150+ train samples/s.  Randaug'd train tensors are
        # uncacheable (fresh augmentation each epoch), but the decode —
        # the expensive half of the pipeline — is deterministic, so cache
        # the decoded PIL frames under a byte budget (all downstream PIL
        # ops are functional: randaug/crop/resize/convert return copies).
        self._decoded_cache: Optional[dict] = {} if cache_images else None
        self._decoded_budget = int(os.environ.get(
            "MMVQA_DECODE_CACHE_MB", "512")) * 2 ** 20
        self._decoded_bytes = 0

    @property
    def corpus(self):
        return [text for texts in self.all_texts for text in texts]

    def __len__(self):
        return len(self.index_mapper)

    def get_raw_image(self, index: int, image_key: str = "image") -> Image.Image:
        row, _ = self.index_mapper[index]
        mode = "RGBA" if self.clip_transform else "RGB"
        key = (image_key, row)
        if self._decoded_cache is not None and key in self._decoded_cache:
            return self._decoded_cache[key]
        image_bytes = io.BytesIO(self.table[image_key][row].as_py())
        image_bytes.seek(0)
        image = Image.open(image_bytes).convert(mode)
        if self._decoded_cache is not None:
            nbytes = image.width * image.height * len(image.getbands())
            if self._decoded_bytes + nbytes <= self._decoded_budget:
                self._decoded_cache[key] = image
                self._decoded_bytes += nbytes
        return image

    def get_image(self, index: int, image_key: str = "image") -> dict:
        row = self.index_mapper[index][0]
        cache_key = (image_key, row)
        if self._image_cache is not None and cache_key in self._image_cache:
            tensors = self._image_cache[cache_key]
        else:
            image = self.get_raw_image(index, image_key=image_key)
            tensors = [tr(image, self._rng) for tr in self.transforms]
            if self._image_cache is not None and not any(
                    tr.randaug or tr.resizedcrop for tr in self.transforms):
                self._image_cache[cache_key] = tensors
        return {
            "image": tensors,
            "img_index": row,
            "cap_index": self.index_mapper[index][1],
            "raw_index": index,
        }

    def get_false_image(self, rep: int, image_key: str = "image",
                        selected_index=None) -> dict:
        random_index = random.randint(0, len(self.index_mapper) - 1)
        out = self.get_image(random_index, image_key=image_key)
        return {f"false_image_{rep}": out["image"]}

    def get_text(self, raw_index: int) -> dict:
        index, caption_index = self.index_mapper[raw_index]
        text = self.all_texts[index][caption_index]
        encoding = self.tokenizer(
            text, padding="max_length", truncation=True,
            max_length=self.max_text_len, return_special_tokens_mask=True)
        return {
            "text": (text, encoding),
            "img_index": index,
            "cap_index": caption_index,
            "raw_index": raw_index,
        }

    def get_false_text(self, rep: int, selected_index=None) -> dict:
        random_index = random.randint(0, len(self.index_mapper) - 1)
        index, caption_index = self.index_mapper[random_index]
        text = self.all_texts[index][caption_index]
        encoding = self.tokenizer(
            text, padding="max_length", truncation=True,
            max_length=self.max_text_len, return_special_tokens_mask=True)
        return {f"false_text_{rep}": (text, encoding)}

    def get_suite(self, index: int) -> dict:
        """Fault-tolerant fetch: on any per-sample error resample a random
        index (reference base_dataset.py:145-163)."""
        result = None
        while result is None:
            try:
                ret = dict()
                ret.update(self.get_image(index))
                if not self.image_only:
                    txt = self.get_text(index)
                    ret.update({"replica": txt["cap_index"] > 0})
                    ret.update(txt)
                for i in range(self.draw_false_image):
                    ret.update(self.get_false_image(i, selected_index=index))
                for i in range(self.draw_false_text):
                    ret.update(self.get_false_text(i, selected_index=index))
                result = True
            except Exception as e:
                print(f"Error while read file idx {index} in "
                      f"{self.names[0]} -> {e}")
                index = random.randint(0, len(self.index_mapper) - 1)
        return ret

    def __getitem__(self, index: int) -> dict:
        return self.get_suite(index)


class VQADataset(BaseDataset):
    """Common VQA dataset shape (reference vqa_vqa_rad_dataset.py:4-43 and
    vqa_ehr_xqa_dataset.py:4-43 are identical modulo names)."""

    name_prefix = "vqa_vqa_rad"

    def __init__(self, *args, split: str = "", **kwargs):
        assert split in ["train", "val", "test"]
        self.split = split
        names = [f"{self.name_prefix}_{split}"]
        super().__init__(*args, **kwargs, names=names,
                         text_column_name="questions")

    def __getitem__(self, index: int) -> dict:
        image_tensor = self.get_image(index)["image"]
        text = self.get_text(index)["text"]
        row, q_idx = self.index_mapper[index]
        answers = self.table["answers"][row][q_idx].as_py()
        labels = self.table["answer_labels"][row][q_idx].as_py()
        scores = self.table["answer_scores"][row][q_idx].as_py()
        answer_types = self.table["answer_type"][row][q_idx].as_py()
        qid = self.table["question_id"][row][q_idx].as_py()
        return {
            "image": image_tensor,
            "text": text,
            "vqa_answer": answers,
            "vqa_labels": labels,
            "vqa_scores": scores,
            "answer_types": answer_types,
            "qid": qid,
        }


class VQAVQARADDataset(VQADataset):
    name_prefix = "vqa_vqa_rad"


class VQAEHRXQADataset(VQADataset):
    name_prefix = "vqa_ehr_xqa"


class CaptionDataset(BaseDataset):
    """Pretraining caption datasets (reference pretraining_roco_dataset.py,
    pretraining_medicat_dataset.py, irtr_roco_dataset.py — all :4-21)."""

    name_prefix = "roco"

    def __init__(self, *args, split: str = "", **kwargs):
        assert split in ["train", "val", "test"]
        self.split = split
        if split == "train":
            names = [f"{self.name_prefix}_train"]
        else:
            names = [f"{self.name_prefix}_{split}"]
        super().__init__(*args, **kwargs, names=names,
                         text_column_name="caption")

    def __getitem__(self, index: int) -> dict:
        return self.get_suite(index)


class ROCODataset(CaptionDataset):
    name_prefix = "roco"


class MedicatDataset(CaptionDataset):
    name_prefix = "medicat"


class IRTRROCODataset(CaptionDataset):
    name_prefix = "irtr_roco"
