"""Batch collation (reference base_dataset.py:165-228 `collate`).

Produces numpy arrays with STATIC shapes (pad-to-batch-max images like the
reference, which is constant-size here because transforms emit fixed
[S, S, 3]; fixed text length from padding='max_length') — so a single XLA
compilation serves every step.

Output batch dict (same keys as the reference collate):
  image            [B, H, W, 3] float32 (or uint8 when device-normalize)
  false_image_k    same
  text             list[str]
  text_ids         [B, L] int32     (original ids)
  text_labels      [B, L] int32     (all -100)
  text_ids_mlm     [B, L] int32     (mlm-masked ids)
  text_labels_mlm  [B, L] int32     (mlm labels, -100 on unmasked)
  text_masks       [B, L] int32     (attention mask)
plus passthrough lists for VQA fields (vqa_answer, vqa_labels, ...).

The reference wraps each image in a 1-elem list per transform "view"; only
view 0 is ever consumed (m3ae_module.py:221 `batch[img_key][0]`), so the
view axis is dropped here and `image` is the view-0 tensor directly.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _stack_images(images: Sequence[np.ndarray]) -> np.ndarray:
    """Zero-pad to the batch max H/W then stack (base_dataset.py:180-196)."""
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    out = np.zeros((len(images), max_h, max_w, 3), dtype=images[0].dtype)
    for i, im in enumerate(images):
        out[i, :im.shape[0], :im.shape[1]] = im
    return out


def collate(batch: List[dict], mlm_collator=None) -> Dict[str, object]:
    batch_size = len(batch)
    keys = {k for b in batch for k in b.keys()}
    dict_batch = {k: [b.get(k) for b in batch] for k in keys}

    img_keys = [k for k in dict_batch if "image" in k]
    for img_key in img_keys:
        views = dict_batch[img_key]
        # each entry is a list of per-transform views; use view 0
        images = [v[0] if isinstance(v, list) else v for v in views]
        if isinstance(images[0], tuple):
            # device-resize mode: (padded uint8 frame, resample spec) —
            # geometry runs in-jit (ops/device_resize.py)
            dict_batch[img_key] = _stack_images([im for im, _ in images])
            dict_batch[f"{img_key}_spec"] = np.stack(
                [spec for _, spec in images])
        else:
            dict_batch[img_key] = _stack_images(images)

    txt_keys = [k for k in dict_batch if "text" in k]
    for txt_key in txt_keys:
        pairs = dict_batch[txt_key]
        texts = [p[0] for p in pairs]
        encodings = [p[1] for p in pairs]
        input_ids = np.asarray([e["input_ids"] for e in encodings], np.int32)
        attention_mask = np.asarray([e["attention_mask"] for e in encodings],
                                    np.int32)
        dict_batch[txt_key] = texts
        dict_batch[f"{txt_key}_ids"] = input_ids
        dict_batch[f"{txt_key}_labels"] = np.full_like(input_ids, -100)
        if mlm_collator is not None:
            mlm_ids, mlm_labels = mlm_collator(input_ids)
            dict_batch[f"{txt_key}_ids_mlm"] = mlm_ids.astype(np.int32)
            dict_batch[f"{txt_key}_labels_mlm"] = mlm_labels.astype(np.int32)
        dict_batch[f"{txt_key}_masks"] = attention_mask

    return dict_batch
