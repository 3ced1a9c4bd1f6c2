"""Full-corpus image<->text retrieval recall (reference compute_irtr_recall,
objectives.py:303-407).

For every (image, text) pair in the no-false val set, score
irtr_head(infer(text, image)) and compute text-retrieval / image-retrieval
R@1/5/10.  TPU-native changes vs the reference's per-image python loop:

  * the score matrix is computed with a jitted step batched over texts for
    each image (image features could be cached further; corpus sizes here
    are small),
  * images are sharded over processes (DistributedSampler equivalent) and
    score rows are gathered with multihost collectives.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.models.m3ae import M3AE
from mm_vqa_healthcare_tpu.parallel import collectives


def compute_irtr_recall(model: M3AE, params, datamodule,
                        text_batch_size: int = 256) -> Tuple[float, ...]:
    text_dset = datamodule.make_no_false_val_dset()
    text_dset.tokenizer = datamodule.tokenizer
    image_dset = datamodule.make_no_false_val_dset(image_only=True)
    image_dset.tokenizer = datamodule.tokenizer

    # preload texts (ids/masks + the image row each text belongs to)
    texts = []
    for idx in range(len(text_dset)):
        t = text_dset.get_text(idx)
        texts.append((t["text"][1]["input_ids"],
                      t["text"][1]["attention_mask"], t["img_index"]))
    text_ids = np.asarray([t[0] for t in texts], np.int32)
    text_masks = np.asarray([t[1] for t in texts], np.int32)
    tiids = np.asarray([t[2] for t in texts], np.int64)

    @jax.jit
    def score_fn(params, image, ids, masks):
        b = ids.shape[0]
        img = jnp.repeat(image[None], b, axis=0)
        batch = {"image": img, "text_ids": ids, "text_masks": masks}
        out = model.apply(params, batch, method=M3AE.infer)
        return model.apply(params, out["multi_modal_cls_feats"],
                           method=M3AE.apply_irtr_head)[:, 0]

    # shard images across processes (rank-strided like DistributedSampler)
    my_rows = range(collectives.process_index(), len(image_dset),
                    collectives.process_count())
    rank_scores, rank_iids = [], []
    for row in my_rows:
        img = image_dset.get_image(row)["image"][0]
        img = jnp.asarray(img, jnp.float32)
        scores = []
        for start in range(0, len(text_ids), text_batch_size):
            ids = jnp.asarray(text_ids[start:start + text_batch_size])
            masks = jnp.asarray(text_masks[start:start + text_batch_size])
            scores.append(np.asarray(score_fn(params, img, ids, masks)))
        rank_scores.append(np.concatenate(scores))
        rank_iids.append(image_dset.index_mapper[row][0])

    collectives.barrier()
    gathered_scores = [s for part in collectives.all_gather_object(rank_scores)
                       for s in part]
    gathered_iids = [i for part in collectives.all_gather_object(rank_iids)
                     for i in part]

    iids = np.asarray(gathered_iids)
    scores = np.stack(gathered_scores)          # [num_images, num_texts]

    def topk_iids(mat, k, axis):
        idx = np.argsort(-mat, axis=axis, kind="stable")
        return np.take(idx, range(k), axis=axis)

    # text retrieval: for each image row, top-k texts
    tr = {}
    for k in (1, 5, 10):
        k_eff = min(k, scores.shape[1])
        top = topk_iids(scores, k_eff, axis=1)
        hit = (tiids[top] == iids[:, None]).max(axis=1)
        tr[k] = float(hit.mean())
    # image retrieval: for each text column, top-k images
    ir = {}
    for k in (1, 5, 10):
        k_eff = min(k, scores.shape[0])
        top = topk_iids(scores, k_eff, axis=0)
        hit = (iids[top] == tiids[None, :]).max(axis=0)
        ir[k] = float(hit.mean())
    return (ir[1], ir[5], ir[10], tr[1], tr[5], tr[10])
