"""Realdata pipeline decomposition: where does a steady-state step go?

Times each stage of the real-data train pipeline in isolation on the bench
fixture (same path bench.py BENCH_MODE=realdata uses):
  host:    arrow row -> (cached) JPEG decode -> randaug -> resize+crop ->
           collate (per batch, steady state = epoch 2 with warm caches)
  h2d:     device_put of the collated batch (through the axon tunnel)
  device:  the jitted train step on a resident batch (synthetic-lane figure)

With the double-buffered overlap (trainer.device_prefetch) the steady-state
step time is ~max(host, h2d, device) + dispatch, so these rows identify
the binding constraint directly.  Run on an idle host.
"""

import json
import os
import time

import jax
import numpy as np


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    import bench
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    root = os.environ.get("MMVQA_REALDATA_ROOT",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".bench_fixture"))
    data_root = os.path.join(root, "arrows")
    vocab = os.path.join(root, "vocab.txt")
    if not os.path.isfile(os.path.join(data_root, "vqa_vqa_rad_train.arrow")):
        bench._build_realdata_fixture(root)
    with open(os.path.join(data_root, "label2ans.json")) as f:
        label_size = len(json.load(f))
    cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], {
        "data_root": data_root, "tokenizer_path": vocab,
        "vqa_label_size": label_size, "image_size": 384,
        "per_gpu_batchsize": batch_size, "batch_size": batch_size,
        "max_steps": 10000, "warmup_steps": 0, "num_workers": 0,
    })
    trainer = Trainer(cfg)
    dm = trainer.setup_data()

    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    # --- host pipeline alone (two epochs: cold decode, then warm cache) ---
    for label, epoch in [("host epoch0 (cold decode)", 0),
                         ("host epoch1 (warm cache)", 1)]:
        it = dm._iterate("train", batch_size, shuffle=True,
                         seed=cfg["seed"] + epoch, drop_last=True)
        t0 = time.perf_counter()
        n = 0
        last = None
        for b in it:
            last = b
            n += 1
            if n >= n_steps:
                break
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt * 1000:.1f} ms/batch "
              f"({batch_size / dt:.1f} samples/s)")

    # fine-grained: decode+transform vs collate, one warm epoch
    ds = dm.dataset("train")
    idxs = np.random.default_rng(0).integers(0, len(ds), batch_size * 4)
    t0 = time.perf_counter()
    items = [ds[int(i)] for i in idxs]
    t_items = (time.perf_counter() - t0) / 4
    from mm_vqa_healthcare_tpu.data.collate import collate as collate_fn
    groups = [items[i * batch_size:(i + 1) * batch_size] for i in range(4)]
    t0 = time.perf_counter()
    for g in groups:
        last = collate_fn(g, dm.mlm_collator)
    t_coll = (time.perf_counter() - t0) / 4
    print(f"  decode+randaug+resize: {t_items * 1000:.1f} ms/batch; "
          f"collate+tokenize: {t_coll * 1000:.1f} ms/batch")

    # --- h2d transfer alone ---
    dev = trainer._device_batch(last)
    jax.block_until_ready(dev["image"])
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        dev = trainer._device_batch(last)
        np.asarray(jax.device_get(dev["image"][0, 0, 0]))  # true sync
    t_h2d = (time.perf_counter() - t0) / reps
    img = last["image"]
    mb = img.nbytes / 1e6
    print(f"h2d: {t_h2d * 1000:.1f} ms/batch ({mb:.1f} MB image payload, "
          f"{mb / t_h2d:.0f} MB/s effective)")


if __name__ == "__main__":
    main()
