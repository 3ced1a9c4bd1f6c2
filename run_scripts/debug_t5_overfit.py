#!/usr/bin/env python
"""Diagnose the T5 overfit lane: print the teacher-forced loss trajectory
and TF argmax predictions on a train batch (tests/test_overfit.py setup).

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python run_scripts/debug_t5_overfit.py [steps]
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np

from tests import fixtures
# single source of truth for the fixture — the test module owns it
# (advisor r4: a duplicated copy here had already drifted on qid salts)
from tests.test_overfit import _make_identical_splits_vqa, _overfit_overrides



def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    root = "/tmp/debug_t5_overfit"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    data_root, vocab = _make_identical_splits_vqa(root)

    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer

    cfg = fixtures.tiny_config(data_root, vocab, t5_max_length=8,
                               unfreeze_num_encoder_layers=2,
                               unfreeze_num_decoder_layers=2,
                               t5_generation=False,
                               **_overfit_overrides("/tmp/debug_t5_ckpt",
                                                    steps))
    cfg["max_epoch"] = 10_000
    cfg["bug_compat"] = False
    cfg["learning_rate"] = 3e-3
    cfg["t5_encoder_max_seq_len"] = 24
    cfg["mm_encoder_inputs_include_imagetext_feats"] = True
    cfg["mm_encoder_inputs_mm_feats_width"] = 16
    t5_mod.T5_PRESETS["t5-small"] = T5Config(
        vocab_size=200, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2)
    tok = load_tokenizer("tiny-bert", vocab)
    t = T5Trainer(cfg, variant="mm", tokenizer=tok)

    dm = t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    train_step = t._get_jitted("train")

    step = 0
    batches_cache = None
    while step < steps:
        for batch in dm.train_loader(step // 2):
            dev = t._device_batch(batch, with_labels=True)
            if batches_cache is None:
                batches_cache = (batch, dev)
            rng = jax.random.fold_in(t.rng, step)
            t.params, t.opt_state, loss = train_step(
                t.params, t.opt_state, dev, rng)
            if step % 10 == 0:
                print(f"step {step}: loss {float(jax.device_get(loss)):.4f}"
                      f"  lr {float(t.lr_fn(step)):.2e}")
            step += 1
            if step >= steps:
                break

    # TF predictions on the cached train batch
    batch, dev = batches_cache
    from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch
    b2 = prepare_image_batch(dict(dev), t.image_mean, t.image_std,
                             cfg["image_size"])
    logits = t.model.apply(t.params, b2, b2["t5_labels"],
                           rng=jax.random.key(0), deterministic=True)
    pred = np.asarray(jnp.argmax(logits, -1))
    gold = np.asarray(dev["t5_labels"])
    print("gold :", gold[:4].tolist())
    print("pred :", pred[:4].tolist())
    print("gold text:", tok.batch_decode(gold[:4]))
    print("pred text:", tok.batch_decode(pred[:4]))
    lg = np.asarray(logits)
    print("pos1 logits diff vs s0:",
          [float(np.linalg.norm(lg[i, 1] - lg[0, 1])) for i in range(4)],
          " norm:", float(np.linalg.norm(lg[0, 1])))
    emb, _ = t.model.apply(t.params, b2,
                           method=type(t.model).prepare_inputs,
                           rng=jax.random.key(0))
    emb = np.asarray(emb)
    print("embeds diff vs s0:",
          [float(np.linalg.norm(emb[i] - emb[0])) for i in range(4)])
    enc, _ = t.model.apply(t.params, b2, jax.random.key(0),
                           method=type(t.model).encode)
    enc = np.asarray(enc)
    print("enc-out diff vs s0:",
          [float(np.linalg.norm(enc[i] - enc[0])) for i in range(4)],
          " norm:", float(np.linalg.norm(enc[0])))
    labels = t._trainable_label
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
    flat = flatten(t.params)
    for k in sorted(flat, key=str):
        print(labels(k), ".".join(str(p) for p in k))


if __name__ == "__main__":
    main()
