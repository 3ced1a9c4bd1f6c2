"""XLA-derived FLOPs/sample audit for the bench lanes' MFU accounting.

Compiles the EXACT train/eval step the bench runs (same trainer code path)
for the CPU backend at a small batch and reads compiled.cost_analysis()
['flops'] — XLA's own count of executed FLOPs after optimization (so MIM's
dead fused layers, DCE'd pooler tails etc. are counted as the machine
actually executes them, not as the reference's eager graph would).  Batch
scales linearly (attention is quadratic in seq, not batch), so
flops(b)/b == flops/sample.

Usage: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python run_scripts/flops_audit.py [pretrain|train|eval] [batch]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def audit(mode: str = "pretrain", batch: int = 4,
          preset: str = "clip16") -> float:
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    if mode == "pretrain":
        cfg = compose(["task_pretrain_m3ae", preset], {"image_size": 288})
    else:
        cfg = compose(["task_finetune_vqa_vqa_rad", preset],
                      {"image_size": 384})
    cfg.update({"per_gpu_batchsize": batch, "batch_size": batch,
                "max_steps": 2, "warmup_steps": 0,
                # flops counting wants the production numerics: bf16 GEMMs
                # count the same flops; keep defaults
                "attention_impl": "xla"})
    trainer = Trainer(cfg)
    trainer.init_params()
    trainer.setup_optimizer(steps_per_epoch=10)

    b, s = batch, cfg["max_text_len"]
    size = cfg["image_size"]
    sh = mesh_lib.batch_sharding(trainer.mesh)
    mk = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=sh)
    shapes = {
        "image": mk((b, size, size, 3), jnp.float32),
        "text_ids": mk((b, s), jnp.int32),
        "text_masks": mk((b, s), jnp.int32),
        "text_labels": mk((b, s), jnp.int32),
    }
    if mode == "pretrain":
        shapes.update({
            "text_ids_mlm": mk((b, s), jnp.int32),
            "text_labels_mlm": mk((b, s), jnp.int32),
            "false_image_0": mk((b, size, size, 3), jnp.float32),
        })
    else:
        shapes.update({
            "vqa_targets": mk((b, cfg["vqa_label_size"]), jnp.float32),
            "answer_types": mk((b,), jnp.int32),
            "sample_valid": mk((b,), jnp.float32),
        })
    which = "eval" if mode == "eval" else "train"
    step = trainer._get_jitted(which)
    if which == "train":
        lowered = step.lower(trainer.params, trainer.opt_state, shapes,
                             jax.random.key(0))
    else:
        lowered = step.lower(trainer.params, shapes)
    compiled = lowered.compile(
        compiler_options={"xla_backend_optimization_level": 0})
    cost = compiled.cost_analysis()
    flops = float(cost["flops"])
    gf_per_sample = flops / batch / 1e9
    print(f"mode={mode} preset={preset} batch={batch}: "
          f"total {flops / 1e9:.1f} GF -> {gf_per_sample:.1f} GF/sample")
    return gf_per_sample


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "pretrain"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    preset = sys.argv[3] if len(sys.argv) > 3 else "clip16"
    audit(mode, batch, preset)
