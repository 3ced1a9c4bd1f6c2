"""Mixed-precision train step: one-time bf16 param cast + rbg PRNG.

The production bf16 recipe (PERF.md round-2 queue): master params stay
fp32 in the optimizer; inside the jitted step they are cast to
compute_dtype once, so every per-use `.astype` in the layers becomes a
no-op and the fwd/bwd GEMMs read half the HBM bytes.  Losses are still
computed in fp32 (objectives.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.config import compose
from mm_vqa_healthcare_tpu.train.trainer import (
    Trainer, cast_floats, make_train_key)


def _tiny_cfg(**over):
    return compose(["task_finetune_vqa_vqa_rad", "tiny_debug"],
                   {"vqa_label_size": 6, "max_steps": 2, "warmup_steps": 0,
                    "attention_impl": "xla", **over})


def _tiny_batch(cfg, b=8):
    rng = np.random.default_rng(0)
    s = cfg["max_text_len"]
    return {
        "image": rng.normal(size=(b, cfg["image_size"], cfg["image_size"], 3)
                            ).astype(np.float32),
        "text_ids": rng.integers(0, cfg["vocab_size"], (b, s)).astype(np.int32),
        "text_masks": np.ones((b, s), np.int32),
        "text_labels": np.full((b, s), -100, np.int32),
        "vqa_targets": np.eye(6, dtype=np.float32)[rng.integers(0, 6, b)],
        "answer_types": rng.integers(0, 2, b).astype(np.int32),
        "sample_valid": np.ones(b, np.float32),
    }


def test_cast_floats_only_touches_fp32():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "i": jnp.ones((2,), jnp.int32),
            "b": jnp.ones((2,), jnp.bfloat16)}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32
    assert out["b"].dtype == jnp.bfloat16


@pytest.mark.parametrize("rng_impl", ["threefry", "rbg"])
def test_bf16_cast_once_train_step(rng_impl):
    cfg = _tiny_cfg(compute_dtype="bfloat16", cast_params_once=True,
                    rng_impl=rng_impl)
    trainer = Trainer(cfg)
    trainer.init_params()
    trainer.setup_optimizer(steps_per_epoch=4)
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
    batch = mesh_lib.shard_batch(trainer.mesh, _tiny_batch(cfg))
    step = trainer._get_jitted("train")
    rng = make_train_key(0, rng_impl)
    params, opt_state, aux = step(trainer.params, trainer.opt_state,
                                  batch, rng)
    loss = float(jax.device_get(aux["loss"]))
    assert np.isfinite(loss)
    # master params stay fp32 through the update
    leaf = jax.tree.leaves(params)[0]
    dtypes = {x.dtype for x in jax.tree.leaves(params)
              if jnp.issubdtype(x.dtype, jnp.floating)}
    assert dtypes == {jnp.dtype(jnp.float32)}, (leaf.dtype, dtypes)


def test_bf16_cast_matches_no_cast_loss():
    """cast-once vs per-use casts: same quantization points for the fused
    path except the text tower (which legitimately moves fp32->bf16), so
    losses agree loosely."""
    losses = {}
    for cast in (True, False):
        cfg = _tiny_cfg(compute_dtype="bfloat16", cast_params_once=cast,
                        drop_rate=0.0)
        trainer = Trainer(cfg)
        trainer.init_params()
        from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
        batch = mesh_lib.shard_batch(trainer.mesh, _tiny_batch(cfg))
        aux = trainer._get_jitted("eval")(trainer.params, batch)
        losses[cast] = float(jax.device_get(aux["loss"]))
    assert abs(losses[True] - losses[False]) < 5e-2, losses
