"""Parallelism tests: partition-spec rules and dp-vs-tp exactness on the
virtual CPU mesh."""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mm_vqa_healthcare_tpu.parallel.partition import leaf_spec


class _K:
    def __init__(self, key):
        self.key = key


def _spec(*parts):
    return leaf_spec(tuple(_K(p) for p in parts))


@pytest.mark.fast
def test_partition_rules():
    # column-parallel: attention q/k/v, MLP up, packed in_proj
    assert _spec("attention", "self", "query", "kernel") == P(None, "model")
    assert _spec("intermediate", "dense", "kernel") == P(None, "model")
    assert _spec("attn", "in_proj_kernel") == P(None, "model")
    assert _spec("c_fc", "kernel") == P(None, "model")
    assert _spec("ff", "wi", "kernel") == P(None, "model")
    # row-parallel: attention out, MLP down
    assert _spec("attention", "output", "dense", "kernel") == P("model", None)
    assert _spec("attn", "out_proj", "kernel") == P("model", None)
    assert _spec("c_proj", "kernel") == P("model", None)
    assert _spec("ff", "wo", "kernel") == P("model", None)
    # replicated: embeddings, LN
    assert _spec("word_embeddings", "embedding") == P()
    assert _spec("LayerNorm", "scale") == P()
    assert _spec("ln_1", "bias") == P()
    # biases follow their kernels
    assert _spec("attention", "self", "query", "bias") == P("model")
    assert _spec("attention", "output", "dense", "bias") == P()


def test_dp_vs_tp_exactness():
    """A dp2 and a dp2xtp2 train step on the same global batch produce the
    same loss (tensor parallelism is a pure layout change)."""
    import __graft_entry__ as g
    loss_dp = g._dryrun_one({"data": 2, "model": 1}, "test-dp2")
    loss_tp = g._dryrun_one({"data": 2, "model": 2}, "test-dp2xtp2")
    assert abs(loss_dp - loss_tp) < 1e-3


@pytest.mark.fast
def test_fsdp_spec_rules():
    """FSDP adds a data-axis storage shard on the largest free,
    evenly-divisible dim; small leaves and indivisible shapes replicate;
    TP-taken dims are skipped."""
    from mm_vqa_healthcare_tpu.parallel.partition import _with_fsdp

    # plain 2-D kernel: shard the larger (output) dim
    assert _with_fsdp(P(), (768, 3072), 8, 0) == P(None, "data")
    # TP column kernel: model owns dim 1 -> data takes dim 0
    assert _with_fsdp(P(None, "model"), (768, 3072), 8, 0) == \
        P("data", "model")
    # indivisible everywhere -> unchanged
    assert _with_fsdp(P(), (577, 11), 8, 0) == P()
    # below the min-size threshold -> unchanged
    assert _with_fsdp(P(), (768,), 8, 2 ** 14) == P()
    # 3-D pos-embed [1, 577, 768]: only the last dim divides
    assert _with_fsdp(P(), (1, 577, 768), 8, 0) == P(None, None, "data")


@pytest.mark.fast
def test_fsdp_params_actually_sharded():
    """shard_params(fsdp=True) must produce leaves whose addressable shard
    is 1/data_size of the full array (ZeRO-3 storage)."""
    import jax
    import jax.numpy as jnp
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
    from mm_vqa_healthcare_tpu.parallel.partition import shard_params

    mesh = mesh_lib.make_mesh({"data": 8})
    params = {"w": jnp.zeros((16, 128)), "tiny": jnp.zeros((4,))}
    out = shard_params(mesh, params, fsdp=True, fsdp_min_elems=0)
    shard = out["w"].addressable_shards[0].data
    assert shard.shape == (16, 16), shard.shape
    assert out["tiny"].addressable_shards[0].data.shape == (4,)


def test_dp_vs_fsdp_exactness():
    """FSDP is a pure storage-layout change: a dp2 and a dp2+fsdp train
    step on the same global batch produce the same loss."""
    import __graft_entry__ as g
    loss_dp = g._dryrun_one({"data": 2, "model": 1}, "test-dp2")
    loss_fsdp = g._dryrun_one({"data": 2, "model": 1}, "test-dp2-fsdp",
                              fsdp=True)
    assert abs(loss_dp - loss_fsdp) < 1e-3


def test_fsdp_scale_shape_production_threshold():
    """FSDP at scale shape with the PRODUCTION min-size threshold
    (fsdp_min_elems default 2^14, i.e. NOT the dryrun's 0): a model whose
    transformer kernels sit above the threshold must (a) store params and
    Adam moments at ~1/n bytes per device while LN scales/biases stay
    replicated, and (b) compile a train step whose HLO contains the ZeRO-3
    collectives — all-gather (params on use) and reduce-scatter (grads).
    VERDICT r2 item 8."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    n = 8
    # hidden 256: attention kernels 256x256 = 65536 elems and FFN kernels
    # 256x1024 — above the 2^14 production threshold; biases/LN (256 = 2^8)
    # below it.  fsdp_min_elems deliberately NOT overridden.
    cfg = compose(["task_finetune_vqa_vqa_rad", "tiny_debug"],
                  {"mesh_shape": {"data": n}, "fsdp": True,
                   "hidden_size": 256, "num_heads": 4,
                   "input_image_embed_size": 256,
                   "input_text_embed_size": 256,
                   "vqa_label_size": 6,
                   "per_gpu_batchsize": 1, "batch_size": n,
                   "max_steps": 2, "warmup_steps": 0,
                   "attention_impl": "xla"})
    trainer = Trainer(cfg)
    trainer.init_params()
    trainer.setup_optimizer(steps_per_epoch=4)

    flat = flatten(trainer.params)
    key_big = next(k for k, v in flat.items()
                   if k[-1] == "kernel" and v.shape == (256, 256))
    big = flat[key_big]
    shard = big.addressable_shards[0].data
    assert shard.size == big.size // n, (shard.shape, big.shape)
    key_ln = next(k for k in flat if k[-1] == "scale")
    ln = flat[key_ln]
    assert ln.addressable_shards[0].data.size == ln.size  # replicated

    # Adam moments follow their param's storage sharding
    flat_opt = flatten(trainer.opt_state)
    mu_big = flat_opt[("mu",) + key_big]
    assert mu_big.addressable_shards[0].data.size == mu_big.size // n

    # total param bytes per device ~ 1/n of the big leaves + replicated rest
    total = sum(x.size for x in flat.values())
    per_dev = sum(x.addressable_shards[0].data.size for x in flat.values())
    assert per_dev < 0.45 * total, (per_dev, total)  # mostly sharded

    # compiled train step must contain the ZeRO-3 collectives
    b, s = n, cfg["max_text_len"]
    sh = mesh_lib.batch_sharding(trainer.mesh)
    mk = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=sh)
    import jax.numpy as jnp
    shapes = {"image": mk((b, cfg["image_size"], cfg["image_size"], 3),
                          jnp.float32),
              "text_ids": mk((b, s), jnp.int32),
              "text_masks": mk((b, s), jnp.int32),
              "text_labels": mk((b, s), jnp.int32),
              "vqa_targets": mk((b, 6), jnp.float32),
              "answer_types": mk((b,), jnp.int32),
              "sample_valid": mk((b,), jnp.float32)}
    compiled = trainer._get_jitted("train").lower(
        trainer.params, trainer.opt_state, shapes, jax.random.key(0)
    ).compile()
    hlo = compiled.as_text()
    assert "all-gather" in hlo, "FSDP params must all-gather on use"
    # Grad reduction: GSPMD expresses it as all-reduce + shard-slice; the
    # ReduceScatterCreator rewrite that fuses that pair into a true
    # reduce-scatter runs in the TPU/GPU backend pipelines only — the CPU
    # pipeline (this virtual mesh) keeps the all-reduce form.  Assert the
    # reduction exists in either form; on a real TPU backend require the
    # fused reduce-scatter.
    assert ("reduce-scatter" in hlo or "all-reduce" in hlo), \
        "FSDP grads must be reduced across the data axis"
    if jax.default_backend() == "tpu":
        assert "reduce-scatter" in hlo
