"""Jitted train steps must NOT retrace when fed their own carried outputs.

Regression guard for the batch19 postmortem (PERF.md): optax.multi_transform's
MaskedNode opt-state placement differed between ``tx.init`` and the jitted
update's output, so the SECOND training step changed the pytree signature and
triggered a full retrace + remote recompile (~160 s on the axon tunnel, and a
silent 18x "slowdown" inside any fixed measurement window).  The trainers now
use LeafFusedAdamW whose state structure is stable; this test pins that
property for all three trainers by asserting the jit cache stays at ONE entry
across a fresh-state call and two carried-state calls.
"""

import jax
import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def vqa_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("retrace_fixture")
    return fixtures.make_vqa_fixture(str(root))


def _drive(step, params, opt_state, batch, rng, n=3):
    """Call the jitted step once on fresh state and n-1 times on carry."""
    for i in range(n):
        out = step(params, opt_state, batch, jax.random.fold_in(rng, i))
        params, opt_state = out[0], out[1]
    jax.device_get(out[2])
    return params, opt_state


def test_classifier_train_step_no_retrace(vqa_data):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab)
    t = Trainer(cfg)
    t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    batch = t._device_batch(next(iter(t.dm.train_loader(0))))
    step = t._get_jitted("train")
    _drive(step, t.params, t.opt_state, batch, t.rng)
    assert step._cache_size() == 1, (
        "classifier train step retraced on carried state")


def test_classifier_train_step_no_retrace_with_accum(vqa_data):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, batch_size=8)  # accum=2
    t = Trainer(cfg)
    t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    assert t.grad_accum_steps == 2
    batch = t._device_batch(next(iter(t.dm.train_loader(0))))
    step = t._get_jitted("train")
    _drive(step, t.params, t.opt_state, batch, t.rng, n=5)
    assert step._cache_size() == 1, (
        "accumulating train step retraced on carried state")


def test_decoder_train_step_no_retrace(vqa_data):
    from mm_vqa_healthcare_tpu.train.decoder_trainer import DecoderTrainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab)
    t = DecoderTrainer(cfg)
    t.max_answer_length = 8
    t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    batch = next(iter(t.dm.train_loader(0)))
    dev = t._device_batch(batch, with_targets=True)
    step = t._get_jitted("train")
    _drive(step, t.params, t.opt_state, dev, t.rng)
    assert step._cache_size() == 1, (
        "decoder train step retraced on carried state")


def test_t5_train_step_no_retrace(vqa_data):
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer

    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, t5_max_length=8,
                               unfreeze_num_encoder_layers=1,
                               unfreeze_num_decoder_layers=1)
    tok = load_tokenizer("tiny-bert", vocab)
    t = T5Trainer(cfg, tokenizer=tok)
    t5_mod.T5_PRESETS["t5-small"] = T5Config(
        vocab_size=200, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2)
    t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    batch = next(iter(t.dm.train_loader(0)))
    dev = t._device_batch(batch, with_labels=True)
    step = t._get_jitted("train")
    _drive(step, t.params, t.opt_state, dev, t.rng)
    assert step._cache_size() == 1, (
        "t5 train step retraced on carried state")
