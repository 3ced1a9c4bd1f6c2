"""End-to-end training tests at debug scale on the CPU backend (8 virtual
devices): classifier fine-tune slice, optimizer grouping parity, eval."""

import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def vqa_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_fixture")
    return fixtures.make_vqa_fixture(str(root))


@pytest.mark.fast
def test_optimizer_group_labels():
    """Reference set_schedule grouping (m3ae_utils.py:121-201): heads x100,
    multi_modal x5, biases/LN no-decay — and the quirk that CLIP ln_1/ln_2
    *weights* are NOT in the no-decay list (only their biases, via 'bias')."""
    from mm_vqa_healthcare_tpu.train.optim import group_label
    assert group_label("vqa_head.0.weight") == "head"
    assert group_label("vqa_head.0.bias") == "head_nd"
    assert group_label("multi_modal_language_layers.0.attention.self.query.weight") == "mm"
    assert group_label("multi_modal_language_proj.bias") == "mm_nd"
    assert group_label("language_encoder.encoder.layer.0.attention.output.LayerNorm.weight") == "base_nd"
    assert group_label("language_encoder.encoder.layer.0.attention.self.query.weight") == "base"
    # CLIP block LN weight: torch name ln_1.weight matches no no_decay pattern
    assert group_label("vision_encoder.visual.transformer.resblocks.0.ln_1.weight") == "base"
    assert group_label("vision_encoder.visual.transformer.resblocks.0.ln_1.bias") == "base_nd"
    assert group_label("mim_head.decoder_norm.weight") == "head_nd"  # "norm.weight"


@pytest.mark.fast
def test_finetune_classifier_tiny(vqa_data):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, label2ans, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, max_steps=2,
                               batch_size=4, per_gpu_batchsize=4)
    t = Trainer(cfg)
    metrics = t.fit()
    assert "vqa/score" in metrics
    assert 0.0 <= metrics["vqa/score"] <= 1.0
    assert "test/exact_match" in metrics
    assert np.isfinite(metrics["vqa/score"])


def test_test_only_eval(vqa_data):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, label2ans, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, test_only=True)
    t = Trainer(cfg)
    t.setup_data()
    t.init_params()
    metrics = t.test()
    assert "vqa/score" in metrics
    assert "test/rouge1" in metrics


@pytest.mark.fast
def test_grad_accumulation_math():
    """grad_steps = batch_size // (per_gpu_batchsize * num_devices)
    (reference main.py:50)."""
    from tests import fixtures as fx
    # covered implicitly in Trainer.setup_optimizer; check the arithmetic
    batch_size, per_dev, n_dev = 64, 4, 8
    assert batch_size // (per_dev * n_dev) == 2


def test_train_state_save_load(tmp_path, vqa_data):
    """resume_from round-trip: params + opt_state + step restore."""
    import jax
    from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab)
    t = Trainer(cfg)
    t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=2)
    path = str(tmp_path / "state.ckpt")
    ckpt_io.save_train_state(path, t.params, t.opt_state, 7, cfg)
    p2, o2, step = ckpt_io.load_train_state(path, t.params, t.opt_state)
    assert step == 7
    import numpy as np
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
    fa, fb = flatten(t.params), flatten(p2)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


def test_predictor_end_to_end(tmp_path, vqa_data):
    """Serving path: image files + questions -> english answers."""
    import json
    import numpy as np
    from PIL import Image
    from mm_vqa_healthcare_tpu.cli.predict import Predictor
    data_root, label2ans, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, mesh_shape={"data": 1})
    pred = Predictor(cfg, batch_size=2)
    img = tmp_path / "q.png"
    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(img)
    out = pred.answer([str(img)] * 3, ["is there cardiomegaly"] * 3)
    assert len(out) == 3
    answers = set(json.load(open(label2ans)).values())
    assert all(o["answer"] in answers for o in out)


def test_generative_predictors_datasetless(tmp_path, vqa_data):
    """Decoder-greedy and T5-beam serving heads answer (image, question)
    pairs WITHOUT any Arrow dataset present (setup_model path)."""
    import numpy as np
    from PIL import Image
    from mm_vqa_healthcare_tpu.cli.predict import (DecoderPredictor,
                                                   T5Predictor)
    from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab,
                               mesh_shape={"data": 1}, t5_max_length=8)
    # data_root intentionally nonexistent: serving must not touch it
    # (tiny_config itself only reads label2ans.json for the label count)
    cfg["data_root"] = str(tmp_path / "no_data")
    img = tmp_path / "q.png"
    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(img)

    pred = DecoderPredictor(cfg, batch_size=2)
    out = pred.answer([str(img)] * 3, ["is there cardiomegaly"] * 3)
    assert len(out) == 3 and all(isinstance(o["answer"], str) for o in out)

    import mm_vqa_healthcare_tpu.models.t5 as t5_mod
    from mm_vqa_healthcare_tpu.models.t5 import T5Config
    t5_mod.T5_PRESETS["t5-small"] = T5Config(
        vocab_size=200, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2)
    tok = load_tokenizer("tiny-bert", vocab)
    cfg2 = dict(cfg, beam_impl="device")
    pred = T5Predictor(cfg2, batch_size=2, t5_tokenizer=tok)
    out = pred.answer([str(img)] * 2, ["is there cardiomegaly"] * 2)
    assert len(out) == 2 and all(isinstance(o["answer"], str) for o in out)


def test_reference_ckpt_load_flow(tmp_path, vqa_data):
    """test_m3ae.sh flow: a reference-format PL .ckpt loads through
    load_path and drives test-only eval (the checkpoint contract)."""
    from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, test_only=True)
    t0 = Trainer(cfg)
    t0.setup_data()
    params = t0.init_params()
    ckpt = str(tmp_path / "ref_style.ckpt")
    ckpt_io.export_torch_ckpt(ckpt, params, t0.model_cfg, cfg)

    cfg2 = fixtures.tiny_config(data_root, vocab, test_only=True,
                                load_path=ckpt)
    t1 = Trainer(cfg2)
    t1.setup_data()
    t1.init_params()
    metrics = t1.test()
    assert "vqa/score" in metrics
    # loaded params must equal the exported ones
    import numpy as np
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
    fa, fb = flatten(params), flatten(t1.params)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=1e-6, err_msg=str(k))


def test_eval_filler_samples_excluded():
    """Wrap-padded final eval batches must not affect metric sums
    (sample_valid masks the filler rows)."""
    import jax
    import jax.numpy as jnp
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    from mm_vqa_healthcare_tpu.train.objectives import compute_vqa_m3ae
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=1, input_image_embed_size=64,
                     input_text_embed_size=64, vqa_label_size=4,
                     attention_impl="xla")
    model = M3AE(cfg)
    base = {
        "text_ids": jnp.ones((3, 8), jnp.int32),
        "text_masks": jnp.ones((3, 8), jnp.int32),
        "image": jnp.ones((3, 32, 32, 3), jnp.float32),
        "vqa_targets": jnp.eye(4)[jnp.asarray([0, 1, 2])].astype(jnp.float32),
        "answer_types": jnp.asarray([0, 1, 0], jnp.int32),
        "sample_valid": jnp.asarray([1.0, 1.0, 0.0]),  # row 2 is filler
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, base)
    _, aux = compute_vqa_m3ae(model, params, base)
    assert float(aux["vqa_total"]) == 2.0
    assert float(aux["vqa_close_total"] + aux["vqa_open_total"]) == 2.0
    # score sums can't exceed the valid count
    assert float(aux["vqa_score_sum"]) <= 2.0


def test_native_msgpack_load_path_roundtrip(tmp_path, vqa_data):
    """`load_path` also accepts this framework's native .msgpack saves
    (best/last checkpoints) — same config key round-trips both formats
    (serving CLI / test-only / resume)."""
    import numpy as np
    from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    data_root, _, vocab = vqa_data
    cfg = fixtures.tiny_config(data_root, vocab, test_only=True)
    t0 = Trainer(cfg)
    t0.setup_data()
    params = t0.init_params()
    ckpt = str(tmp_path / "native_best.msgpack")
    ckpt_io.save_native(ckpt, params, cfg)

    cfg2 = fixtures.tiny_config(data_root, vocab, test_only=True,
                                load_path=ckpt)
    t1 = Trainer(cfg2)
    t1.setup_data()
    t1.init_params()
    fa, fb = flatten(params), flatten(t1.params)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))
