"""cls/irtr objectives + full-corpus retrieval recall at debug scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import fixtures


@pytest.fixture(scope="module")
def caption_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("irtr_fixture"))
    data_root = fixtures.make_caption_fixture(root, name="irtr_roco")
    vocab = fixtures.write_vocab(root + "/vocab.txt")
    return data_root, vocab


def _irtr_config(data_root, vocab, **overrides):
    from mm_vqa_healthcare_tpu import config as C
    cfg = C.compose(["tiny_debug"])
    cfg.update(
        datasets=["irtr_roco"],
        loss_names=C.loss_names({"irtr": 1}),
        draw_false_text=2,
        draw_false_image=0,
        data_root=data_root,
        tokenizer_path=vocab,
        attention_impl="xla",
        max_steps=1, max_epoch=1, warmup_steps=0,
        mesh_shape={"data": 1},
        per_gpu_batchsize=2, batch_size=2,
    )
    cfg.update(overrides)
    return cfg


def test_irtr_objective_and_recall(caption_data):
    from mm_vqa_healthcare_tpu.train.trainer import Trainer
    from mm_vqa_healthcare_tpu.train.retrieval import compute_irtr_recall
    data_root, vocab = caption_data
    cfg = _irtr_config(data_root, vocab)
    t = Trainer(cfg)
    dm = t.setup_data()
    t.init_params()
    t.setup_optimizer(steps_per_epoch=1)
    train_step = t._get_jitted("train")
    for batch in dm.train_loader(0):
        dev = t._device_batch(batch)
        t.params, t.opt_state, aux = train_step(t.params, t.opt_state, dev,
                                                jax.random.key(0))
        assert np.isfinite(float(jax.device_get(aux)["irtr_loss_sum"]))
        break
    recalls = compute_irtr_recall(t.model, t.params, dm, text_batch_size=4)
    assert len(recalls) == 6
    assert all(0.0 <= r <= 1.0 for r in recalls)


def test_cls_objective():
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    from mm_vqa_healthcare_tpu.train.objectives import compute_cls
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=2, input_image_embed_size=64,
                     input_text_embed_size=64, use_vqa_head=False,
                     use_cls_head=True, cls_label_size=5,
                     attention_impl="xla")
    model = M3AE(cfg)
    batch = {
        "text_ids": jnp.ones((2, 8), jnp.int32),
        "text_masks": jnp.ones((2, 8), jnp.int32),
        "image": jnp.ones((2, 32, 32, 3), jnp.float32),
        "cls_labels": jnp.asarray([1, 3], jnp.int32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    loss, aux = compute_cls(model, params, batch)
    assert np.isfinite(float(loss))
    assert int(aux["cls_total"]) == 2
