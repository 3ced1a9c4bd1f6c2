"""output_attentions + attention-heatmap visualization.

Covers the reference's `infer(..., output_attentions=True)` contract
(m3ae_module.py:210,267-283: ret["attentions"] per-layer lists of
(self_probs, cross_probs)) and the working rebuild of the dead
`visualize_attention_heatmap` helper (m3ae_decoder.py:225-290) in
mm_vqa_healthcare_tpu/utils/visualize.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_m3ae():
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    cfg = M3AEConfig(vit="ViT-Tiny/16", image_size=32, patch_size=16,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=2, input_image_embed_size=64,
                     input_text_embed_size=64, vqa_label_size=7,
                     attention_impl="xla")
    model = M3AE(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, 200, (2, 8)), jnp.int32),
        "text_masks": jnp.asarray([[1] * 8, [1] * 5 + [0] * 3], jnp.int32),
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        "text": ["is there a nodule in the left lung?", "modality?"],
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)},
                        {k: v for k, v in batch.items() if k != "text"})
    return model, params, batch


@pytest.mark.fast
def test_output_attentions_contract(tiny_m3ae):
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE
    model, params, batch = tiny_m3ae
    jb = {k: v for k, v in batch.items() if k != "text"}
    base = model.apply(params, jb, method=M3AE.infer)
    out = model.apply(params, jb, output_attentions=True, method=M3AE.infer)

    # reference contract: the key is always present, None when the flag is
    # off (m3ae_module.py:210)
    assert base["attentions"] is None
    attns = out["attentions"]
    assert set(attns) == {"text2image_attns", "image2text_attns"}
    n_layers = model.cfg.num_top_layer
    assert len(attns["text2image_attns"]) == n_layers
    assert len(attns["image2text_attns"]) == n_layers

    b, h = 2, model.cfg.num_heads
    s_txt = jb["text_ids"].shape[1]
    s_img = out["multi_modal_image_feats"].shape[1]
    for self_p, cross_p in attns["image2text_attns"]:
        # vision stream: self over image tokens, cross image->text
        assert self_p.shape == (b, h, s_img, s_img)
        assert cross_p.shape == (b, h, s_img, s_txt)
        np.testing.assert_allclose(np.asarray(cross_p).sum(-1), 1.0,
                                   atol=1e-5)
    t2i_self, t2i_cross = attns["text2image_attns"][-1]
    assert t2i_self.shape == (b, h, s_txt, s_txt)
    assert t2i_cross.shape == (b, h, s_txt, s_img)

    # masked text keys (sample 1 pads positions 5..7) get ~zero prob in the
    # vision stream's cross-attention (extended mask bias -10000)
    i2t = np.asarray(attns["image2text_attns"][-1][1])
    assert i2t[1, :, :, 5:].max() < 1e-4
    # ...and masked QUERY rows in the text stream's self-attention still
    # softmax to 1 (the reference never masks queries, only keys)
    np.testing.assert_allclose(np.asarray(t2i_self).sum(-1), 1.0, atol=1e-5)

    # the flag must not perturb the underlying forward
    np.testing.assert_array_equal(
        np.asarray(base["multi_modal_cls_feats"]),
        np.asarray(out["multi_modal_cls_feats"]))


@pytest.mark.fast
def test_attention_probs_matches_manual():
    from mm_vqa_healthcare_tpu.ops.attention import (attention_probs,
                                                     split_heads)
    rng = np.random.default_rng(3)
    b, s_q, s_k, h, d = 2, 4, 6, 2, 16
    q = jnp.asarray(rng.normal(size=(b, s_q, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s_k, h * d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, 1, 1, s_k)), jnp.float32)
    got = attention_probs(q, k, h, bias)
    qh, kh = split_heads(q, h), split_heads(k, h)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(d) + bias
    want = jax.nn.softmax(scores, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.fast
def test_patch_saliency_shapes_and_mask():
    from mm_vqa_healthcare_tpu.utils.visualize import (
        image2text_patch_saliency)
    rng = np.random.default_rng(1)

    def probs(s_img, s_txt):
        x = rng.random((2, 3, s_img, s_txt)).astype(np.float32)
        return x / x.sum(-1, keepdims=True)

    # CLS + 2x2 grid (clip-style S_img = 5)
    sal = image2text_patch_saliency(probs(5, 8))
    assert sal.shape == (2, 2, 2)
    # no CLS (swin-style S_img = 4)
    assert image2text_patch_saliency(probs(4, 8)).shape == (2, 2, 2)
    # upsample
    assert image2text_patch_saliency(probs(5, 8), image_size=32).shape == \
        (2, 32, 32)
    # masked text mean ignores pad keys: make pad-key columns huge — the
    # masked saliency must not change when they do
    p = probs(5, 8)
    masks = np.array([[1] * 8, [1] * 4 + [0] * 4], np.int32)
    base = image2text_patch_saliency(p, masks)
    p2 = p.copy()
    p2[1, :, :, 4:] = 100.0
    np.testing.assert_allclose(image2text_patch_saliency(p2, masks)[1],
                               base[1], atol=1e-5)
    with pytest.raises(ValueError):
        image2text_patch_saliency(probs(7, 8))  # 7 = no valid grid


@pytest.mark.fast
def test_heatmap_figure_end_to_end(tiny_m3ae):
    pytest.importorskip("matplotlib")
    from mm_vqa_healthcare_tpu.utils.visualize import (
        visualize_attention_heatmap)
    model, params, batch = tiny_m3ae
    fig = visualize_attention_heatmap(model, params, batch)
    # one populated subplot per sample (2 samples -> 2x1 or 1x2 grid)
    drawn = [ax for ax in fig.axes if ax.images]
    assert len(drawn) == 2
    # question text became the title (reference m3ae_decoder.py:269,284)
    titles = {ax.get_title() for ax in drawn}
    assert any("nodule" in t for t in titles)
    import matplotlib.pyplot as plt
    plt.close(fig)
