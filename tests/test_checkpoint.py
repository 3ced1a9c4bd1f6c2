"""Checkpoint conversion + numerical parity tests against torch oracles.

These validate the hard requirement that reference PL checkpoints load
unchanged (SURVEY.md §5 checkpoint contract): name mapping, packed-qkv
splitting, patch-conv reshaping, and torch-exact bicubic pos-embed
re-interpolation (clip_model.py:224-251)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.checkpoint.interpolate import (
    adapt_clip_position_embedding, bicubic_resize_2d)
from mm_vqa_healthcare_tpu.checkpoint import convert
from tests.oracle_utils import reference_clip_model


def test_bicubic_matches_torch_interpolate():
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(14, 14, 8)).astype(np.float32)
    ours = bicubic_resize_2d(grid, 24, 24)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(grid).permute(2, 0, 1).unsqueeze(0),
        size=(24, 24), mode="bicubic")
    ref = ref.squeeze(0).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_adapt_position_embedding_shape_and_cls_row():
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(14 * 14 + 1, 16)).astype(np.float32)
    out = adapt_clip_position_embedding(pos, patch_size=16, after=384)
    assert out.shape == (24 * 24 + 1, 16)
    np.testing.assert_array_equal(out[0], pos[0])  # cls row passthrough


def test_multihead_attention_matches_torch():
    from mm_vqa_healthcare_tpu.models.layers import MultiHeadAttention
    d, h, s, b = 32, 4, 10, 2
    torch.manual_seed(0)
    t_mha = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(b, s, d)
    with torch.no_grad():
        ref, _ = t_mha(x, x, x, need_weights=False)

    mha = MultiHeadAttention(num_heads=h, attention_impl="xla")
    params = {"params": {
        "in_proj_kernel": t_mha.in_proj_weight.detach().numpy().T,
        "in_proj_bias": t_mha.in_proj_bias.detach().numpy(),
        "out_proj": {"kernel": t_mha.out_proj.weight.detach().numpy().T,
                     "bias": t_mha.out_proj.bias.detach().numpy()},
    }}
    out = mha.apply(params, jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
                    jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


@pytest.fixture(scope="module")
def ref_clip():
    mod = reference_clip_model()
    if mod is None:
        pytest.skip("reference clip_model not importable")
    return mod


def test_visual_transformer_matches_reference(ref_clip):
    """Full CLIP visual tower parity: reference torch module -> state_dict ->
    our converter -> our flax tower; same random image, same output."""
    from mm_vqa_healthcare_tpu.models.clip_vit import (
        CLIPViTConfig, VisualTransformer)

    torch.manual_seed(0)
    width, layers, heads, patch, res = 64, 4, 4, 16, 64
    t_model = ref_clip.VisualTransformer(
        input_resolution=res, patch_size=patch, width=width, layers=layers,
        heads=heads, output_dim=width, resolution_after=res)
    t_model.eval()
    img = torch.randn(2, 3, res, res)
    with torch.no_grad():
        ref_out = t_model(img, None).numpy()

    # Build the torch state_dict under the reference's checkpoint prefix.
    sd = {f"vision_encoder.visual.{k}": v.numpy()
          for k, v in t_model.state_dict().items()}

    cfg = CLIPViTConfig(width=width, layers=layers, heads=heads,
                        patch_size=patch, resolution=res,
                        attention_impl="xla")
    model = VisualTransformer(cfg)
    init = model.init(jax.random.key(0),
                      jnp.zeros((1, res, res, 3), jnp.float32))

    # Reuse the vision-tower subset of the full converter rules.
    class _Cfg:
        is_clip = True
        vit = "ViT-B/16"
        image_size = res
        patch_size = patch
        tokenizer = "bert-base-uncased"
        num_top_layer = 0
        use_vqa_head = use_mlm_head = use_itm_head = use_mim_head = False
        mim_decoder_num_layers = 0

    import mm_vqa_healthcare_tpu.models.clip_vit as cv
    orig = cv.CLIP_VIT_PRESETS["ViT-B/16"]
    cv.CLIP_VIT_PRESETS["ViT-B/16"] = dict(width=width, layers=layers,
                                           heads=heads, patch_size=patch)
    try:
        rules = convert.build_rules(_Cfg)
        vision_rules = [r for r in rules if r[0].startswith("vision_encoder")]
        flat = convert.flatten({"params": init["params"]})
        for torch_key, flax_path, transform in vision_rules:
            # strip the ("vision_encoder",) prefix: we convert the tower alone
            path = ("params",) + flax_path[1:]
            assert torch_key in sd, torch_key
            flat[path] = convert._to_flax(
                np.asarray(sd[torch_key]), transform, _Cfg).astype(np.float32)
        params = convert.unflatten(flat)
    finally:
        cv.CLIP_VIT_PRESETS["ViT-B/16"] = orig

    img_nhwc = jnp.asarray(img.numpy().transpose(0, 2, 3, 1))
    out = model.apply(params, img_nhwc)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=3e-5, rtol=1e-4)


def test_text_encoder_matches_hf_bert():
    """Text tower parity vs transformers BertModel on a small random config."""
    from transformers.models.bert.modeling_bert import BertConfig, BertModel
    from mm_vqa_healthcare_tpu.models.bert import (
        TextEncoder, TextEncoderConfig)
    from mm_vqa_healthcare_tpu.ops.attention import extended_attention_mask

    hf_cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=16, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    torch.manual_seed(1)
    hf = BertModel(hf_cfg)
    hf.eval()
    ids = torch.randint(0, 64, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        ref = hf(ids, attention_mask=mask).last_hidden_state.numpy()

    cfg = TextEncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64,
                            max_position_embeddings=16, attention_impl="xla")
    model = TextEncoder(cfg)
    init = model.init(jax.random.key(0), jnp.asarray(ids.numpy()))

    sd = {f"language_encoder.{k}": v.numpy() for k, v in hf.state_dict().items()}

    class _Cfg:
        is_clip = True
        vit = "ViT-B/16"
        image_size = 224
        patch_size = 16
        tokenizer = "bert-base-uncased"
        num_top_layer = 0
        use_vqa_head = use_mlm_head = use_itm_head = use_mim_head = False
        mim_decoder_num_layers = 0

    import mm_vqa_healthcare_tpu.models.bert as bert_mod
    orig = bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"]
    bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"] = cfg
    try:
        rules = convert.build_rules(_Cfg)
        text_rules = [r for r in rules if r[0].startswith("language_encoder")]
        flat = convert.flatten({"params": init["params"]})
        for torch_key, flax_path, transform in text_rules:
            path = ("params",) + flax_path[1:]
            assert torch_key in sd, torch_key
            flat[path] = convert._to_flax(
                np.asarray(sd[torch_key]), transform, _Cfg).astype(np.float32)
        params = convert.unflatten(flat)
    finally:
        bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"] = orig

    bias = extended_attention_mask(jnp.asarray(mask.numpy()))
    out = model.apply(params, jnp.asarray(ids.numpy()), bias)
    # compare only unmasked positions (masked positions may diverge freely)
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], ref[m], atol=3e-5, rtol=1e-4)


def test_roundtrip_params_to_torch_and_back():
    """params -> torch state_dict -> params is the identity."""
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    import dataclasses
    import mm_vqa_healthcare_tpu.models.bert as bert_mod
    import mm_vqa_healthcare_tpu.models.clip_vit as cv

    small_text = dataclasses.replace(
        bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"],
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=16)
    orig_t = bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"]
    orig_v = cv.CLIP_VIT_PRESETS["ViT-B/16"]
    bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"] = small_text
    cv.CLIP_VIT_PRESETS["ViT-B/16"] = dict(width=32, layers=3, heads=2,
                                           patch_size=16)
    try:
        cfg = M3AEConfig(vit="ViT-B/16", image_size=32, patch_size=16,
                         hidden_size=32, num_heads=2, num_top_layer=2,
                         vocab_size=64, vqa_label_size=5,
                         use_mlm_head=True, use_itm_head=True,
                         use_mim_head=True, mim_decoder_hidden_size=16,
                         mim_decoder_num_heads=2, mim_decoder_num_layers=1,
                         attention_impl="xla")
        model = M3AE(cfg)
        batch = {
            "text_ids": jnp.ones((1, 8), jnp.int32),
            "text_masks": jnp.ones((1, 8), jnp.int32),
            "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        }
        params = model.init({"params": jax.random.key(0),
                             "mim": jax.random.key(1)}, batch)
        sd = convert.params_to_torch_state_dict(params, cfg)
        assert "vision_encoder.visual.conv1.weight" in sd
        assert "multi_modal_language_layers.0.crossattention.self.query.weight" in sd
        assert "vqa_head.0.weight" in sd

        restored, loaded, missing = convert.torch_state_dict_to_params(
            sd, cfg, init_params=params)
        flat_a = convert.flatten(params)
        flat_b = convert.flatten(restored)
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(np.asarray(flat_a[k]),
                                       np.asarray(flat_b[k]), atol=1e-6,
                                       err_msg=str(k))
        assert not missing
    finally:
        bert_mod.TEXT_ENCODER_PRESETS["bert-base-uncased"] = orig_t
        cv.CLIP_VIT_PRESETS["ViT-B/16"] = orig_v


def test_bert_cross_layer_matches_torch_oracle():
    """BertCrossLayer parity: self-attn -> cross-attn -> FFN with HF math,
    assembled from stock torch modules as the oracle (the reference block
    is bert_model.py:445-503)."""
    import torch.nn as tnn
    import math as _math

    d, h, inter, sq, sk, b = 32, 4, 64, 6, 9, 2
    torch.manual_seed(3)

    class TorchSelfAttn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.query = tnn.Linear(d, d)
            self.key = tnn.Linear(d, d)
            self.value = tnn.Linear(d, d)

        def forward(self, x, kv, mask_bias):
            def heads(t):
                B, S, _ = t.shape
                return t.view(B, S, h, d // h).permute(0, 2, 1, 3)
            q, k, v = heads(self.query(x)), heads(self.key(kv)), heads(self.value(kv))
            scores = q @ k.transpose(-1, -2) / _math.sqrt(d // h)
            if mask_bias is not None:
                scores = scores + mask_bias
            p = torch.softmax(scores, -1)
            ctx = (p @ v).permute(0, 2, 1, 3).reshape(x.shape[0], -1, d)
            return ctx

    class TorchBlock(tnn.Module):
        """HF post-LN: Attn(dense+LN(res)) x2 + gelu FFN + LN(res)."""

        def __init__(self):
            super().__init__()
            self.s = TorchSelfAttn()
            self.s_out = tnn.Linear(d, d)
            self.s_ln = tnn.LayerNorm(d, eps=1e-12)
            self.c = TorchSelfAttn()
            self.c_out = tnn.Linear(d, d)
            self.c_ln = tnn.LayerNorm(d, eps=1e-12)
            self.inter = tnn.Linear(d, inter)
            self.out = tnn.Linear(inter, d)
            self.out_ln = tnn.LayerNorm(d, eps=1e-12)

        def forward(self, x, enc, self_bias, cross_bias):
            a = self.s_ln(self.s_out(self.s(x, x, self_bias)) + x)
            c = self.c_ln(self.c_out(self.c(a, enc, cross_bias)) + a)
            f = self.out(tnn.functional.gelu(self.inter(c)))
            return self.out_ln(f + c)

    oracle = TorchBlock().eval()
    x = torch.randn(b, sq, d)
    enc = torch.randn(b, sk, d)
    mask = torch.ones(b, sk)
    mask[1, 5:] = 0
    cross_bias = ((1 - mask) * -10000.0)[:, None, None, :]
    with torch.no_grad():
        ref = oracle(x, enc, None, cross_bias).numpy()

    from mm_vqa_healthcare_tpu.models.bert import BertCrossLayer
    from mm_vqa_healthcare_tpu.ops.attention import extended_attention_mask
    layer = BertCrossLayer(num_heads=h, intermediate_size=inter,
                           attention_impl="xla")
    init = layer.init(jax.random.key(0), jnp.asarray(x.numpy()),
                      jnp.asarray(enc.numpy()))

    def lin(m):
        return {"kernel": m.weight.detach().numpy().T,
                "bias": m.bias.detach().numpy()}

    def ln(m):
        return {"scale": m.weight.detach().numpy(),
                "bias": m.bias.detach().numpy()}

    params = {"params": {
        "attention": {
            "self": {"query": lin(oracle.s.query), "key": lin(oracle.s.key),
                     "value": lin(oracle.s.value)},
            "output": {"dense": lin(oracle.s_out), "LayerNorm": ln(oracle.s_ln)},
        },
        "crossattention": {
            "self": {"query": lin(oracle.c.query), "key": lin(oracle.c.key),
                     "value": lin(oracle.c.value)},
            "output": {"dense": lin(oracle.c_out), "LayerNorm": ln(oracle.c_ln)},
        },
        "intermediate": {"dense": lin(oracle.inter)},
        "output": {"dense": lin(oracle.out), "LayerNorm": ln(oracle.out_ln)},
    }}
    out = layer.apply(params, jnp.asarray(x.numpy()), jnp.asarray(enc.numpy()),
                      None, extended_attention_mask(jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)
