"""Swin encoder tests: window partition round-trip, shift-mask structure,
full tower shapes, M3AE integration (swin avg-pool branch), converter
round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.models.swin import (
    SwinConfig, SwinTransformer, relative_position_index,
    shift_attention_mask, window_partition, window_reverse)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_bounds():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
    assert (np.diag(idx) == idx[0, 0]).all()  # same-offset on diagonal


def test_shift_mask_blocks():
    mask = shift_attention_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # windows not touching the shifted boundary have all-zero mask
    assert (mask[0] == 0).all()


def test_swin_tower_shapes():
    cfg = SwinConfig(image_size=32, patch_size=4, embed_dim=16,
                     depths=(1, 1), num_heads=(2, 2), window_size=4,
                     attention_impl="xla")
    model = SwinTransformer(cfg)
    img = jnp.ones((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), img)
    out = model.apply(params, img)
    # 32/4=8 grid -> one merge -> 4x4=16 tokens, dim 32
    assert out.shape == (2, 16, 32)


def test_m3ae_with_swin_encoder():
    import mm_vqa_healthcare_tpu.models.swin as swin_mod
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    cfg = M3AEConfig(vit="swin_tiny_debug", image_size=32, patch_size=32,
                     tokenizer="tiny-bert", vocab_size=200, hidden_size=64,
                     num_heads=2, num_top_layer=1, input_image_embed_size=32,
                     input_text_embed_size=64, vqa_label_size=5,
                     attention_impl="xla")
    model = M3AE(cfg)
    batch = {
        "text_ids": jnp.ones((2, 8), jnp.int32),
        "text_masks": jnp.ones((2, 8), jnp.int32),
        "image": jnp.ones((2, 32, 32, 3), jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    out = model.apply(params, batch, method=M3AE.infer)
    assert out["multi_modal_cls_feats"].shape == (2, 128)


def test_swin_converter_roundtrip():
    from mm_vqa_healthcare_tpu.checkpoint import convert
    import mm_vqa_healthcare_tpu.models.bert as bert_mod

    class _Cfg:
        is_clip = False
        vit = "swin_tiny_debug"
        image_size = 32
        patch_size = 32
        tokenizer = "tiny-bert"
        num_top_layer = 1
        use_vqa_head = True
        use_mlm_head = use_itm_head = use_mim_head = False
        use_cls_head = use_irtr_head = False
        mim_decoder_num_layers = 0

    rules = convert.build_rules(_Cfg)
    swin_keys = [r[0] for r in rules if r[0].startswith("vision_encoder")]
    assert "vision_encoder.patch_embed.proj.weight" in swin_keys
    assert ("vision_encoder.layers.0.blocks.0.attn.relative_position_bias_table"
            in swin_keys)
    assert "vision_encoder.norm.weight" in swin_keys


def test_swin_relpos_adaptation():
    from mm_vqa_healthcare_tpu.checkpoint.convert import _adapt_swin_relpos
    table = np.random.default_rng(0).normal(
        size=((2 * 7 - 1) ** 2, 4)).astype(np.float32)
    out = _adapt_swin_relpos(table, 12)
    assert out.shape == ((2 * 12 - 1) ** 2, 4)
    same = _adapt_swin_relpos(table, 7)
    np.testing.assert_array_equal(same, table)


def test_window_attention_fold_matches_unfolded():
    """The shifted-window head-axis FOLD (PERF.md batch24) must equal the
    naive per-window-batch bias materialization bitwise: same adds, same
    operands, only the grouping of (window, head) axes changes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_vqa_healthcare_tpu.models.swin import (
        WindowAttention, shift_attention_mask)

    b, ws, c, h = 2, 4, 16, 2
    hh = ww = 8                      # 4 windows of 4x4
    nw = (hh // ws) * (ww // ws)
    n = ws * ws
    mask = jnp.asarray(shift_attention_mask(hh, ww, ws, ws // 2))
    x = jax.random.normal(jax.random.key(0), (b * nw, n, c))
    attn = WindowAttention(dim=c, num_heads=h, window_size=ws,
                           attention_impl="xla")
    params = attn.init(jax.random.key(1), x, mask)
    folded = attn.apply(params, x, mask)

    # unfolded reference: materialize the [b*nw, h, n, n] bias by hand
    from mm_vqa_healthcare_tpu.ops.attention import dot_product_attention
    from mm_vqa_healthcare_tpu.models.swin import relative_position_index
    p = params["params"]
    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    hd = c // h
    q, k, v = [qkv[..., i * c:(i + 1) * c].reshape(b * nw, n, h, hd)
               .transpose(0, 2, 1, 3) for i in range(3)]
    table = p["relative_position_bias_table"]
    idx = relative_position_index(ws).reshape(-1)
    rel = table[idx].reshape(n, n, h).transpose(2, 0, 1)[None]
    bias = rel + jnp.tile(mask[None, :, None], (b, 1, 1, 1, 1)).reshape(
        b * nw, 1, n, n)
    ref = dot_product_attention(q, k, v, bias, impl="xla")
    ref = ref.transpose(0, 2, 1, 3).reshape(b * nw, n, c)
    ref = ref @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(ref))


def test_windowed_resident_layout_parity():
    """The stage-resident windowed layout (windowed=True, the default) must
    reproduce the spatial-resident path exactly: same params, bitwise-equal
    forward (every op is row-independent, only storage order changes), and
    matching grads through the scatter-free windowed_roll VJP."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_vqa_healthcare_tpu.models.swin import SwinConfig, SwinTransformer

    kw = dict(image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
              num_heads=(2, 2), window_size=4, attention_impl="xla")
    # stage 0: res 8x8, 4 windows, block 1 shifted; stage 1: res 4x4,
    # window clamped to the full map (single window, no shift)
    m_sp = SwinTransformer(SwinConfig(windowed=False, **kw))
    m_wd = SwinTransformer(SwinConfig(windowed=True, **kw))
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = m_sp.init(jax.random.key(1), img)
    out_sp = m_sp.apply(params, img)
    out_wd = m_wd.apply(params, img)
    np.testing.assert_array_equal(np.asarray(out_sp), np.asarray(out_wd))

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, img) ** 2)
        return jax.grad(f)(params)

    g_sp, g_wd = loss(m_sp), loss(m_wd)
    flat_sp = jax.tree_util.tree_leaves(g_sp)
    flat_wd = jax.tree_util.tree_leaves(g_wd)
    for a, b in zip(flat_sp, flat_wd):
        # weight grads contract over the (permuted) token axis — reduction
        # order may differ, values must agree tightly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_swin_packed_attention_parity():
    """The packed-layout window attention (packed=True on the pallas path:
    q/k/v as lane slices of the qkv projection, shifted mask as a
    batch-periodic kernel bias) must reproduce the split-layout XLA path:
    same params, matching forward and grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_vqa_healthcare_tpu.models.swin import SwinConfig, SwinTransformer

    # embed 128 / 4 heads -> head_dim 32 (the real swin stage-1 shape);
    # res 8x8, window 4 -> 4 windows, block 1 shifted (periodic mask path)
    kw = dict(image_size=32, patch_size=4, embed_dim=128, depths=(2,),
              num_heads=(4,), window_size=4)
    m_ref = SwinTransformer(SwinConfig(attention_impl="xla", packed=False,
                                       **kw))
    m_pk = SwinTransformer(SwinConfig(attention_impl="pallas", packed=True,
                                      **kw))
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = m_ref.init(jax.random.key(1), img)
    out_ref = m_ref.apply(params, img)
    out_pk = m_pk.apply(params, img)
    np.testing.assert_allclose(np.asarray(out_pk), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)

    def grads(m):
        def f(p):
            return jnp.sum(m.apply(p, img) ** 2)
        return jax.grad(f)(params)

    for a, b in zip(jax.tree_util.tree_leaves(grads(m_pk)),
                    jax.tree_util.tree_leaves(grads(m_ref))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_drop_path_stochastic_depth():
    """Reference swin trains with stochastic depth (drop_path_rate=0.1
    SwinTransformer default, linspace decay over blocks —
    swin_transformer.py:437,468,299-300).  Deterministic mode must be
    unchanged; train mode zeroes residual branches per sample."""
    import jax
    from mm_vqa_healthcare_tpu.models.swin import (
        SwinConfig, SwinTransformer)

    cfg = SwinConfig(image_size=32, embed_dim=16, depths=(1, 1),
                     num_heads=(2, 2), window_size=4,
                     attention_impl="xla", drop_path_rate=0.5)
    model = SwinTransformer(cfg)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                      jnp.float32)
    params = model.init(jax.random.key(0), img)
    det = model.apply(params, img)
    det2 = model.apply(params, img, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    tr = model.apply(params, img, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})
    assert not np.allclose(np.asarray(det), np.asarray(tr))
    # linspace decay: block 0 of 2 has rate 0 -> with depths=(1,) and a
    # single block the first block never drops; with 2 blocks the second
    # carries the full rate.  Different rngs give different masks.
    tr2 = model.apply(params, img, deterministic=False,
                      rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(tr), np.asarray(tr2))


def test_drop_path_rate_zero_is_identity():
    import jax
    from mm_vqa_healthcare_tpu.models.swin import (
        SwinConfig, SwinTransformer)
    cfg = SwinConfig(image_size=32, embed_dim=16, depths=(1, 1),
                     num_heads=(2, 2), window_size=4,
                     attention_impl="xla", drop_path_rate=0.0)
    model = SwinTransformer(cfg)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                      jnp.float32)
    params = model.init(jax.random.key(0), img)
    det = model.apply(params, img)
    tr = model.apply(params, img, deterministic=False,
                     rngs={"dropout": jax.random.key(1)})
    np.testing.assert_array_equal(np.asarray(det), np.asarray(tr))


def test_swin_remat_grad_parity():
    """MMVQA_SWIN_REMAT wraps blocks in jax.checkpoint — gradients (with
    stochastic depth ACTIVE, so the dropout rng must thread through
    nn.remat identically) must be bitwise-equal to the unrematerialized
    tower for both policies."""
    import dataclasses
    import jax
    from mm_vqa_healthcare_tpu.models.swin import (
        SwinConfig, SwinTransformer)

    base = SwinConfig(image_size=32, embed_dim=16, depths=(1, 1),
                      num_heads=(2, 2), window_size=4,
                      attention_impl="xla", drop_path_rate=0.5)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                      jnp.float32)
    m0 = SwinTransformer(base)
    params = m0.init(jax.random.key(0), img)["params"]

    def loss(p, model):
        out = model.apply({"params": p}, img, deterministic=False,
                          rngs={"dropout": jax.random.key(3)})
        return jnp.sum(out ** 2)

    g0 = jax.grad(loss)(params, m0)
    for mode in ("dots", "block"):
        m1 = SwinTransformer(dataclasses.replace(base, remat=mode))
        g1 = jax.grad(loss)(params, m1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), g0, g1)
