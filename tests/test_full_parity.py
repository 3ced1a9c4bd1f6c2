"""FULL-MODEL numerical parity vs the reference M3AETransformerSS.

The reference's shipped 77.4-accuracy checkpoint is not present in this
environment, so parity is proven structurally: instantiate the *actual
reference torch module* (m3ae_module.py:16-345) with random weights on CPU,
export its state_dict through checkpoint/convert.py, and diff the whole
pipeline end to end at fp32 — text tower + vision tower + 6x2 co-attention
fusion + poolers + vqa_head logits (reference infer: m3ae_module.py:203-312,
vqa_head: :120-126).  Any numerics regression anywhere in the stack fails
this test.  If the real checkpoint appears, the same converter path powers
run_scripts/test_m3ae.sh directly.
"""

import os
import tempfile

import numpy as np
import pytest

from tests.oracle_utils import reference_full_model

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")


IMG = 224          # == CLIP native resolution (no pos-embed interpolation;
                   # the 384 bicubic re-interp path has its own oracle test
                   # in test_checkpoint.py)
TEXT_LEN = 32
BATCH = 2


def _compose_cfg():
    from mm_vqa_healthcare_tpu.config import compose
    return compose(["task_finetune_vqa_vqa_rad", "clip16"],
                   {"image_size": IMG, "max_text_len": TEXT_LEN,
                    "test_only": False, "load_path": "",
                    "per_gpu_batchsize": BATCH, "batch_size": BATCH,
                    "compute_dtype": "float32", "attention_impl": "xla"})


@pytest.fixture(scope="module")
def ref_and_mine():
    cfg = _compose_cfg()
    mm, ref = reference_full_model(dict(cfg))
    if ref is None:
        pytest.skip("reference M3AETransformerSS unavailable")

    from mm_vqa_healthcare_tpu.checkpoint.convert import (
        load_reference_checkpoint)
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    import jax

    model_cfg = M3AEConfig.from_dict(cfg)
    model = M3AE(model_cfg)
    batch = {
        "text_ids": jnp.ones((1, TEXT_LEN), jnp.int32),
        "text_masks": jnp.ones((1, TEXT_LEN), jnp.int32),
        "image": jnp.zeros((1, IMG, IMG, 3), jnp.float32),
    }
    params = model.init({"params": jax.random.key(0),
                         "mim": jax.random.key(1)}, batch)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ref.ckpt")
        torch.save({"state_dict": ref.state_dict()}, path)
        params, loaded, missing = load_reference_checkpoint(
            path, model_cfg, params)
    # every model tensor must come from the reference (heads included)
    assert len(missing) == 0, f"unconverted params: {missing[:10]}"
    return ref, model, params


def _make_batch(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(BATCH, 3, IMG, IMG)).astype(np.float32)
    ids = rng.integers(1000, 5000, (BATCH, TEXT_LEN)).astype(np.int64)
    ids[:, 0] = 101
    masks = np.ones((BATCH, TEXT_LEN), np.int64)
    masks[1, TEXT_LEN - 6:] = 0          # ragged padding on sample 2
    ids[1, TEXT_LEN - 6:] = 0
    return img, ids, masks


def _run_ref(ref, img, ids, masks):
    with torch.no_grad():
        batch = {
            "image": [torch.from_numpy(img)],
            "text_ids": torch.from_numpy(ids),
            "text_labels": torch.full(ids.shape, -100),
            "text_masks": torch.from_numpy(masks),
        }
        out = ref.infer(batch)
        logits = ref.vqa_head(out["multi_modal_cls_feats"])
    return (out["multi_modal_cls_feats"].numpy(),
            out["multi_modal_text_feats"].numpy(),
            out["multi_modal_image_feats"].numpy(),
            logits.numpy())


def _run_mine(model, params, img, ids, masks):
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE
    batch = {
        "image": jnp.asarray(np.transpose(img, (0, 2, 3, 1))),  # NCHW->NHWC
        "text_ids": jnp.asarray(ids.astype(np.int32)),
        "text_masks": jnp.asarray(masks.astype(np.int32)),
    }
    out = model.apply(params, batch, method=M3AE.infer)
    logits = model.apply(params, out["multi_modal_cls_feats"],
                         method=M3AE.apply_vqa_head)
    return (np.asarray(out["multi_modal_cls_feats"]),
            np.asarray(out["multi_modal_text_feats"]),
            np.asarray(out["multi_modal_image_feats"]),
            np.asarray(logits))


def test_full_model_logits_parity(ref_and_mine):
    ref, model, params = ref_and_mine
    img, ids, masks = _make_batch(0)
    r_cls, r_txt, r_img, r_logits = _run_ref(ref, img, ids, masks)
    m_cls, m_txt, m_img, m_logits = _run_mine(model, params, img, ids, masks)

    assert np.max(np.abs(m_txt - r_txt)) < 1e-4, "fused text feats diverge"
    assert np.max(np.abs(m_img - r_img)) < 1e-4, "fused image feats diverge"
    assert np.max(np.abs(m_cls - r_cls)) < 1e-4, "cls feats diverge"
    diff = np.max(np.abs(m_logits - r_logits))
    assert diff < 1e-4, f"vqa logits diverge: max abs {diff}"
    # predictions identical
    assert np.array_equal(np.argmax(m_logits, -1), np.argmax(r_logits, -1))


def test_full_model_parity_second_batch(ref_and_mine):
    """Different data (fresh seed) — guards against coincidental agreement."""
    ref, model, params = ref_and_mine
    img, ids, masks = _make_batch(123)
    r_out = _run_ref(ref, img, ids, masks)
    m_out = _run_mine(model, params, img, ids, masks)
    assert np.max(np.abs(m_out[3] - r_out[3])) < 1e-4


def test_full_model_parity_384_pos_embed_interp(ref_and_mine):
    """End-to-end parity AT 384 with the bicubic pos-embed re-interpolation
    inside the load path (VERDICT r2 item 6): a 224-grid checkpoint is
    loaded into BOTH stacks at image_size=384 — the reference through its
    own adapt_position_encoding (m3ae_module.py:104-142,
    clip_model.py:224-251), ours through checkpoint/convert.py — and the
    full fused logits must still agree.  This exercises the exact path the
    shipped 77.4 ckpt (saved at 576, evaluated at 384 by test_m3ae.sh)
    would take."""
    ref224, _, _ = ref_and_mine
    from tests.oracle_utils import reference_full_model
    from mm_vqa_healthcare_tpu.checkpoint.convert import (
        load_reference_checkpoint)
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
    import jax

    img_size = 384
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ref224.ckpt")
        torch.save({"state_dict": ref224.state_dict()}, path)

        cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"],
                      {"image_size": img_size, "max_text_len": TEXT_LEN,
                       "test_only": False, "load_path": path,
                       "per_gpu_batchsize": BATCH, "batch_size": BATCH,
                       "compute_dtype": "float32",
                       "attention_impl": "xla"})
        _, ref384 = reference_full_model(dict(cfg))
        if ref384 is None:
            pytest.skip("reference M3AETransformerSS unavailable")

        model_cfg = M3AEConfig.from_dict(cfg)
        model = M3AE(model_cfg)
        init_batch = {
            "text_ids": jnp.ones((1, TEXT_LEN), jnp.int32),
            "text_masks": jnp.ones((1, TEXT_LEN), jnp.int32),
            "image": jnp.zeros((1, img_size, img_size, 3), jnp.float32),
        }
        params = model.init({"params": jax.random.key(0),
                             "mim": jax.random.key(1)}, init_batch)
        params, _, missing = load_reference_checkpoint(path, model_cfg,
                                                       params)
        assert len(missing) == 0, f"unconverted params: {missing[:10]}"

    rng = np.random.default_rng(7)
    img = rng.normal(size=(BATCH, 3, img_size, img_size)).astype(np.float32)
    ids = rng.integers(1000, 5000, (BATCH, TEXT_LEN)).astype(np.int64)
    ids[:, 0] = 101
    masks = np.ones((BATCH, TEXT_LEN), np.int64)
    masks[1, TEXT_LEN - 6:] = 0
    ids[1, TEXT_LEN - 6:] = 0

    r_cls, _, _, r_logits = _run_ref(ref384, img, ids, masks)
    m_cls, _, _, m_logits = _run_mine(model, params, img, ids, masks)
    assert np.max(np.abs(m_cls - r_cls)) < 1e-4, "cls feats diverge @384"
    diff = np.max(np.abs(m_logits - r_logits))
    assert diff < 1e-4, f"vqa logits diverge @384: max abs {diff}"
    assert np.array_equal(np.argmax(m_logits, -1), np.argmax(r_logits, -1))
