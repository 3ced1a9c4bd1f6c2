"""Task objectives as pure JAX functions (reference m3ae/modules/
objectives.py).

Each `compute_*` takes (model, params, batch, rngs, train) and returns
(loss, aux-dict of device metrics) — the functional twin of the reference's
compute_mlm/compute_mim/compute_itm/compute_vqa_m3ae.  All run fully inside
jit; string-space bookkeeping (label2ans decode, text metrics) happens on
host in the trainer.

Reference bugs intentionally FIXED here (SURVEY.md §1 broken-at-HEAD list):
  * compute_itm's undefined `test` variable (objectives.py:109) — phase
    handling is the caller's concern in this design.
  * label2ans.json is loaded once at startup, not per step
    (objectives.py:180-181).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.m3ae import M3AE


def _infer(model: M3AE, params, batch, rngs, train: bool, **kwargs):
    return model.apply(params, batch, deterministic=not train,
                       rngs=rngs, method=M3AE.infer, **kwargs)


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = -100) -> jax.Array:
    """F.cross_entropy(ignore_index=-100) over [N, C] logits."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(1, valid.sum())


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise-mean binary CE with logits (torch semantics)."""
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return jnp.mean(-(targets * log_p + (1.0 - targets) * log_not_p))


# ---------------------------------------------------------------------------
# VQA classifier (reference compute_vqa_m3ae, objectives.py:176-234)
# ---------------------------------------------------------------------------

def compute_vqa_m3ae(model: M3AE, params, batch, rngs=None,
                     train: bool = False) -> Tuple[jax.Array, Dict[str, Any]]:
    infer = _infer(model, params, batch, rngs, train)
    logits = model.apply(params, infer["multi_modal_cls_feats"],
                         method=M3AE.apply_vqa_head)
    targets = batch["vqa_targets"]            # dense [B, label_size]
    loss = bce_with_logits(logits, targets) * targets.shape[1]

    preds = jnp.argmax(logits, axis=1)
    # VQAScore: one_hot(argmax) . soft-target (my_metrics.py:57-77)
    sample_scores = jnp.take_along_axis(targets, preds[:, None], axis=1)[:, 0]
    types = batch["answer_types"]             # [B] 0=closed, 1=open
    valid = batch.get("sample_valid",
                      jnp.ones(preds.shape[0], jnp.float32))
    aux = {
        "vqa_logits": logits,
        "vqa_preds": preds,
        "vqa_loss_sum": loss * valid.sum(),   # Scalar metric is per-batch mean
        "vqa_score_sum": (sample_scores * valid).sum(),
        "vqa_close_score_sum": (sample_scores * (types == 0) * valid).sum(),
        "vqa_close_total": ((types == 0) * valid).sum(),
        "vqa_open_score_sum": (sample_scores * (types == 1) * valid).sum(),
        "vqa_open_total": ((types == 1) * valid).sum(),
        "vqa_total": valid.sum(),
    }
    return loss, aux


# ---------------------------------------------------------------------------
# MLM (reference compute_mlm, objectives.py:14-38)
# ---------------------------------------------------------------------------

def compute_mlm(model: M3AE, params, batch, rngs=None,
                train: bool = False) -> Tuple[jax.Array, Dict[str, Any]]:
    infer = _infer(model, params, batch, rngs, train, mask_text=True)
    logits = model.apply(params, infer["multi_modal_text_feats"],
                         method=M3AE.apply_mlm_head)
    labels = infer["text_labels"]
    loss = cross_entropy_ignore(
        logits.reshape(-1, logits.shape[-1]), labels.reshape(-1))
    preds = jnp.argmax(logits, axis=-1)
    valid = labels != -100
    aux = {
        "mlm_loss_sum": loss,
        "mlm_correct": ((preds == labels) & valid).sum(),
        "mlm_total": valid.sum(),
    }
    return loss, aux


# ---------------------------------------------------------------------------
# MIM (reference compute_mim, objectives.py:41-76)
# ---------------------------------------------------------------------------

def compute_mim(model: M3AE, params, batch, rngs=None,
                train: bool = False) -> Tuple[jax.Array, Dict[str, Any]]:
    cfg = model.cfg
    infer = _infer(model, params, batch, rngs, train, mask_image=True)
    if cfg.mim_layer == -1:
        feats = infer["multi_modal_image_feats"]
    else:
        feats = infer[f"multi_modal_image_feats_{cfg.mim_layer}"]
    logits = model.apply(params, feats, infer["mim_ids_restore"],
                         method=M3AE.apply_mim_head)
    target = infer["patched_images"].astype(jnp.float32)
    if cfg.norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / (var + 1.0e-6) ** 0.5
    mask = infer["mim_masks"].astype(jnp.float32)
    err = (logits.astype(jnp.float32) - target) ** 2
    err = err.mean(axis=-1)                        # [N, L] per-patch
    loss = (err * mask).sum() / mask.sum()
    aux = {"mim_loss_sum": loss}
    return loss, aux


# ---------------------------------------------------------------------------
# ITM (reference compute_itm, objectives.py:79-119; `test` NameError fixed)
# ---------------------------------------------------------------------------

def compute_itm(model: M3AE, params, batch, rngs=None,
                train: bool = False) -> Tuple[jax.Array, Dict[str, Any]]:
    rngs = dict(rngs or {})
    itm_rng = rngs.pop("itm")
    b = batch["image"].shape[0]
    pos_len = b // 2
    labels = jnp.concatenate([jnp.ones(pos_len, jnp.int32),
                              jnp.zeros(b - pos_len, jnp.int32)])
    labels = jax.random.permutation(itm_rng, labels)
    mixed = jnp.where(labels[:, None, None, None] == 1,
                      batch["image"], batch["false_image_0"])
    itm_batch = dict(batch)
    itm_batch["image"] = mixed
    infer = _infer(model, params, itm_batch, rngs, train)
    logits = model.apply(params, infer["multi_modal_cls_feats"],
                         method=M3AE.apply_itm_head)
    loss = cross_entropy_ignore(logits, labels)
    aux = {
        "itm_loss_sum": loss,
        "itm_correct": (jnp.argmax(logits, -1) == labels).sum(),
        "itm_total": jnp.asarray(b),
    }
    return loss, aux


# ---------------------------------------------------------------------------
# CLS (reference compute_cls, objectives.py:237-260)
# ---------------------------------------------------------------------------

def compute_cls(model: M3AE, params, batch, rngs=None,
                train: bool = False) -> Tuple[jax.Array, Dict[str, Any]]:
    infer = _infer(model, params, batch, rngs, train)
    logits = model.apply(params, infer["multi_modal_cls_feats"],
                         method=M3AE.apply_cls_head)
    labels = batch["cls_labels"]
    loss = cross_entropy_ignore(logits, labels)
    aux = {
        "cls_loss_sum": loss,
        "cls_correct": (jnp.argmax(logits, -1) == labels).sum(),
        "cls_total": jnp.asarray(labels.shape[0]),
    }
    return loss, aux


# ---------------------------------------------------------------------------
# IRTR (reference compute_irtr, objectives.py:263-300): rank the true
# caption against draw_false_text negatives per image.
# ---------------------------------------------------------------------------

def compute_irtr(model: M3AE, params, batch, rngs=None,
                 train: bool = False) -> Tuple[jax.Array, Dict[str, Any]]:
    false_len = sum(1 for k in batch if k.startswith("false_text_")
                    and k.endswith("_ids"))
    b = batch["text_ids"].shape[0]
    text_ids = jnp.stack(
        [batch["text_ids"]] + [batch[f"false_text_{i}_ids"]
                               for i in range(false_len)], axis=1)
    text_masks = jnp.stack(
        [batch["text_masks"]] + [batch[f"false_text_{i}_masks"]
                                 for i in range(false_len)], axis=1)
    n = false_len + 1
    images = jnp.repeat(batch["image"][:, None], n, axis=1)
    flat_batch = {
        "image": images.reshape((b * n,) + images.shape[2:]),
        "text_ids": text_ids.reshape(b * n, -1),
        "text_masks": text_masks.reshape(b * n, -1),
    }
    infer = _infer(model, params, flat_batch, rngs, train)
    score = model.apply(params, infer["multi_modal_cls_feats"],
                        method=M3AE.apply_irtr_head)[:, 0]
    score = score.reshape(b, n)
    answer = jnp.zeros(b, jnp.int32)   # true text is slot 0
    loss = cross_entropy_ignore(score, answer)
    aux = {"irtr_loss_sum": loss}
    return loss, aux


TASK_FNS = {
    "mlm": compute_mlm,
    "mim": compute_mim,
    "itm": compute_itm,
    "vqa": compute_vqa_m3ae,
    "cls": compute_cls,
    "irtr": compute_irtr,
}


def compute_total_loss(model: M3AE, params, batch, rngs, loss_names,
                       train: bool = True):
    """Weighted multi-task loss (reference training_step,
    m3ae_module.py:347-353: total = sum(v * loss_names[k]))."""
    total = 0.0
    aux_all: Dict[str, Any] = {}
    for task, weight in loss_names.items():
        if weight <= 0 or task not in TASK_FNS:
            continue
        loss, aux = TASK_FNS[task](model, params, batch, rngs, train)
        total = total + weight * loss
        aux_all.update(aux)
    return total, aux_all
