"""Attention-heatmap visualization (working TPU-native rebuild).

Reference: `m3ae_decoder.py:225-290` `visualize_attention_heatmap` — dead
code upstream (references an undefined `output`/`layer_idx`, indexes the
SELF-attention probs while its own comment documents the image->text
CROSS-attention shape `[B, H, 577, 32]`, and reduces over the wrong axis
so the reshape-to-patch-grid cannot succeed).  This module implements what
that helper *documents*: per-sample overlays of the fusion stack's
image->text cross-attention on the input images, one subplot per sample,
question text as the title.

Deviations from the reference (DEVIATIONS.md "attention heatmap"):
  * uses the CROSS-attention probs (`ret["attentions"]["image2text_attns"]
    [layer][1]`), the tensor the reference's comment describes;
  * reduces over heads AND text keys (weighted by the text validity mask)
    to get one scalar per image patch — the reference's `mean(dim=0)`
    reduces over patches, leaving a text-length vector that cannot form a
    patch grid;
  * grid size is ceil(sqrt(B)) instead of a hard-coded 4x4 (the reference
    crashes for B > 16);
  * images are min-max normalized for display (the reference imshows
    channel-normalized floats, which matplotlib clips).

matplotlib/seaborn are imported lazily so the module stays importable in
headless test environments; the array-only entry point
(`image2text_patch_saliency`) needs neither.
"""

from __future__ import annotations

import textwrap
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def image2text_patch_saliency(cross_probs: jax.Array,
                              text_masks: Optional[jax.Array] = None,
                              image_size: Optional[int] = None) -> np.ndarray:
    """[B, H, S_img, S_txt] image->text cross-attention probs -> per-pixel
    saliency [B, image_size, image_size] (or [B, g, g] patch grids when
    image_size is None).

    Head-averaged, text-key-averaged (masked mean over valid tokens when
    `text_masks` is given — the reference's all-token mean dilutes the map
    with pad-key mass), CLS-stripped when the image stream has one
    (S_img = g*g + 1; swin streams have no CLS and pass through), then
    bilinearly upsampled (reference F.interpolate mode="bilinear",
    m3ae_decoder.py:260-266).
    """
    probs = jnp.asarray(cross_probs, jnp.float32)
    if probs.ndim != 4:
        raise ValueError(f"expected [B,H,S_img,S_txt] probs, got {probs.shape}")
    per_patch = jnp.mean(probs, axis=1)  # [B, S_img, S_txt] head average
    if text_masks is not None:
        m = jnp.asarray(text_masks, jnp.float32)[:, None, :]
        per_patch = (per_patch * m).sum(-1) / jnp.maximum(m.sum(-1), 1.0)
    else:
        per_patch = per_patch.mean(-1)  # [B, S_img]
    s_img = per_patch.shape[1]
    g = int(round(s_img ** 0.5))
    if g * g != s_img:
        g = int(round((s_img - 1) ** 0.5))
        if g * g != s_img - 1:
            raise ValueError(f"S_img={s_img} is neither a square grid nor "
                             "CLS + square grid")
        per_patch = per_patch[:, 1:]  # strip image CLS (reference :251)
    grids = per_patch.reshape(-1, g, g)
    if image_size is None:
        return np.asarray(grids)
    up = jax.image.resize(grids, (grids.shape[0], image_size, image_size),
                          method="bilinear")
    return np.asarray(up)


def _display_image(img: np.ndarray) -> np.ndarray:
    """Channel-normalized NHWC float -> [0,1] for imshow (per-image min-max)."""
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)


def attention_heatmap_figure(images: np.ndarray,
                             cross_probs: jax.Array,
                             texts: Optional[Sequence[str]] = None,
                             text_masks: Optional[jax.Array] = None,
                             alpha: float = 0.5,
                             cmap: str = "viridis"):
    """Build the reference's 'heatmap overlay' figure from raw arrays.

    images: [B, H, W, C] (NHWC; NCHW is auto-detected and transposed).
    cross_probs: [B, heads, S_img, S_txt] last-fusion-layer image->text
      cross-attention (`ret["attentions"]["image2text_attns"][-1][1]`).
    Returns the matplotlib figure (the reference returns the `plt` module;
    returning the figure is the usable contract).
    """
    import matplotlib
    matplotlib.use("Agg")  # headless-safe; callers can savefig
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    if images.ndim != 4:
        raise ValueError(f"expected [B,H,W,C] images, got {images.shape}")
    if images.shape[1] in (1, 3) and images.shape[-1] not in (1, 3):
        images = np.transpose(images, (0, 2, 3, 1))  # NCHW -> NHWC
    b, h, w = images.shape[:3]
    saliency = image2text_patch_saliency(cross_probs, text_masks,
                                         image_size=h)
    cols = int(np.ceil(np.sqrt(b)))
    rows = int(np.ceil(b / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3.75 * cols, 3.75 * rows),
                             squeeze=False)
    flat = axes.flatten()
    for i in range(b):
        ax = flat[i]
        ax.imshow(_display_image(images[i]))
        ax.imshow(saliency[i], alpha=alpha, cmap=cmap,
                  extent=(0, w, h, 0))
        title = (texts[i] if texts is not None and i < len(texts)
                 else f"Image {i + 1}")  # reference fallback, :269
        ax.set_title("\n".join(textwrap.wrap(str(title), width=30)),
                     fontsize=10, pad=10)
        ax.axis("off")
    for ax in flat[b:]:
        ax.axis("off")
    fig.tight_layout()
    return fig


def visualize_attention_heatmap(model, variables, batch: Dict[str, object],
                                layer_idx: int = -1,
                                alpha: float = 0.5,
                                cmap: str = "viridis"):
    """End-to-end equivalent of the reference method: run `infer` with
    `output_attentions=True` and overlay the chosen fusion layer's
    image->text cross-attention on the batch images.

    `model`/`variables` are the flax M3AE module and its params (the
    reference is a bound torch method; flax modules are stateless so both
    are passed explicitly).  `batch` is a collated batch (raw question
    strings under "text" become subplot titles, as in the reference).
    """
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE
    ret = model.apply(variables, batch, deterministic=True,
                      output_attentions=True, method=M3AE.infer)
    _, cross = ret["attentions"]["image2text_attns"][layer_idx]
    return attention_heatmap_figure(
        np.asarray(ret["images"]), cross,
        texts=batch.get("text"),
        text_masks=ret.get("text_masks"),
        alpha=alpha, cmap=cmap)
