"""Bicubic interpolation matching torch.nn.functional.interpolate exactly.

The reference re-interpolates CLIP ViT position embeddings with
``F.interpolate(mode='bicubic')`` when the fine-tune/eval resolution differs
from the checkpoint's (reference clip_model.py:224-251).  torch's bicubic
uses the cubic-convolution kernel with a = -0.75 and half-pixel centers
(align_corners=False); ``jax.image.resize`` uses a = -0.5 (Keys), which is
NOT bit-compatible — so the kernel is implemented here in numpy and verified
against torch in tests/test_checkpoint.py.
"""

from __future__ import annotations

import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return out


def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] row-stochastic bicubic weight matrix
    (half-pixel centers, border-clamped taps — torch semantics)."""
    scale = in_size / out_size
    out_coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(out_coords).astype(np.int64)
    frac = out_coords - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - frac)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat


def bicubic_resize_2d(grid: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize [H, W, C] -> [out_h, out_w, C] with torch-bicubic weights."""
    h, w, c = grid.shape
    wh = _resize_matrix(h, out_h)
    ww = _resize_matrix(w, out_w)
    out = np.einsum("oh,hwc->owc", wh, grid.astype(np.float64))
    out = np.einsum("pw,owc->opc", ww, out)
    return out.astype(grid.dtype)


def adapt_clip_position_embedding(pos_embed: np.ndarray, patch_size: int,
                                  after: int) -> np.ndarray:
    """Reference adapt_position_encoding (clip_model.py:224-251): bicubic
    re-interp of the [(grid^2+1), D] ViT table (cls row passthrough)."""
    seq_len, dim = pos_embed.shape
    grid_before = int(round((seq_len - 1) ** 0.5))
    grid_after = after // patch_size
    assert after % patch_size == 0
    if grid_after == grid_before:
        return pos_embed
    grid = pos_embed[1:].reshape(grid_before, grid_before, dim)
    resized = bicubic_resize_2d(grid, grid_after, grid_after)
    resized = resized.reshape(grid_after * grid_after, dim)
    out = np.concatenate([pos_embed[:1], resized], axis=0)
    assert out.shape == (grid_after * grid_after + 1, dim)
    return out
