"""Swin Transformer vision encoder (reference
m3ae/modules/vision_encoders/swin_transformer.py — the vendored timm model
behind the swin32_* presets).

TPU-first notes: window partitioning is pure reshape/transpose (layout
changes XLA fuses away), the cyclic shift is jnp.roll, and the shifted-
window attention mask is precomputed in numpy at trace time (static
shapes).  Returns the [B, L, C] feature sequence without a classifier head
(swin_transformer.py:410-527), as consumed by M3AE's average-pool branch
(m3ae_module.py:292-295).

Checkpoint mapping follows timm names (patch_embed.proj, layers.N.blocks.M
.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/fc2, downsample.reduction/norm,
norm) via checkpoint/convert.swin_rules.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.models.layers import Dense, LayerNorm, gelu_exact
from mm_vqa_healthcare_tpu.ops.attention import (
    _default_impl, dot_product_attention, dot_product_attention_packed)


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    image_size: int = 384
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    # Stochastic depth (timm DropPath): the reference swin ctors leave the
    # SwinTransformer default drop_path_rate=0.1 in place
    # (swin_transformer.py:437,468 — linspace decay 0 -> rate over all
    # blocks); drop_rate and attn_drop_rate stay 0 there, so DropPath is
    # the ONLY stochastic regularizer in reference swin training.
    drop_path_rate: float = 0.1
    attention_impl: str = "auto"
    # Window-resident layout (PERF.md swin profile: window partition /
    # reverse transposes were ~27% of device time).  Bitwise-identical
    # math; kept switchable for the parity test + as an escape hatch.
    windowed: bool = True
    # Packed-layout window attention (see WindowAttention.packed).
    packed: bool = True
    # Rematerialization policy for the backward pass ("none" | "dots" |
    # "block").  Motivation was the batch36 profile (XLA involuntarily
    # full-rematerializes the 302 MB 6-D windowed fusions at b32); the
    # batch40 A/B measured BOTH policies as losses (b32: dots 124.2 /
    # block 125.9 vs 151.5 none — XLA's selective spill-recovery beats
    # block-granularity recompute; PERF.md batch40), so "none" stays the
    # default and the knob remains for experimentation:
    #   "dots"  — save matmul outputs, recompute elementwise (LN/gelu/
    #             dropout masks): jax.checkpoint_policies.dots_saveable
    #   "block" — save only block inputs, recompute everything
    remat: str = "none"

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


SWIN_PRESETS = {
    "swin_base_patch4_window7_224_in22k": dict(
        image_size=224, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=7),
    "swin_base_patch4_window12_384_in22k": dict(
        image_size=384, embed_dim=128, depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32), window_size=12),
    "swin_large_patch4_window12_384_in22k": dict(
        image_size=384, embed_dim=192, depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 48), window_size=12),
    # Debug scale
    "swin_tiny_debug": dict(image_size=32, embed_dim=16, depths=(1, 1),
                            num_heads=(2, 2), window_size=4),
}


def swin_config(name: str, image_size: int,
                attention_impl: str = "auto") -> SwinConfig:
    if name not in SWIN_PRESETS:
        raise KeyError(f"Unknown swin model {name!r}")
    kw = dict(SWIN_PRESETS[name])
    kw["image_size"] = image_size
    windowed = os.environ.get("MMVQA_SWIN_WINDOWED", "1") == "1"
    packed = os.environ.get("MMVQA_SWIN_PACKED", "1") == "1"
    remat = os.environ.get("MMVQA_SWIN_REMAT", "none")
    return SwinConfig(attention_impl=attention_impl, windowed=windowed,
                      packed=packed, remat=remat, **kw)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """[B, H, W, C] -> [B*nW, ws*ws, C] (swin_transformer.py:87-99)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def windowed_roll(x: jax.Array, shift: int, outer_axis: int,
                  inner_axis: int) -> jax.Array:
    """Cyclic roll of the virtual flattened spatial axis (outer*ws + inner)
    by `shift` WITHOUT leaving the windowed layout.

    The swin cyclic shift (|shift| < window) only ever moves a token to the
    same window row/col or the adjacent one, so the roll decomposes into
    two contiguous slices + a one-step roll of the outer (window) axis +
    a concat — no 6-D transpose, no gather (so the VJP is slice/concat
    too, scatter-free).  Replaces roll→window_partition / window_reverse→
    roll around every shifted block (reference swin_transformer.py:87-99,
    222-238) when the tower runs window-resident.
    """
    ws = x.shape[inner_axis]
    assert 0 < abs(shift) < ws, (shift, ws)
    if shift < 0:
        s = -shift
        a = jax.lax.slice_in_dim(x, s, ws, axis=inner_axis)
        b = jnp.roll(jax.lax.slice_in_dim(x, 0, s, axis=inner_axis),
                     -1, axis=outer_axis)
        return jnp.concatenate([a, b], axis=inner_axis)
    a = jnp.roll(jax.lax.slice_in_dim(x, ws - shift, ws, axis=inner_axis),
                 1, axis=outer_axis)
    b = jax.lax.slice_in_dim(x, 0, ws - shift, axis=inner_axis)
    return jnp.concatenate([a, b], axis=inner_axis)


def relative_position_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] index into the (2ws-1)^2 bias table (timm exact)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def shift_attention_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """[nW, N, N] additive mask for shifted windows (timm exact)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    attention_impl: str = "auto"
    # Packed [B, S, H*D] attention layout (default ON): q/k/v stay in the
    # qkv-projection layout and the pallas kernel carves heads out of the
    # lane dim — this removes the [bnW,n,h,hd]<->[bnW,h,n,hd] relayout
    # copies that dominated the post-window-resident swin train profile
    # (.profiles/r3_swin_train_wd: [2048,144,4,32] n<->h permutations
    # around every attention custom-call, plus remat duplicates).
    packed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        bnw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        impl = self.attention_impl
        if impl == "auto":
            impl = _default_impl()
        if self.packed and impl == "pallas":
            return self._packed(x, mask, n, c, h)
        qkv = Dense(3 * c, name="qkv")(x)
        # slice the packed projection (torch in-proj order q|k|v) and
        # transpose each [bnw, n, h, hd] -> [bnw, h, n, hd] separately:
        # XLA folds the slice into the transpose-copy, vs the previous
        # single 5-D [bnw, n, 3, h, hd] transpose which materialized an
        # extra full-qkv layout copy (swin profile, PERF.md batch23)
        def _split(i):
            part = jax.lax.slice_in_dim(qkv, i * c, (i + 1) * c, axis=2)
            return part.reshape(bnw, n, h, hd).transpose(0, 2, 1, 3)
        q, k, v = _split(0), _split(1), _split(2)           # [bnw, h, n, hd]
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)[None]
        if mask is not None:
            # Shifted blocks: the per-window mask repeats with period nw
            # over the window-batch axis, so FOLD the window axis into the
            # head axis — the combined rel-pos + mask bias becomes
            # batch-independent [1, nw*h, n, n] and the attention kernel
            # streams it via its broadcast (size-1 batch dim) block spec.
            # The naive [bnw, h, n, n] fp32 broadcast-add materialized
            # 340 MB per stage-1 layer (b16) and was the #1 HBM sink of
            # the swin eval profile (PERF.md batch23); this form is
            # bitwise-identical math at batch/nw-times less traffic.
            nw = mask.shape[0]
            b = bnw // nw
            qf = q.reshape(b, nw * h, n, hd)
            kf = k.reshape(b, nw * h, n, hd)
            vf = v.reshape(b, nw * h, n, hd)
            bias = (bias + mask[:, None]).reshape(1, nw * h, n, n)
            out = dot_product_attention(qf, kf, vf, bias,
                                        impl=self.attention_impl)
            out = out.reshape(bnw, h, n, hd)
        else:
            out = dot_product_attention(q, k, v, bias,
                                        impl=self.attention_impl)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return Dense(c, name="proj")(out)

    def _packed(self, x: jax.Array, mask: Optional[jax.Array],
                n: int, c: int, h: int) -> jax.Array:
        """Packed-layout window attention: q/k/v are lane-contiguous slices
        of the qkv projection ([bnW, n, c] each — zero relayout ops), and
        the shifted-window mask rides the kernel's batch-PERIODIC bias spec
        ([nW, h, n, n] streams with period nW over the window-batch axis)
        instead of the head-axis fold the split layout needs.  Identical
        math to the split path (same per-head fp32 score pipeline);
        parity is regression-locked in test_swin.py."""
        qkv = Dense(3 * c, name="qkv")(x)          # [bnW, n, 3c]
        q = jax.lax.slice_in_dim(qkv, 0, c, axis=2)
        k = jax.lax.slice_in_dim(qkv, c, 2 * c, axis=2)
        v = jax.lax.slice_in_dim(qkv, 2 * c, 3 * c, axis=2)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)[None]
        if mask is not None:
            bias = bias + mask[:, None]            # [nW, h, n, n]
        out = dot_product_attention_packed(q, k, v, h, bias, impl="pallas")
        return Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    window_size: int
    shift_size: int
    mlp_ratio: float
    attention_impl: str = "auto"
    packed: bool = True
    drop_path: float = 0.0
    # When True the block consumes/produces the window-resident layout
    # [B, nWh, nWw, ws, ws, C]: non-shifted blocks need ZERO layout ops
    # (the window view is a free reshape), shifted blocks use two
    # windowed_rolls each way instead of roll+partition / reverse+roll.
    windowed: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        hh, ww = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(hh, ww) <= ws:
            ws, shift = min(hh, ww), 0
        if self.windowed:
            return self._windowed(x, ws, shift, hh, ww, deterministic)
        b, l, c = x.shape
        shortcut = x
        x = LayerNorm(name="norm1")(x).reshape(b, hh, ww, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attention_mask(hh, ww, ws, shift))
        else:
            mask = None
        windows = window_partition(x, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               self.attention_impl, packed=self.packed,
                               name="attn")(windows, mask)
        x = window_reverse(attn, ws, hh, ww)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + self._drop_path(x.reshape(b, l, c), deterministic)
        h = LayerNorm(name="norm2")(x)
        h = Dense(int(c * self.mlp_ratio), name="fc1")(h)
        h = gelu_exact(h)
        h = Dense(c, name="fc2")(h)
        return x + self._drop_path(h, deterministic)

    def _drop_path(self, x: jax.Array, deterministic: bool) -> jax.Array:
        """timm DropPath (stochastic depth): with prob `drop_path` zero the
        residual branch PER SAMPLE and rescale survivors by 1/keep
        (reference swin_transformer.py:299-300 wraps both residual adds).
        Batch is axis 0 in both layouts."""
        if deterministic or self.drop_path <= 0.0:
            return x
        keep = 1.0 - self.drop_path
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)

    def _windowed(self, x: jax.Array, ws: int, shift: int,
                  hh: int, ww: int, deterministic: bool = True) -> jax.Array:
        """Window-resident block: x is [B, nWh, nWw, ws, ws, C].  Every op
        is either layout-agnostic (LN / MLP / residual, last-axis only) or
        a free reshape to the [B*nW, n, C] window batch — bitwise-identical
        to the spatial-resident path (regression-locked in test_swin.py)."""
        b, nwh, nww, _, _, c = x.shape
        shortcut = x
        h = LayerNorm(name="norm1")(x)
        if shift > 0:
            h = windowed_roll(h, -shift, 1, 3)
            h = windowed_roll(h, -shift, 2, 4)
            mask = jnp.asarray(shift_attention_mask(hh, ww, ws, shift))
        else:
            mask = None
        windows = h.reshape(b * nwh * nww, ws * ws, c)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               self.attention_impl, packed=self.packed,
                               name="attn")(windows, mask)
        attn = attn.reshape(b, nwh, nww, ws, ws, c)
        if shift > 0:
            attn = windowed_roll(attn, shift, 1, 3)
            attn = windowed_roll(attn, shift, 2, 4)
        x = shortcut + self._drop_path(attn, deterministic)
        h = LayerNorm(name="norm2")(x)
        h = Dense(int(c * self.mlp_ratio), name="fc1")(h)
        h = gelu_exact(h)
        h = Dense(c, name="fc2")(h)
        return x + self._drop_path(h, deterministic)


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hh, ww = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, hh, ww, c)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1).reshape(b, l // 4, 4 * c)
        x = LayerNorm(name="norm")(x)
        return Dense(2 * c, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, img: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """NHWC image -> [B, L, num_features] sequence (no head)."""
        cfg = self.cfg
        # stochastic-depth decay rule: linspace 0 -> drop_path_rate over
        # all blocks (reference swin_transformer.py:468)
        total_blocks = sum(cfg.depths)
        dpr = [cfg.drop_path_rate * t / max(total_blocks - 1, 1)
               for t in range(total_blocks)]
        block_idx = 0
        p = cfg.patch_size
        b, hh, ww, _ = img.shape
        x = img.reshape(b, hh // p, p, ww // p, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (hh // p) * (ww // p), p * p * 3)
        kernel = self.param("patch_kernel", nn.initializers.normal(0.02),
                            (p * p * 3, cfg.embed_dim), jnp.float32)
        bias = self.param("patch_bias", nn.initializers.zeros,
                          (cfg.embed_dim,), jnp.float32)
        x = jnp.dot(x, kernel.astype(x.dtype)) + bias.astype(x.dtype)
        x = LayerNorm(name="patch_norm")(x)
        res = (hh // p, ww // p)
        dim = cfg.embed_dim
        for i, depth in enumerate(cfg.depths):
            rh, rw = res
            ws_eff = min(cfg.window_size, rh, rw)
            # Stage-resident windowed layout: pay ONE partition transpose
            # per stage instead of one partition + one reverse per block
            # (the swin profile's 27%-of-device-time layout traffic).
            windowed = cfg.windowed and rh % ws_eff == 0 and rw % ws_eff == 0
            if windowed:
                x = x.reshape(b, rh // ws_eff, ws_eff, rw // ws_eff,
                              ws_eff, dim).transpose(0, 1, 3, 2, 4, 5)
            if cfg.remat == "dots":
                block_cls = nn.remat(
                    SwinBlock, static_argnums=(2,),
                    policy=jax.checkpoint_policies.dots_saveable)
            elif cfg.remat == "block":
                block_cls = nn.remat(SwinBlock, static_argnums=(2,))
            else:
                block_cls = SwinBlock
            for j in range(depth):
                x = block_cls(
                    dim=dim, num_heads=cfg.num_heads[i],
                    input_resolution=res, window_size=cfg.window_size,
                    shift_size=0 if j % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    attention_impl=cfg.attention_impl,
                    windowed=windowed, packed=cfg.packed,
                    drop_path=dpr[block_idx],
                    name=f"layers_{i}_blocks_{j}")(x, deterministic)
                block_idx += 1
            if windowed:
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, rh * rw, dim)
            if i < len(cfg.depths) - 1:
                x = PatchMerging(res, name=f"layers_{i}_downsample")(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
        return LayerNorm(name="norm")(x)
