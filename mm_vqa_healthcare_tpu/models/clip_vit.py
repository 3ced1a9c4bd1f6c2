"""CLIP ViT vision encoder (TPU-native re-design of the reference's vendored
OpenAI CLIP visual tower, reference m3ae/modules/vision_encoders/clip_model.py).

Intentionally preserved reference quirks (for checkpoint parity):
  * ``Transformer`` builds ``layers - 1`` residual blocks
    (clip_model.py:71) — a ViT-B/16 checkpoint with 12 layers runs as an
    11-block tower; block 11's weights are dropped on load, exactly like the
    reference's filtered load_state_dict (clip_model.py:303-312).
  * LayerNorm in float32 (clip_model.py:27-33), QuickGELU activation.

TPU-first changes (math-identical):
  * the stride=kernel patch-embed conv is a reshape + one big matmul
    (space-to-depth), which maps directly onto the MXU instead of relying on
    conv lowering; patch pixels are flattened in (row, col, channel) order —
    the same order as the reference's MIM ``patchify`` (m3ae_module.py:185-192).
  * images are NHWC.
  * attention runs through the fused Pallas kernel.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.layers import (
    Dense, LayerNorm, MultiHeadAttention, quick_gelu)


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    width: int = 768
    layers: int = 12          # checkpoint layer count; (layers-1) blocks run
    heads: int = 12
    patch_size: int = 16
    resolution: int = 224     # resolution_after: sets pos-embed grid size
    attention_impl: str = "auto"

    @property
    def grid(self) -> int:
        return self.resolution // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


# Architectures of the OpenAI checkpoints the reference downloads
# (clip_model.py:14-24, inferred from state_dict in build_model:277-291).
CLIP_VIT_PRESETS = {
    "ViT-B/32": dict(width=768, layers=12, heads=12, patch_size=32),
    "ViT-B/16": dict(width=768, layers=12, heads=12, patch_size=16),
    "ViT-L/14": dict(width=1024, layers=24, heads=16, patch_size=14),
    "ViT-L/14@336px": dict(width=1024, layers=24, heads=16, patch_size=14),
    # Debug-scale tower for tests / multichip dry-runs (not in reference).
    "ViT-Tiny/16": dict(width=64, layers=3, heads=2, patch_size=16),
}


def clip_vit_config(vit_name: str, resolution: int,
                    attention_impl: str = "auto") -> CLIPViTConfig:
    if vit_name not in CLIP_VIT_PRESETS:
        raise KeyError(f"Unknown CLIP ViT {vit_name!r}; known: {sorted(CLIP_VIT_PRESETS)}")
    return CLIPViTConfig(resolution=resolution, attention_impl=attention_impl,
                         **CLIP_VIT_PRESETS[vit_name])


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block: x += attn(ln_1(x)); x += c_proj(qgelu(c_fc(ln_2(x))))."""
    heads: int
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = LayerNorm(eps=1e-5, name="ln_1")(x)
        x = x + MultiHeadAttention(self.heads, self.attention_impl,
                                   name="attn")(h, h, h)
        h = LayerNorm(eps=1e-5, name="ln_2")(x)
        h = Dense(d * 4, name="c_fc")(h)
        h = quick_gelu(h)
        h = Dense(d, name="c_proj")(h)
        return x + h


class CLIPTransformer(nn.Module):
    """Stack of residual blocks.  NOTE: builds ``layers - 1`` blocks to
    replicate reference clip_model.py:71 (see module docstring)."""
    layers: int
    heads: int
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.layers - 1):
            x = ResidualAttentionBlock(self.heads, self.attention_impl,
                                       name=f"resblocks_{i}")(x)
        return x


def patchify_image(img: jax.Array, patch_size: int) -> jax.Array:
    """NHWC image -> [B, grid*grid, p*p*3], per-patch (row, col, channel)
    pixel order — identical flattening to reference patchify
    (m3ae_module.py:185-192, einsum nchpwq->nhwpqc)."""
    b, h, w, c = img.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = img.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B, gh, gw, p, p, c]
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify_image(x: jax.Array, patch_size: int) -> jax.Array:
    """Inverse of patchify_image: [B, L, p*p*3] -> NHWC."""
    b, l, _ = x.shape
    p = patch_size
    g = int(l ** 0.5)
    x = x.reshape(b, g, g, p, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * p, g * p, 3)


class VisualTransformer(nn.Module):
    """CLIP visual tower with the split-phase forward used for MIM
    (clip_model.py:79-128)."""
    cfg: CLIPViTConfig

    def setup(self):
        cfg = self.cfg
        # conv1 as a patch matmul: kernel [p*p*3, width] (converted from the
        # torch conv weight [width, 3, p, p] by the checkpoint loader).
        self.patch_kernel = self.param(
            "patch_kernel", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.patch_size * cfg.patch_size * 3, cfg.width), jnp.float32)
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width,), jnp.float32)
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.seq_len, cfg.width), jnp.float32)
        self.ln_pre = LayerNorm(eps=1e-5)
        self.transformer = CLIPTransformer(cfg.layers, cfg.heads,
                                           cfg.attention_impl)
        self.ln_post = LayerNorm(eps=1e-5)

    def patch_embed(self, img: jax.Array) -> jax.Array:
        """NHWC image -> [B, 1+L, width] tokens (cls prepended, no pos yet)."""
        dtype = img.dtype
        patches = patchify_image(img, self.cfg.patch_size)
        x = jnp.dot(patches, self.patch_kernel.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        cls = jnp.broadcast_to(self.class_embedding.astype(dtype),
                               (x.shape[0], 1, x.shape[-1]))
        return jnp.concatenate([cls, x], axis=1)

    def trans(self, x: jax.Array) -> jax.Array:
        """ln_pre -> blocks -> ln_post (pos-embed added by caller when the
        MIM masking path is active, mirroring forward_trans)."""
        x = self.ln_pre(x)
        x = self.transformer(x)
        return self.ln_post(x)

    def __call__(self, img: jax.Array) -> jax.Array:
        x = self.patch_embed(img)
        x = x + self.positional_embedding.astype(x.dtype)
        return self.trans(x)
