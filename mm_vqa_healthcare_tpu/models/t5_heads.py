"""T5 generative VQA heads over a frozen M3AE (reference
m3ae_t5_mm_encoder_input.py, m3ae_t5_combined_encoder_input.py, and the
missing-at-HEAD m3ae_t5_text_encoder_input.py reconstructed per SURVEY.md §1).

Variants (encoder soft-prompt assembly):
  mm        "question:" embeds ++ projected-CLS ++ [optional seq-projected
            image/text feats], zero-padded to 512, all-ones mask
            (m3ae_t5_mm_encoder_input.py:100-190).  NOTE the reference
            creates a FRESH random nn.Linear per sample per forward for the
            CLS/feature projections (:75-77,128) — untrained weights every
            step; reproduced here by sampling U(+-1/sqrt(fan_in)) weights
            from an rng each call (torch Linear default init distribution).
            With bug_compat=False the module's trained `feature_projection`
            is used instead (the layer the reference builds but never calls,
            :40-43) — the presumably intended behavior.
  combined  "context:" ++ proj CLS ++ mean-pooled proj image ++ mean-pooled
            proj text ++ "question:" ++ T5-tokenized question, padded to 512
            (m3ae_t5_combined_encoder_input.py:96-195).  Question ids are
            pre-tokenized host-side to a fixed slot (static shapes); the
            reference's mask is all-ones over the padded 512 either way.
  text      reconstruction of the missing T5VQA_TextEncoderInput:
            "question:" ++ projected multi-modal text features.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
from mm_vqa_healthcare_tpu.models.t5 import T5, T5Config, T5_PRESETS


@dataclasses.dataclass(frozen=True)
class T5HeadConfig:
    m3ae: M3AEConfig
    t5: T5Config
    variant: str = "mm"                  # mm | combined | text
    include_cls_feats: bool = True
    include_imagetext_feats: bool = False
    mm_feats_width: int = 0
    max_answer_length: int = 25
    max_seq_len: int = 512
    question_prefix_ids: Tuple[int, ...] = ()   # T5 ids of "question:"
    context_prefix_ids: Tuple[int, ...] = ()    # T5 ids of "context:"
    bug_compat: bool = True

    def __post_init__(self):
        if self.variant not in ("mm", "combined", "text"):
            raise ValueError(
                f"unknown T5 head variant {self.variant!r}; "
                "expected 'mm', 'combined', or 'text'")

    @classmethod
    def from_dict(cls, config: Dict[str, Any],
                  question_prefix_ids=(), context_prefix_ids=(),
                  t5_cfg: Optional[T5Config] = None,
                  variant: str = "mm") -> "T5HeadConfig":
        return cls(
            m3ae=M3AEConfig.from_dict(config),
            t5=t5_cfg or T5_PRESETS.get(config["t5_model_name"], T5Config()),
            variant=variant,
            include_cls_feats=config["mm_encoder_inputs_include_cls_feats"],
            include_imagetext_feats=config[
                "mm_encoder_inputs_include_imagetext_feats"],
            mm_feats_width=config["mm_encoder_inputs_mm_feats_width"],
            # reference pads the soft-prompt to a fixed 512 with an
            # all-ones mask (m3ae_t5_mm_encoder_input.py:173-178); the knob
            # exists for scaled-down runs (e.g. the overfit convergence
            # tests, where 509 unmasked zero-embedding positions dilute
            # the informative tokens to noise at tiny model scale)
            max_seq_len=config.get("t5_encoder_max_seq_len", 512),
            max_answer_length=config["t5_max_length"],
            question_prefix_ids=tuple(question_prefix_ids),
            context_prefix_ids=tuple(context_prefix_ids),
            bug_compat=config.get("bug_compat", True),
        )


def _torch_linear_sample(rng, out_features: int, in_features: int):
    """Weights/bias with torch nn.Linear's default init distribution
    (U(+-1/sqrt(fan_in)))."""
    bound = 1.0 / (in_features ** 0.5)
    wk, bk = jax.random.split(rng)
    w = jax.random.uniform(wk, (out_features, in_features),
                           minval=-bound, maxval=bound)
    b = jax.random.uniform(bk, (out_features,), minval=-bound, maxval=bound)
    return w, b


class T5VQAModel(nn.Module):
    cfg: T5HeadConfig

    def setup(self):
        self.m3ae = M3AE(self.cfg.m3ae)
        self.t5 = T5(self.cfg.t5)
        # built by the reference but never used in prepare_inputs (:40-43);
        # used when bug_compat=False
        self.feature_projection = nn.Dense(
            self.cfg.t5.d_model, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02))

    # ------------------------------------------------------------ soft prompt
    def _fresh_proj(self, rng, x: jax.Array, out_dim: int) -> jax.Array:
        """Per-sample fresh random projection (reference projection_layer).
        x: [B, F]; a DIFFERENT random layer per sample, like the per-i loop."""
        b, f = x.shape

        def one(i):
            w, bias = _torch_linear_sample(jax.random.fold_in(rng, i),
                                           out_dim, f)
            return w, bias
        ws, bs = jax.vmap(one)(jnp.arange(b))
        return jnp.einsum("bf,bof->bo", x, ws.astype(x.dtype)) \
            + bs.astype(x.dtype)

    def _fresh_seq_proj(self, rng, feats: jax.Array, width: int) -> jax.Array:
        """[B, S, 768] -> [B, width, 512]: seq-len projection then embed-dim
        projection, both fresh random per sample (mm variant :134-146).
        With bug_compat=False the caller passes a fixed rng AND the
        per-sample fold is disabled, so ONE stable random projection is
        shared by every sample on every forward (batch-slot folds would
        otherwise give a shuffled sample a different soft prompt each
        epoch)."""
        b, s, d = feats.shape
        d_model = self.cfg.t5.d_model
        per_sample = self.cfg.bug_compat

        def one(i):
            r = jax.random.fold_in(rng, 7919 + i)
            w1, b1 = _torch_linear_sample(jax.random.fold_in(r, 0), width, s)
            w2, b2 = _torch_linear_sample(jax.random.fold_in(r, 1),
                                          d_model, d)
            return w1, b1, w2, b2
        # feats[i].T [d, s] -> Linear(s, width) -> [d, width] -> .T [width, d]
        # (bias b1 is added per width row, broadcast over d)
        if per_sample:
            w1, b1, w2, b2 = jax.vmap(one)(jnp.arange(b))
            proj = jnp.einsum("bsd,bws->bwd", feats,
                              w1.astype(feats.dtype)) \
                + b1.astype(feats.dtype)[:, :, None]
            return jnp.einsum("bwd,bod->bwo", proj,
                              w2.astype(feats.dtype)) \
                + b2.astype(feats.dtype)[:, None, :]
        # repaired path: ONE shared projection sampled once (not B vmapped
        # copies of identical weights — same numerics, smaller graph)
        w1, b1, w2, b2 = one(0)
        proj = jnp.einsum("bsd,ws->bwd", feats, w1.astype(feats.dtype)) \
            + b1.astype(feats.dtype)[None, :, None]
        return jnp.einsum("bwd,od->bwo", proj, w2.astype(feats.dtype)) \
            + b2.astype(feats.dtype)[None, None, :]

    def prepare_inputs(self, batch: Dict[str, jax.Array],
                       rng: Optional[jax.Array] = None,
                       deterministic: bool = True):
        m3ae_out = self.m3ae.infer(batch, deterministic=deterministic)
        return self.prepare_inputs_from(m3ae_out, batch, rng, deterministic)

    def prepare_inputs_from(self, m3ae_out: Dict[str, jax.Array],
                            batch: Dict[str, jax.Array],
                            rng: Optional[jax.Array] = None,
                            deterministic: bool = True):
        """Soft-prompt assembly from precomputed M3AE features (split-phase
        serving: the M3AE towers run as their own jits — see
        M3AE.infer_text/infer_image/infer_fuse)."""
        cfg = self.cfg
        m3ae_out = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            {k: v for k, v in m3ae_out.items()
             if k.startswith("multi_modal")})
        if rng is None:
            rng = jax.random.key(0)
        b = batch["text_ids"].shape[0]
        d_model = cfg.t5.d_model
        parts = []

        def prefix_embeds(ids):
            tok = jnp.asarray(ids, jnp.int32)[None].repeat(b, axis=0)
            return self.t5.embed_tokens(tok)

        if cfg.variant == "combined":
            parts.append(prefix_embeds(cfg.context_prefix_ids))
            cls = m3ae_out["multi_modal_cls_feats"]
            parts.append(self._project_cls(rng, cls)[:, None, :])
            avg_img = jnp.mean(m3ae_out["multi_modal_image_feats"], axis=1)
            parts.append(self._project_feat(rng, avg_img, 1)[:, None, :])
            avg_txt = jnp.mean(m3ae_out["multi_modal_text_feats"], axis=1)
            parts.append(self._project_feat(rng, avg_txt, 2)[:, None, :])
            parts.append(prefix_embeds(cfg.question_prefix_ids))
            parts.append(self.t5.embed_tokens(batch["t5_question_ids"]))
        # The sequence-feature projections replay the reference's
        # fresh-random-per-forward quirk (m3ae_t5_mm_encoder_input.py
        # :134-146).  With bug_compat=False the projections are still
        # random (no reference weights exist for them) but drawn from a
        # FIXED key, so the same features map to the same soft prompt on
        # every forward — without this the encoder inputs are
        # re-randomized noise each step and nothing downstream can learn
        # from them (the round-4 T5 overfit diagnosis).
        seq_rng = rng if cfg.bug_compat else jax.random.key(0)
        if cfg.variant == "text":
            parts.append(prefix_embeds(cfg.question_prefix_ids))
            width = cfg.mm_feats_width or batch["text_ids"].shape[1]
            parts.append(self._fresh_seq_proj(
                seq_rng, m3ae_out["multi_modal_text_feats"], width))
        elif cfg.variant == "mm":
            parts.append(prefix_embeds(cfg.question_prefix_ids))
            if cfg.include_cls_feats:
                cls = m3ae_out["multi_modal_cls_feats"]
                parts.append(self._project_cls(rng, cls)[:, None, :])
            if cfg.include_imagetext_feats:
                half = cfg.mm_feats_width // 2
                parts.append(self._fresh_seq_proj(
                    seq_rng, m3ae_out["multi_modal_image_feats"], half))
                parts.append(self._fresh_seq_proj(
                    jax.random.fold_in(seq_rng, 13),
                    m3ae_out["multi_modal_text_feats"], half))

        embeds = jnp.concatenate(parts, axis=1)
        seq_len = embeds.shape[1]
        max_len = cfg.max_seq_len
        if seq_len < max_len:
            embeds = jnp.pad(embeds, ((0, 0), (0, max_len - seq_len), (0, 0)))
        else:
            embeds = embeds[:, :max_len]
        # reference masks NOTHING: all-ones over the padded 512 (:173-178).
        # An all-ones mask is exactly a zero additive bias, so return None —
        # the encoder self-attention then streams only the shared [1,H,S,S]
        # relative-position bias through the fused kernel instead of
        # materializing a per-sample [B,H,S,S] combined bias.
        return embeds, None

    def _project_cls(self, rng, cls):
        if self.cfg.bug_compat:
            return self._fresh_proj(rng, cls, self.cfg.t5.d_model)
        return self.feature_projection(cls)

    def _project_feat(self, rng, feat, salt):
        if self.cfg.bug_compat:
            return self._fresh_proj(jax.random.fold_in(rng, salt), feat,
                                    self.cfg.t5.d_model)
        return self.feature_projection(
            jnp.pad(feat, ((0, 0), (0, max(0, self.cfg.m3ae.hidden_size * 2
                                           - feat.shape[-1])))))

    # ------------------------------------------------------------------ paths
    def encode(self, batch, rng=None, deterministic=True):
        embeds, mask = self.prepare_inputs(batch, rng, deterministic)
        enc = self.t5.encode(inputs_embeds=embeds, attention_mask=mask,
                             deterministic=deterministic)
        return enc, mask

    def encode_from(self, m3ae_out, batch, rng=None, deterministic=True):
        """`encode` from precomputed M3AE features (split-phase serving)."""
        embeds, mask = self.prepare_inputs_from(m3ae_out, batch, rng,
                                                deterministic)
        enc = self.t5.encode(inputs_embeds=embeds, attention_mask=mask,
                             deterministic=deterministic)
        return enc, mask

    def __call__(self, batch, labels, rng=None, deterministic=True):
        """Training forward -> logits over the label positions
        (loss computed by the trainer; HF counts pad positions because the
        reference never masks them — m3ae_t5_mm_encoder_input.py:234-248)."""
        enc, mask = self.encode(batch, rng, deterministic)
        cfg = self.cfg.t5
        start = jnp.full((labels.shape[0], 1), cfg.decoder_start_token_id,
                         labels.dtype)
        dec_in = jnp.concatenate([start, labels[:, :-1]], axis=1)
        logits = self.t5.decode(dec_in, enc, mask,
                                deterministic=deterministic)
        return logits
