"""Configuration system for the TPU-native MM-VQA-Healthcare framework.

This is a dependency-free re-implementation of the reference's sacred-based
config (reference: m3ae/config.py:18-283).  It preserves:

  * every config key and default value of the reference base config,
  * the named-config presets (tasks, vision/text encoders, augmentations),
  * the CLI composition grammar ``python main.py with cfgA cfgB key=value``
    where later items override earlier ones (reference run_scripts/*.sh),

so the reference launch scripts keep working verbatim.

Differences from the reference (intentional):
  * the hard-coded W&B API key (reference m3ae/config.py:119) is NOT
    replicated; use the WANDB_API_KEY environment variable.
  * TPU-specific keys are added under their own section at the bottom of the
    base config (mesh shape, dtype policy, kernel selection...).  They all
    have defaults that reproduce reference behavior.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, List, Sequence


def loss_names(d: Dict[str, int]) -> Dict[str, int]:
    """Full per-task loss-weight dict (reference m3ae/config.py:5-15)."""
    ret = {"mlm": 0, "mim": 0, "itm": 0, "vqa": 0, "cls": 0, "irtr": 0}
    ret.update(d)
    return ret


def base_config() -> Dict[str, Any]:
    """Base config, mirroring reference m3ae/config.py:18-119 key-for-key."""
    return dict(
        exp_name="meter",
        seed=0,
        datasets=["medicat", "roco"],
        loss_names=loss_names({"itm": 1, "mlm": 1}),
        batch_size=4096,  # desired global batch size; grad-accum computed from per_gpu_batchsize

        # Image setting
        train_transform_keys=["clip"],
        val_transform_keys=["clip"],
        image_size=224,
        patch_size=32,
        draw_false_image=1,
        image_only=False,

        # Text setting
        vqa_label_size=3129,
        mlc_label_size=14,
        max_text_len=40,
        tokenizer="bert-base-uncased",
        vocab_size=30522,
        whole_word_masking=True,
        mlm_prob=0.15,
        draw_false_text=0,

        # Transformer setting
        num_top_layer=6,
        input_image_embed_size=768,
        input_text_embed_size=768,
        vit="ViT-B/32",
        hidden_size=768,
        num_heads=12,
        num_layers=6,
        mlp_ratio=4,
        drop_rate=0.1,

        # MIM decoder setting
        mim_prob=0.75,
        mim_decoder_hidden_size=384,
        mim_decoder_num_layers=4,
        mim_decoder_num_heads=6,
        norm_pix_loss=True,
        mim_layer=-1,

        # Optimizer setting
        optim_type="adamw",
        learning_rate=1e-5,
        weight_decay=0.01,
        decay_power=1,
        max_epoch=100,
        max_steps=-1,
        warmup_steps=10000,
        end_lr=0,
        lr_multiplier_head=5,
        lr_multiplier_multi_modal=5,

        # Encoder setting (decoder/T5 head input wiring)
        mm_encoder_inputs_include_cls_feats=True,
        mm_encoder_inputs_include_imagetext_feats=False,
        mm_encoder_inputs_mm_feats_width=0,
        # fixed soft-prompt length the T5 encoder input is padded to
        # (reference hardcodes 512 with an all-ones mask,
        # m3ae_t5_mm_encoder_input.py:173-178)
        t5_encoder_max_seq_len=512,

        # T5 model setting
        t5_model_name="t5-small",
        t5_max_length=25,
        t5_generation=True,

        # Unfreeze layer number setting
        unfreeze_num_encoder_layers=2,
        unfreeze_num_decoder_layers=2,

        # Downstream setting
        get_recall_metric=False,

        # Trainer setting
        resume_from=None,
        fast_dev_run=False,
        val_check_interval=1.0,
        # PL Trainer default the reference never overrides; here it lets
        # calibrated overfit runs (2-step "epochs") validate every N epochs
        check_val_every_n_epoch=1,
        test_only=False,
        default_root_dir="checkpoints",

        # Environment-dependent
        data_root="",
        log_dir="result",
        per_gpu_batchsize=0,  # per-device batch size (name kept for CLI parity)
        use_ddp=False,
        num_gpus=1,   # on TPU: number of devices in the data-parallel mesh axis
        num_nodes=1,
        load_path="",
        decoder_load_path="",
        load_path_t5="",
        # Cold-start bootstrap (reference always builds towers from
        # pretrained weights): fetch/convert public CLIP/Swin weights into
        # the vision tower when no load_path is given.  Paths override the
        # network fetch (air-gapped hosts pre-seed the cache or point
        # these at local files).
        bootstrap_towers=False,
        vision_pretrained_path="",
        text_pretrained_path="",
        num_workers=8,
        precision=32,
        gpu_device_number=0,

        # MELINDA setting (kept for config parity; unused at reference HEAD)
        label_column_name="",
        melinda_label_size={"i_meth": 85, "p_meth": 45, "i_meth_label": 15, "p_meth_label": 7},

        # W&B setting (api key via env WANDB_API_KEY, never in config)
        project_name="VQA-RAD-T5",

        # ---- TPU-native additions (not in reference) ----
        # Path to tokenizer files (vocab.txt / merges) if the HF hub cache is
        # unavailable; empty = resolve `tokenizer` via transformers.
        tokenizer_path="",
        # T5 offline assets: sentencepiece tokenizer dir + pretrained torch
        # state_dict (zero-egress equivalents of from_pretrained('t5-small')).
        t5_tokenizer_path="",
        t5_pretrained_path="",
        # Compute dtype inside the jitted step: "auto" | "float32" |
        # "bfloat16".  "auto" honors the reference's `precision` key
        # (pl.Trainer(precision=16) = AMP fp16, main.py:63 via config.py
        # precision=16 in every finetune/pretrain task): precision 16 ->
        # bfloat16 on TPU (the TPU-native mixed-precision dtype), float32
        # everywhere else (the CPU lanes are fp32 parity/golden lanes —
        # CPU has no native bf16 compute).  Explicit values pass through.
        compute_dtype="auto",
        # Attention implementation: "auto" (pallas on TPU, xla elsewhere),
        # "pallas", or "xla".
        attention_impl="auto",
        # Mesh axis sizes; data axis defaults to all devices.
        mesh_shape=None,  # e.g. {"data": 8} or {"data": 4, "model": 2}
        fsdp=False,  # ZeRO-3-style param/opt-state storage sharding over
                     # the data axis (beyond the reference's DDP; exact)
        fsdp_min_elems=None,  # replicate leaves smaller than this
                              # (default 2**14; 0 shards everything)
        # Reproduce reference quirks bit-for-bit (decoder layer rewiring,
        # double positional-embedding add, BLEU self-reference).  True =
        # match reference outputs token-for-token (the parity north star).
        bug_compat=True,
        # Run host-side PIL transforms (bicubic parity) vs fused device-side
        # resize+normalize inside the jitted step (faster, default on TPU).
        device_transforms=True,
        # Run the PIL bicubic resize+crop ON DEVICE (ops/device_resize.py):
        # the host ships cached decoded uint8 frames (padded to
        # device_resize_cap) + a per-sample resample spec, and the jitted
        # step does PIL-parity antialiased-bicubic geometry as MXU matmuls.
        # Removes the dominant host cost (~12 ms/sample) from the input
        # pipeline; off by default (parity runs use the host PIL path —
        # device parity is within 1/255 per pixel, tests/test_device_resize).
        device_resize=False,
        # Frames larger than this are PIL-downscaled once (long edge -> cap)
        # at decode time; also the static padded frame size shipped to
        # the device.
        device_resize_cap=512,
        # Remat (activation checkpointing) policy: "none" | "full".
        remat="none",
        # Mixed precision: cast fp32 master params to compute_dtype ONCE at
        # the top of each jitted step (halves HBM weight traffic; grads and
        # the optimizer stay fp32).  No effect when compute_dtype=float32.
        cast_params_once=True,
        # Fused AdamW kernel choice (optim_type=adamw, grad_accum=1 only;
        # exact optax math either way, tests/test_optim_fused.py):
        #   False  -> optax.multi_transform chains (several HBM passes/leaf)
        #   True   -> per-leaf single-fusion update (one pass over
        #             g/m/v/p per leaf, no concats; works under TP) —
        #             DEFAULT: +11 samples/s over optax (batch7 ablation)
        #   "flat" -> flat-buffer variant — ablated at -15 samples/s (the
        #             per-step concats don't fuse; PERF.md), kept for
        #             re-evaluation on future XLA versions.
        fused_optimizer=True,
        # Adam moment STORAGE dtype (fused path only; DEVIATIONS #13):
        # "auto" -> bfloat16 on TPU (28->20 B/param optimizer HBM stream,
        # +2.1% on the driver train lane, batch46) / float32 elsewhere
        # (CPU goldens stay bit-parity with optax.adamw).  The update
        # arithmetic is always fp32 inside the fusion — only the stored
        # m/v round.  Set "float32" for bit-exact reference-style state.
        opt_moments_dtype="auto",
        # PRNG implementation for the training rng stream: "auto" (rbg on
        # TPU — hardware-accelerated bits, much cheaper dropout masks than
        # threefry — threefry elsewhere), "threefry", "rbg".
        rng_impl="auto",
        # T5 beam-search execution: "host" (HF-protocol loop on host,
        # token-parity oracle) or "device" (one jitted lax.scan, no
        # per-token host round trips — decode/beam_device.py).
        beam_impl="host",
        # Overlap host->device batch transfer with device compute (a
        # producer thread device_puts batch N+1 while step N runs).  The
        # reference's torch DataLoader + CUDA streams get this implicitly;
        # on an explicit-transfer backend it must be pipelined by hand —
        # the realdata lanes on the bench host are transfer-bound without
        # it (PERF.md batch34).
        overlap_h2d=True,
        # Log every N steps (reference main.py:71).
        log_every_n_steps=10,
        # Enable jax NaN checking (debug; SURVEY.md §5 sanitizer rebuild).
        debug_nans=False,
    )


# ---------------------------------------------------------------------------
# Named configs (reference m3ae/config.py:121-283)
# ---------------------------------------------------------------------------

NAMED_CONFIGS: Dict[str, Dict[str, Any]] = {}


def _named(name):
    def deco(fn):
        NAMED_CONFIGS[name] = fn()
        return fn
    return deco


@_named("task_pretrain_m3ae")
def _task_pretrain_m3ae():
    return dict(
        exp_name="task_pretrain_m3ae",
        datasets=["medicat", "roco"],
        loss_names=loss_names({"itm": 1, "mlm": 1, "mim": 1}),
        batch_size=256,
        max_epoch=10,
        max_steps=100000,
        warmup_steps=0.1,
        whole_word_masking=True,
        vocab_size=30522,
        max_text_len=64,
        image_size=224,
        tokenizer="bert-base-uncased",
        train_transform_keys=["clip"],
        val_transform_keys=["clip"],
        learning_rate=1e-5,
        val_check_interval=1.0,
        lr_multiplier_head=5,
        lr_multiplier_multi_modal=5,
        num_top_layer=6,
        hidden_size=768,
        num_heads=12,
        precision=16,
        mim_layer=3,
    )


@_named("task_finetune_vqa_ehr_xqa")
def _task_finetune_vqa_ehr_xqa():
    return dict(
        exp_name="task_finetune_vqa_ehr_xqa",
        datasets=["vqa_ehr_xqa"],
        loss_names=loss_names({"vqa": 1}),
        batch_size=64,
        max_epoch=50,
        max_steps=1000,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=5e-6,
        val_check_interval=1.0,
        lr_multiplier_head=100,
        lr_multiplier_multi_modal=5,
        tokenizer="bert-base-uncased",
        input_text_embed_size=768,
        vit="ViT-B/32",
        train_transform_keys=["clip"],
        val_transform_keys=["clip"],
        input_image_embed_size=768,
        image_size=576,
        vqa_label_size=498,
        max_text_len=32,
    )


@_named("task_finetune_vqa_vqa_rad")
def _task_finetune_vqa_vqa_rad():
    return dict(
        exp_name="task_finetune_vqa_vqa_rad",
        datasets=["vqa_vqa_rad"],
        loss_names=loss_names({"vqa": 1}),
        batch_size=64,
        max_epoch=20,
        max_steps=1000,
        warmup_steps=0.1,
        draw_false_image=0,
        learning_rate=1e-5,
        val_check_interval=1.0,
        lr_multiplier_head=100,
        lr_multiplier_multi_modal=5,
        tokenizer="bert-base-uncased",
        input_text_embed_size=768,
        vit="ViT-B/32",
        train_transform_keys=["clip"],
        val_transform_keys=["clip"],
        input_image_embed_size=768,
        image_size=576,
        vqa_label_size=498,
        max_text_len=32,
    )


# Vision-encoder presets
@_named("swin32_base224")
def _swin32_base224():
    return dict(vit="swin_base_patch4_window7_224_in22k", patch_size=32, image_size=224,
                train_transform_keys=["imagenet"], val_transform_keys=["imagenet"],
                input_image_embed_size=1024)


@_named("swin32_base384")
def _swin32_base384():
    return dict(vit="swin_base_patch4_window12_384_in22k", patch_size=32, image_size=384,
                train_transform_keys=["imagenet"], val_transform_keys=["imagenet"],
                input_image_embed_size=1024)


@_named("swin32_large384")
def _swin32_large384():
    return dict(vit="swin_large_patch4_window12_384_in22k", patch_size=32, image_size=384,
                train_transform_keys=["imagenet"], val_transform_keys=["imagenet"],
                input_image_embed_size=1536)


@_named("clip32")
def _clip32():
    return dict(vit="ViT-B/32", image_size=224, patch_size=32,
                train_transform_keys=["clip"], val_transform_keys=["clip"],
                input_image_embed_size=768)


@_named("clip16")
def _clip16():
    return dict(vit="ViT-B/16", image_size=224, patch_size=16,
                train_transform_keys=["clip"], val_transform_keys=["clip"],
                input_image_embed_size=768)


# Text-encoder presets
@_named("text_roberta")
def _text_roberta():
    return dict(tokenizer="roberta-base", vocab_size=50265, input_text_embed_size=768)


@_named("text_roberta_large")
def _text_roberta_large():
    return dict(tokenizer="roberta-large", vocab_size=50265, input_text_embed_size=1024)


# Debug scale (TPU-native addition: tests + multichip dry-runs; not in
# the reference)
@_named("tiny_debug")
def _tiny_debug():
    return dict(
        vit="ViT-Tiny/16", image_size=32, patch_size=16,
        tokenizer="tiny-bert", vocab_size=200,
        hidden_size=64, num_heads=2, num_top_layer=2,
        input_image_embed_size=64, input_text_embed_size=64,
        max_text_len=16, mim_decoder_hidden_size=32,
        mim_decoder_num_heads=2, mim_decoder_num_layers=1,
        num_workers=0, batch_size=4, per_gpu_batchsize=4,
    )


# Random-augmentation presets
@_named("imagenet_randaug")
def _imagenet_randaug():
    return dict(train_transform_keys=["imagenet_randaug"])


@_named("clip_randaug")
def _clip_randaug():
    return dict(train_transform_keys=["clip_randaug"])


@_named("clip_resizedcrop")
def _clip_resizedcrop():
    return dict(train_transform_keys=["clip_resizedcrop"])


# ---------------------------------------------------------------------------
# CLI composition (sacred `with` grammar)
# ---------------------------------------------------------------------------

def _parse_value(text: str) -> Any:
    """Parse a CLI value like sacred: python literal if possible, else str."""
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def resolve_compute_dtype(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve compute_dtype="auto" from the reference's `precision` key:
    precision 16 (the reference's AMP fp16, set by every finetune/pretrain
    task config) -> bfloat16 when the default jax backend is a TPU;
    float32 otherwise (CPU test lanes stay exact-parity fp32)."""
    if cfg.get("compute_dtype") == "auto":
        if int(cfg.get("precision", 32)) == 16:
            import jax
            on_tpu = jax.default_backend() == "tpu"
            cfg["compute_dtype"] = "bfloat16" if on_tpu else "float32"
        else:
            cfg["compute_dtype"] = "float32"
    return cfg


def compose(named: Sequence[str] = (), overrides: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Compose base config + named configs (in order) + key overrides."""
    cfg = base_config()
    for name in named:
        if name not in NAMED_CONFIGS:
            raise KeyError(f"Unknown named config {name!r}; available: {sorted(NAMED_CONFIGS)}")
        cfg.update(copy.deepcopy(NAMED_CONFIGS[name]))
    if overrides:
        for k, v in overrides.items():
            if k not in cfg:
                raise KeyError(f"Unknown config key {k!r}")
            cfg[k] = v
    return resolve_compute_dtype(cfg)


def parse_cli(argv: List[str]) -> Dict[str, Any]:
    """Parse ``[with] name1 name2 key=value ...`` into a composed config.

    Matches the reference CLI grammar (run_scripts/*.sh):
        python main.py with task_finetune_vqa_vqa_rad clip16 text_roberta k=v
    The leading ``with`` is optional.  Later items override earlier ones;
    named configs and key=value items may interleave (applied in order).
    """
    cfg = base_config()
    items = list(argv)
    if items and items[0] == "with":
        items = items[1:]
    for item in items:
        if "=" in item:
            key, _, raw = item.partition("=")
            key = key.strip()
            if key not in cfg:
                raise KeyError(f"Unknown config key {key!r}")
            cfg[key] = _parse_value(raw)
        else:
            name = item.strip()
            if name not in NAMED_CONFIGS:
                raise KeyError(f"Unknown named config {name!r}; available: {sorted(NAMED_CONFIGS)}")
            cfg.update(copy.deepcopy(NAMED_CONFIGS[name]))
    return resolve_compute_dtype(cfg)
