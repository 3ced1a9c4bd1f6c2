"""Benchmark: VQA-RAD classifier fine-tune samples/sec/chip (the
BASELINE.json headline metric).

Runs the flagship training step — M3AE ViT-B/16 @ 384, BERT-base text tower
(text len 32), 6x2 co-attention fusion, VQA classifier head, full
fwd+bwd+6-group-AdamW — on synthetic data at steady state and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator is an engineering estimate of the reference stack on its
1xA6000 environment for this exact workload (~400 GFLOPs/sample fwd+bwd,
A6000 fp16 ~155 TFLOPs peak at ~15-20% eager-torch MFU -> ~60 samples/s).
Override with env A6000_BASELINE_SPS.

Env knobs: BENCH_BATCH (per-chip batch, default 32 train / 16 eval — the
measured optima, see default_batch below), BENCH_DTYPE
(bfloat16|float32, default bfloat16), BENCH_STEPS (default 100),
BENCH_MODE (train|eval|pretrain|decode|decode_step|t5_beam|realdata, default train), BENCH_ATTN
(auto|pallas|xla), BENCH_DROP (attention dropout rate).  realdata runs the
full arrow->JPEG-decode->randaug->collate->step pipeline at VQA-RAD scale
(fixture auto-built under .bench_fixture, override MMVQA_REALDATA_ROOT).
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: repeated driver/bench runs skip the
# multi-minute XLA+Mosaic remote compile.  TPU only — CPU AOT entries are
# machine-feature-pinned and only produce scary reload warnings.
import os as _os
if "cpu" not in _os.environ.get("JAX_PLATFORMS", ""):
    try:
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
    except Exception:
        pass
import jax.numpy as jnp
import numpy as np


def build(batch_size: int, dtype: str, mode: str):
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    label_size = 498
    overrides = {
        "per_gpu_batchsize": batch_size,
        "batch_size": batch_size * jax.device_count(),
        "compute_dtype": dtype,
        "max_steps": 1000,
        "warmup_steps": 0,
        "attention_impl": os.environ.get("BENCH_ATTN", "auto"),
        "drop_rate": float(os.environ.get("BENCH_DROP", "0.1")),
        "cast_params_once": os.environ.get("BENCH_CAST", "1") == "1",
        "remat": os.environ.get("BENCH_REMAT", "none"),
        "fused_optimizer": {"0": False, "1": True}.get(
            os.environ.get("BENCH_FUSED_OPT", "1"),
            os.environ.get("BENCH_FUSED_OPT", "1")),
    }
    # vision preset (BENCH_PRESET): clip16 (default) or any named vision
    # config — swin32_base384 etc. exercise the Swin tower path
    preset = os.environ.get("BENCH_PRESET", "clip16")
    if mode == "pretrain":
        # reference pretrain_m3ae.sh: mlm+mim+itm, image 288, text 64
        cfg = compose(["task_pretrain_m3ae", preset],
                      {**overrides, "image_size": 288})
    else:
        cfg = compose(["task_finetune_vqa_vqa_rad", preset],
                      {**overrides, "image_size": 384})
    trainer = Trainer(cfg)
    trainer.init_params()
    trainer.setup_optimizer(steps_per_epoch=100)

    n = trainer.mesh.devices.shape[0]
    b = batch_size * n
    s = cfg["max_text_len"]
    size = cfg["image_size"]
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(b, size, size, 3)).astype(np.float32),
        "text_ids": rng.integers(0, 30522, (b, s)).astype(np.int32),
        "text_masks": np.ones((b, s), np.int32),
        "text_labels": np.full((b, s), -100, np.int32),
        "vqa_targets": np.eye(label_size, dtype=np.float32)[
            rng.integers(0, label_size, b)],
        "answer_types": rng.integers(0, 2, b).astype(np.int32),
        "sample_valid": np.ones(b, np.float32),
    }
    if mode == "pretrain":
        masked = batch["text_ids"].copy()
        labels = np.full((b, s), -100, np.int32)
        sel = rng.random((b, s)) < 0.15
        labels[sel] = masked[sel]
        masked[sel] = 103  # [MASK]
        batch["text_ids_mlm"] = masked
        batch["text_labels_mlm"] = labels
        batch["false_image_0"] = rng.normal(
            size=(b, size, size, 3)).astype(np.float32)
        for k in ("vqa_targets", "answer_types", "sample_valid"):
            batch.pop(k)
    from mm_vqa_healthcare_tpu.parallel.mesh import shard_batch
    dev_batch = shard_batch(trainer.mesh, batch)
    step = trainer._get_jitted(
        "train" if mode in ("train", "pretrain") else "eval")
    return trainer, step, dev_batch, b


def _build_realdata_fixture(root: str, n_images: int = 313,
                            n_train: int = 1797, size: int = 512):
    """VQA-RAD-scale on-disk fixture: JPEG images at radiograph-like
    resolution + arrow QA tables through the real prepro writers, so the
    realdata bench exercises the full decode->randaug->collate path."""
    import importlib.util
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "bench_fixtures", os.path.join(here, "tests", "fixtures.py"))
    fixtures = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fixtures)
    from mm_vqa_healthcare_tpu.prepro.make_arrow import make_arrow_vqa_m3ae

    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    from PIL import Image
    paths = []
    for i in range(n_images):
        # low-frequency noise compresses like a radiograph (pure noise
        # JPEGs decode unrealistically slowly)
        small = rng.integers(0, 255, (size // 8, size // 8), np.uint8)
        arr = np.asarray(Image.fromarray(small).resize(
            (size, size), Image.BICUBIC))
        p = os.path.join(img_dir, f"img_{i}.jpg")
        Image.fromarray(np.stack([arr] * 3, -1)).save(p, quality=90)
        paths.append(p)
    data = {"train": [], "val": [], "test": []}
    qid = 0
    for split, count in [("train", n_train), ("val", 451), ("test", 451)]:
        for i in range(count):
            q, a, at = fixtures.QUESTIONS[qid % len(fixtures.QUESTIONS)]
            data[split].append({
                "img_path": paths[qid % len(paths)], "qid": qid,
                "question": q, "answer": a, "answer_type": at})
            qid += 1
    data_root = os.path.join(root, "arrows")
    os.makedirs(data_root, exist_ok=True)
    label2ans = os.path.join(data_root, "label2ans.json")
    make_arrow_vqa_m3ae(data, "vqa_vqa_rad", data_root,
                        label2ans_path=label2ans)
    vocab = fixtures.write_vocab(os.path.join(root, "vocab.txt"))
    return data_root, vocab


def bench_realdata(batch_size: int, steps: int, dtype: str):
    """End-to-end REAL-DATA training throughput: arrow mmap -> JPEG decode
    (+ decoded-frame cache) -> randaug -> collate -> device step.  Measures
    steady state (epoch 2+, decode cache warm) — VERDICT r1 item 5."""
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.train.trainer import Trainer, make_train_key

    root = os.environ.get("MMVQA_REALDATA_ROOT",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".bench_fixture"))
    data_root = os.path.join(root, "arrows")
    vocab = os.path.join(root, "vocab.txt")
    if not os.path.isfile(os.path.join(data_root, "vqa_vqa_rad_train.arrow")):
        _build_realdata_fixture(root)
    with open(os.path.join(data_root, "label2ans.json")) as f:
        label_size = len(json.load(f))
    cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], {
        "data_root": data_root, "tokenizer_path": vocab,
        "vqa_label_size": label_size, "image_size": 384,
        "per_gpu_batchsize": batch_size,
        "batch_size": batch_size * jax.device_count(),
        "compute_dtype": dtype, "max_steps": 10000, "warmup_steps": 0,
        "num_workers": 0,
        "attention_impl": os.environ.get("BENCH_ATTN", "auto"),
        "fused_optimizer": {"0": False, "1": True}.get(
            os.environ.get("BENCH_FUSED_OPT", "1"),
            os.environ.get("BENCH_FUSED_OPT", "1")),
        # device-side PIL-parity resize+crop (ops/device_resize.py): the
        # host randaug runs on the cached decoded frame, geometry in-jit
        "device_resize": os.environ.get("BENCH_DEVRESIZE", "0") == "1",
    })
    trainer = Trainer(cfg)
    trainer.setup_data()
    trainer.init_params()
    trainer.setup_optimizer(steps_per_epoch=100)
    step = trainer._get_jitted("train")
    # same PRNG family as Trainer.fit (rbg on TPU — hardware RNG; a
    # threefry key here would pay ~20 ALU ops/word for dropout bits)
    rng = make_train_key(0, os.environ.get("BENCH_RNG", "auto"))

    # BENCH_OVERLAP=0 disables the double-buffered H2D pipeline (A/B
    # control; production default is overlap on — config overlap_h2d)
    overlap = os.environ.get("BENCH_OVERLAP", "1") == "1"

    def epoch_steps(epoch, limit, measure=False):
        from mm_vqa_healthcare_tpu.train.trainer import device_prefetch
        n = 0
        t0 = time.perf_counter()
        batches = trainer.dm.train_loader(epoch)
        batches = (device_prefetch(batches, trainer._device_batch)
                   if overlap else map(trainer._device_batch, batches))
        for dev in batches:
            trainer.params, trainer.opt_state, aux = step(
                trainer.params, trainer.opt_state, dev,
                jax.random.fold_in(rng, epoch * 10000 + n))
            n += 1
            if n >= limit:
                break
        jax.device_get(aux["loss"])
        return n, time.perf_counter() - t0

    # epoch 0: compile + fill the decoded-frame cache (unmeasured)
    epoch_steps(0, max(8, steps))
    n, dt = epoch_steps(1, steps, measure=True)
    return batch_size * jax.device_count() * n / dt, dt / n


def bench_decode_step(batch_size: int, steps: int):
    """Autoregressive decode-step throughput, decoder-only.

    The full-pipeline decode bench needs a fresh fwd-only M3AE encode HLO,
    which reproducibly crashes this environment's remote-compile service
    ("broken pipe" after ~25 min; 4 attempts across pallas AND xla
    attention, batch 32 and 16 — the fwd+bwd train HLO and the cached eval
    HLO compile fine).  This mode measures the part that bench can
    actually own end-to-end — the KV-cached greedy decode loop over the
    reference decoder (6 layers, d=768, max_len 128) — and composes
    answers/sec with the measured eval forward rate:

        1/answers_per_sec = 1/eval_samples_per_sec + t_decode_per_answer

    (the classifier eval fwd is the same M3AE forward the decoder head
    consumes, reference m3ae_decoder.py:299).
    """
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.decode.greedy import greedy_search_host
    from mm_vqa_healthcare_tpu.models.decoder import Decoder
    from mm_vqa_healthcare_tpu.models.decoder_model import DecoderModelConfig

    # the bench decodes the full 128 tokens (random weights never emit
    # SEP), so one round trip per batch is optimal; production decoding
    # with ~3-token answers keeps the library default chunk of 16
    os.environ.setdefault("MMVQA_DECODE_CHUNK", "128")
    cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], {
        "image_size": 384, "per_gpu_batchsize": batch_size,
        "compute_dtype": "bfloat16",
        "attention_impl": os.environ.get("BENCH_ATTN", "auto")})
    model_cfg = DecoderModelConfig.from_dict(cfg)
    decoder = Decoder(model_cfg.decoder)
    b = batch_size
    enc_len = 577 + cfg["max_text_len"] + 2  # image + text + CLS pair
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(b, enc_len, 768)) * 0.02,
                      jnp.bfloat16)
    # init params via a tiny teacher-forced call (shapes only)
    dec_params = decoder.init(
        jax.random.key(0), jnp.ones((b, 4), jnp.int32),
        jnp.ones((b, 4), jnp.int32), enc)
    jit_cache = {}
    out = greedy_search_host(decoder, dec_params, enc,
                             cls_id=101, sep_id=102, pad_id=0,
                             jit_cache=jit_cache)
    jax.device_get(out)
    print("bench_decode_step: warmup done", flush=True)
    t0 = time.perf_counter()
    carry = out
    for i in range(steps):
        enc_i = enc + (carry[0, 0] * 0).astype(enc.dtype)
        carry = greedy_search_host(decoder, dec_params, enc_i,
                                   cls_id=101, sep_id=102, pad_id=0,
                                   jit_cache=jit_cache)
    jax.device_get(carry)
    dt = (time.perf_counter() - t0) / steps
    return b, dt


def bench_decode(batch_size: int, steps: int):
    """Generative decoder path: KV-cached greedy search answers/sec
    (reference test_m3ae_decoder.sh path, eval batch 32)."""
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.decode.greedy import greedy_search_host
    from mm_vqa_healthcare_tpu.models.decoder import Decoder
    from mm_vqa_healthcare_tpu.models.decoder_model import (
        DecoderModelConfig, DecoderVQAModel)

    overrides = {
        "image_size": 384, "per_gpu_batchsize": batch_size,
        "compute_dtype": "bfloat16",
        "attention_impl": os.environ.get("BENCH_ATTN", "auto")}
    if os.environ.get("BENCH_DECODE_MEMORY") == "full":
        # the production decoder recipe's 610-token cross memory
        # (run_scripts/finetune_m3ae_decoder.sh) instead of the config
        # default CLS-only memory
        overrides["mm_encoder_inputs_include_imagetext_feats"] = True
    cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], overrides)
    model_cfg = DecoderModelConfig.from_dict(cfg)
    model = DecoderVQAModel(model_cfg)
    b, s = batch_size, cfg["max_text_len"]
    batch = {
        "text_ids": jnp.ones((b, s), jnp.int32),
        "text_masks": jnp.ones((b, s), jnp.int32),
        "image": jnp.zeros((b, 384, 384, 3), jnp.float32),
    }
    t = model_cfg.max_answer_length - 1
    # init at batch 1: params are batch-independent and the full-batch init
    # HLO is a separate (huge) remote compile we don't need
    batch1 = {k: v[:1] for k, v in batch.items()}
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "mim": jax.random.key(1)},
        batch1, jnp.zeros((1, t), jnp.int32), jnp.ones((1, t), jnp.int32))
    # one-time eval-precision cast (see bench_t5_beam; PERF.md batch16)
    if cfg["compute_dtype"] != "float32" and \
            os.environ.get("BENCH_EVAL_CAST", "1") == "1":
        from mm_vqa_healthcare_tpu.train.trainer import cast_floats
        params = jax.jit(
            lambda p: cast_floats(p, jnp.dtype(cfg["compute_dtype"])))(params)
    print("bench_decode: init done", flush=True)
    decoder = Decoder(model_cfg.decoder)
    # BENCH_DECODE_MAXLEN: cap the search length (production answers are
    # <= max_answer_length=12 tokens; the reference's search_path decodes
    # to its hardcoded 128 only because random/garbage weights never emit
    # SEP — a trained model stops after ~3 tokens).  The positional
    # encoding is sinusoidal (non-param), so the same params serve any cap.
    _ml = int(os.environ.get("BENCH_DECODE_MAXLEN", "0"))
    if _ml:
        import dataclasses as _dc
        decoder = Decoder(_dc.replace(model_cfg.decoder, max_len=_ml))
    dec_params = {"params": params["params"]["decoder"]}

    if os.environ.get("BENCH_SPLIT_ENCODE", "1") == "1":
        # Split-phase encode: three small XLA programs (text tower, vision
        # tower, fusion) instead of one monolithic HLO — the monolithic
        # fwd-only encode crashes this host's remote-compile service
        # (NOTES_ROUND3.md #1); numerically identical (tests/test_golden.py).
        from mm_vqa_healthcare_tpu.models.decoder_model import (
            assemble_encoder_memory)
        from mm_vqa_healthcare_tpu.models.m3ae import M3AE
        m3ae = M3AE(model_cfg.m3ae)
        m3ae_params = {"params": params["params"]["m3ae"]}
        # params are jit ARGUMENTS, never closure captures: captured
        # arrays serialize as constants into the remote-compile request
        # (HTTP 413 / broken pipe at M3AE scale)
        jit_text = jax.jit(lambda p, ids, masks: m3ae.apply(
            p, ids, masks, method=M3AE.infer_text))
        jit_image = jax.jit(lambda p, img: m3ae.apply(
            p, img, method=M3AE.infer_image))

        def _fuse(p, ut, ui, masks):
            out = m3ae.apply(p, ut, ui, masks, method=M3AE.infer_fuse)
            return assemble_encoder_memory(out, model_cfg)
        jit_fuse = jax.jit(_fuse)

        def encode(batch):
            ut = jit_text(m3ae_params, batch["text_ids"],
                          batch["text_masks"])
            ui = jit_image(m3ae_params, batch["image"])
            return jit_fuse(m3ae_params, ut, ui, batch["text_masks"])
    else:
        encode_fn = jax.jit(lambda p, batch: model.apply(
            p, batch, method=DecoderVQAModel.encode))
        encode = lambda batch: encode_fn(params, batch)
    jit_cache = {}

    if os.environ.get("BENCH_DECODE_IMPL") == "device":
        # ONE jitted program: encode + lax.while_loop greedy — zero host
        # round trips per batch (params as traced args)
        from mm_vqa_healthcare_tpu.decode.greedy import greedy_search
        decode_jit = jax.jit(lambda p, batch: greedy_search(
            decoder, {"params": p["params"]["decoder"]},
            model.apply(p, batch, method=DecoderVQAModel.encode),
            cls_id=101, sep_id=102, pad_id=0))

        def decode(batch):
            return decode_jit(params, batch)
    else:
        # host-driven greedy: jitted encode + jitted K-token scan chunks,
        # loop on host (MMVQA_DECODE_CHUNK per round trip)
        def decode(batch):
            enc = encode(batch)
            return greedy_search_host(decoder, dec_params, enc,
                                      cls_id=101, sep_id=102, pad_id=0,
                                      jit_cache=jit_cache)

    out = decode(batch)
    jax.device_get(out)
    print("bench_decode: warmup decode done", flush=True)
    t0 = time.perf_counter()
    carry = out
    for i in range(steps):
        stepb = dict(batch)
        stepb["image"] = batch["image"] + (carry[0, 0] * 0).astype(
            batch["image"].dtype)
        carry = decode(stepb)
    jax.device_get(carry)  # host loop already syncs per token
    dt = (time.perf_counter() - t0) / steps
    return b / dt, dt


def bench_t5_beam(batch_size: int, steps: int, num_beams: int = 4):
    """T5-head VQA generation: beam-`num_beams` answers/sec (reference
    m3ae_t5_mm_encoder_input.py:207-227 / run_scripts/finetune_m3ae_t5.sh).
    Split-phase encode (M3AE towers + soft-prompt/T5-encoder) keeps each
    remote-compiled HLO small."""
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.decode.beam import beam_search
    from mm_vqa_healthcare_tpu.models.m3ae import M3AE
    from mm_vqa_healthcare_tpu.models.t5 import T5, T5Config, T5_PRESETS
    from mm_vqa_healthcare_tpu.models.t5_heads import (
        T5HeadConfig, T5VQAModel)

    overrides = {
        "image_size": 384, "per_gpu_batchsize": batch_size,
        "compute_dtype": "bfloat16",
        "attention_impl": os.environ.get("BENCH_ATTN", "auto")}
    if os.environ.get("BENCH_T5_MAXLEN"):
        # production budget: the finetune recipe sets t5_max_length=12
        # (run_scripts/finetune_m3ae.sh); the config default is 25
        overrides["t5_max_length"] = int(os.environ["BENCH_T5_MAXLEN"])
    cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], overrides)
    t5_cfg = T5_PRESETS.get(
        os.environ.get("BENCH_T5", cfg["t5_model_name"]), T5Config())
    # "question:" t5-tokenizer ids, hardcoded (zero-egress host; values
    # only shift which embeddings the prefix rows select)
    model_cfg = T5HeadConfig.from_dict(
        cfg, question_prefix_ids=(822, 10), t5_cfg=t5_cfg, variant="mm")
    model = T5VQAModel(model_cfg)
    b, s = batch_size, cfg["max_text_len"]
    max_len = model_cfg.max_answer_length
    batch = {
        "text_ids": jnp.ones((b, s), jnp.int32),
        "text_masks": jnp.ones((b, s), jnp.int32),
        "image": jnp.zeros((b, 384, 384, 3), jnp.float32),
    }
    batch1 = {k: v[:1] for k, v in batch.items()}
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "mim": jax.random.key(1)},
        batch1, jnp.zeros((1, max_len), jnp.int32))
    # One-time eval-precision cast (classifier eval does the same in-step,
    # trainer.py:_eval_step_fn; reference serves under fp16 AMP).  fp32
    # master params fed the T5 stack raw -> the whole beam scan ran fp32:
    # 2x the HBM traffic on cross K/V + lm_head (PERF.md batch16).
    if cfg["compute_dtype"] != "float32" and \
            os.environ.get("BENCH_EVAL_CAST", "1") == "1":
        from mm_vqa_healthcare_tpu.train.trainer import cast_floats
        params = jax.jit(
            lambda p: cast_floats(p, jnp.dtype(cfg["compute_dtype"])))(params)
    print("bench_t5_beam: init done", flush=True)

    m3ae = M3AE(model_cfg.m3ae)
    m3ae_params = {"params": params["params"]["m3ae"]}
    # params as jit ARGUMENTS (closure captures become constants in the
    # remote-compile request body -> HTTP 413 at this scale)
    jit_text = jax.jit(lambda p, ids, masks: m3ae.apply(
        p, ids, masks, method=M3AE.infer_text))
    jit_image = jax.jit(lambda p, img: m3ae.apply(
        p, img, method=M3AE.infer_image))
    jit_fuse = jax.jit(lambda p, ut, ui, masks: m3ae.apply(
        p, ut, ui, masks, method=M3AE.infer_fuse))
    jit_encode = jax.jit(lambda p, out, batch, rng: model.apply(
        p, out, batch, rng, method=T5VQAModel.encode_from))

    k = num_beams
    t5 = T5(model_cfg.t5)
    t5_params = {"params": params["params"]["t5"]}
    jit_step = jax.jit(lambda p, tok, pos, cache, enc, mask: t5.apply(
        p, tok, pos, enc, mask, cache, method=T5.decode_step))
    jit_reorder = jax.jit(
        lambda c, i: jax.tree_util.tree_map(lambda x: x[i], c))

    # device: whole beam loop as one jitted scan — 41.5 answers/s vs 1.1
    # for the host HF loop on this tunneled backend (batch11, 37x)
    beam_impl = os.environ.get("BENCH_T5_IMPL", "device")
    scan_cache = {}

    if beam_impl == "device_onejit":
        # ONE program per batch: M3AE towers + fuse + T5 encode + the
        # whole beam scan — zero intermediate host round trips (the 5-jit
        # split pays ~90 ms dispatch each through a tunneled backend)
        from mm_vqa_healthcare_tpu.decode.beam_device import (
            finalize_from_scan, scan_beam)

        def _all(p, batch, rng):
            m3p = {"params": p["params"]["m3ae"]}
            ut = m3ae.apply(m3p, batch["text_ids"], batch["text_masks"],
                            method=M3AE.infer_text)
            ui = m3ae.apply(m3p, batch["image"], method=M3AE.infer_image)
            fused = m3ae.apply(m3p, ut, ui, batch["text_masks"],
                               method=M3AE.infer_fuse)
            enc, mask = model.apply(p, fused, batch, rng,
                                    method=T5VQAModel.encode_from)
            tp = {"params": p["params"]["t5"]}
            # cross K/V at encoder batch (beam-grouped cross-attention)
            cache = t5.apply(tp, b * k, max_len, enc,
                             method=T5.init_cache)
            return scan_beam(
                lambda t_, pos, c, tp_, e, m: t5.apply(
                    tp_, t_, pos, e, m, c, method=T5.decode_step),
                cache, (tp, enc, mask), b, k, max_len,
                eos_token_id=1, pad_token_id=0,
                decoder_start_token_id=0, length_penalty=1.0,
                early_stopping=True,
                cache_split=(T5.split_cache, T5.merge_cache))
        onejit = jax.jit(_all)

        def decode(batch, rng):
            return finalize_from_scan(
                onejit(params, batch, rng), b, k, max_len,
                eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

        out = decode(batch, jax.random.key(0))
        print("bench_t5_beam: warmup decode done", flush=True)
        t0 = time.perf_counter()
        for i in range(steps):
            out = decode(batch, jax.random.key(i + 1))
        dt = (time.perf_counter() - t0) / steps
        return b / dt, dt

    def decode(batch, rng):
        ut = jit_text(m3ae_params, batch["text_ids"], batch["text_masks"])
        ui = jit_image(m3ae_params, batch["image"])
        fused = jit_fuse(m3ae_params, ut, ui, batch["text_masks"])
        enc, mask = jit_encode(params, fused, batch, rng)
        if beam_impl == "device":
            # cross K/V at encoder batch (beam-grouped cross-attention)
            from mm_vqa_healthcare_tpu.decode.beam_device import (
                beam_search_device)
            cache = t5.apply(t5_params, b * k, max_len, enc,
                             method=T5.init_cache)
            return beam_search_device(
                lambda t_, pos, c, p, e, m: t5.apply(
                    p, t_, pos, e, m, c, method=T5.decode_step),
                cache, b, k, max_len, eos_token_id=1, pad_token_id=0,
                decoder_start_token_id=0, jit_cache=scan_cache,
                step_args=(t5_params, enc, mask),
                cache_split=(T5.split_cache, T5.merge_cache))
        enc_rep = jnp.repeat(enc, k, axis=0)
        mask_rep = None if mask is None else jnp.repeat(mask, k, axis=0)
        cache = t5.apply(t5_params, b * k, max_len, enc_rep,
                         method=T5.init_cache)
        return beam_search(
            lambda t, pos, c: jit_step(t5_params, t, pos, c, enc_rep,
                                       mask_rep),
            jit_reorder, cache, b, k, max_len,
            eos_token_id=1, pad_token_id=0, decoder_start_token_id=0)

    out = decode(batch, jax.random.key(0))
    print("bench_t5_beam: warmup decode done", flush=True)
    profile_dir = os.environ.get("MMVQA_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(steps):
        out = decode(batch, jax.random.key(i + 1))
    dt = (time.perf_counter() - t0) / steps
    if profile_dir:
        jax.profiler.stop_trace()
    return b / dt, dt


def bench_gen_train(mode: str, batch_size: int, steps: int, dtype: str):
    """Generative-head fine-tune TRAIN step (fwd+bwd+optimizer), through
    the real trainers: BENCH_MODE=decoder_train (reference
    finetune_m3ae_decoder.sh recipe incl. its 610-token cross memory) or
    t5_train (reference main_t5_m3ae.py flow: frozen M3AE, soft-prompt
    encoder inputs, unfreeze_top_layers partition)."""
    from mm_vqa_healthcare_tpu.config import compose
    from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib

    overrides = {
        "image_size": 384, "per_gpu_batchsize": batch_size,
        "batch_size": batch_size * jax.device_count(),
        "compute_dtype": dtype, "max_steps": 1000, "warmup_steps": 0,
        "attention_impl": os.environ.get("BENCH_ATTN", "auto"),
    }
    rng = np.random.default_rng(0)
    b, s = batch_size, 32
    base = {
        "image": rng.normal(size=(b, 384, 384, 3)).astype(np.float32),
        "text_ids": rng.integers(0, 30000, (b, s)).astype(np.int32),
        "text_masks": np.ones((b, s), np.int32),
    }
    if mode == "decoder_train":
        # the run-script recipe enables the full imagetext cross memory
        overrides["mm_encoder_inputs_include_imagetext_feats"] = True
        cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], overrides)
        from mm_vqa_healthcare_tpu.models.decoder_model import (
            DecoderModelConfig, DecoderVQAModel)
        from mm_vqa_healthcare_tpu.train.decoder_trainer import (
            DecoderTrainer)
        trainer = DecoderTrainer(cfg)
        trainer.model_cfg = DecoderModelConfig.from_dict(cfg)
        trainer.model = DecoderVQAModel(trainer.model_cfg)

        class _Tok:  # the jitted step only reads pad_token_id
            pad_token_id = 0
        trainer.tokenizer = _Tok()
        t = trainer.max_answer_length - 1
        base["target_shifted"] = rng.integers(1, 30000, (b, t)).astype(
            np.int32)
        base["padding_mask"] = np.ones((b, t), np.int32)
        base["target_golden"] = rng.integers(1, 30000, (b, t)).astype(
            np.int32)
    else:
        cfg = compose(["task_finetune_vqa_vqa_rad", "clip16"], overrides)
        from mm_vqa_healthcare_tpu.train.t5_trainer import T5Trainer

        class _StubT5Tok:
            """Bench-only stand-in (zero-egress host): fixed prefix ids —
            they only select which embedding rows form the soft prompt."""
            pad_token_id = 0
            eos_token_id = 1

            def __call__(self, text, **kw):
                return {"input_ids": [822, 10]}

            def __len__(self):
                return 32128
        trainer = T5Trainer(cfg, tokenizer=_StubT5Tok())
        base["t5_labels"] = rng.integers(
            1, 32000, (b, cfg["t5_max_length"])).astype(np.int32)
    trainer.init_params()
    trainer.setup_optimizer(steps_per_epoch=100)
    print(f"bench_{mode}: init done", flush=True)
    batch_dev = mesh_lib.shard_batch(trainer.mesh, base)
    step = trainer._get_jitted("train")
    params, opt = trainer.params, trainer.opt_state
    # same PRNG family as the trainers' fit() (rbg on TPU — hardware RNG)
    from mm_vqa_healthcare_tpu.train.trainer import make_train_key
    key = make_train_key(0, os.environ.get("BENCH_RNG", "auto"))
    out = step(params, opt, batch_dev, key)
    params, opt = out[0], out[1]
    jax.device_get(out[2])
    # SECOND warmup with the carried params/opt: the first carry changes
    # the jit signature (donated-output layouts / optax state types differ
    # from tx.init's) and triggers ONE retrace+recompile — absorb it here
    # like the classifier bench does, or a 50-step window averages a
    # ~160 s compile into every step (measured: 3278 ms/step reported vs
    # ~45 ms warm — batch19 postmortem).
    out = step(params, opt, batch_dev, jax.random.fold_in(key, 9999))
    params, opt = out[0], out[1]
    jax.device_get(out[2])
    print(f"bench_{mode}: warmup step done", flush=True)
    profile_dir = os.environ.get("MMVQA_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for i in range(steps):
        out = step(params, opt, batch_dev, jax.random.fold_in(key, i + 1))
        params, opt = out[0], out[1]
    jax.device_get(out[2])
    dt = (time.perf_counter() - t0) / steps
    if profile_dir:
        jax.profiler.stop_trace()
    return b / dt, dt


def main():
    mode_for_batch = os.environ.get("BENCH_MODE", "train")
    # per-chip batch 32 amortizes the once-per-step optimizer on the train
    # lane (174.3 vs 169.4 samples/s, batch9); eval peaks at 16 (628.7 vs
    # 605 at 64)
    default_batch = "32" if mode_for_batch == "train" else "16"
    batch_size = int(os.environ.get("BENCH_BATCH", default_batch))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # default 100: device steps run gapless (~99 ms profiled) but each
    # measurement window carries ~0.4 s of fixed dispatch/sync overhead
    # through the remote-execution tunnel — 100 steps amortize it to
    # ~4 ms/step (PERF.md round 2); decode/realdata override below.
    steps = int(os.environ.get("BENCH_STEPS", "100"))
    mode = os.environ.get("BENCH_MODE", "train")

    if mode == "realdata":
        sps, step_s = bench_realdata(batch_size, steps, dtype)
        baseline = float(os.environ.get("A6000_BASELINE_SPS", "60.0"))
        print(json.dumps({
            "metric": "vqa_rad_finetune_realdata_train_samples_per_sec_per_chip",
            "value": round(sps / jax.device_count(), 2),
            "unit": "samples/sec/chip",
            "vs_baseline": round(sps / jax.device_count() / baseline, 3),
            "detail": {"per_chip_batch": batch_size, "dtype": dtype,
                       "image_size": 384,
                       "pipeline": ("arrow+jpeg+randaug"
                                    + ("+device_resize"
                                       if os.environ.get("BENCH_DEVRESIZE")
                                       == "1" else "")
                                    + ("+h2d_overlap"
                                       if os.environ.get("BENCH_OVERLAP", "1")
                                       == "1" else "")),
                       "step_time_ms": round(step_s * 1000, 2),
                       "baseline_note": f"A6000 torch-eager estimate "
                                        f"{baseline} samples/s"},
        }))
        return
    if mode in ("decoder_train", "t5_train"):
        batch_size = int(os.environ.get("BENCH_BATCH", "32"))
        sps, step_s = bench_gen_train(mode, batch_size, steps, dtype)
        # Per-lane anchors (BASELINE.md): the frozen-backbone lanes skip
        # the backbone backward on the A6000 too (requires_grad=False), so
        # the 60 samples/s full-train anchor would overstate the ratio.
        # decoder_train ~194 GF/sample (backbone fwd + tiny decoder head)
        # -> A6000 anchor 150; t5_train ~240 GF -> anchor 130.
        if mode == "decoder_train":
            gf, baseline = 194.0, float(
                os.environ.get("A6000_DECTRAIN_SPS", "150.0"))
        else:
            gf, baseline = 240.0, float(
                os.environ.get("A6000_T5TRAIN_SPS", "130.0"))
        sps_chip = sps / jax.device_count()
        mfu = None
        if jax.default_backend() == "tpu":
            peak_tf = float(os.environ.get("TPU_PEAK_TFLOPS", "197.0"))
            mfu = round(sps_chip * gf / (peak_tf * 1e3), 3)
        print(json.dumps({
            "metric": f"vqa_rad_{mode}_samples_per_sec_per_chip",
            "value": round(sps_chip, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": round(sps_chip / baseline, 3),
            "detail": {"per_chip_batch": batch_size, "dtype": dtype,
                       "step_time_ms": round(step_s * 1000, 2),
                       **({"mfu": mfu} if mfu is not None else {}),
                       "baseline_note": f"A6000 frozen-backbone torch-eager "
                                        f"anchor estimate {baseline} "
                                        f"samples/s (BASELINE.md)"},
        }))
        return
    if mode == "t5_beam":
        batch_size = int(os.environ.get("BENCH_BATCH", "16"))
        aps, dt = bench_t5_beam(batch_size, max(2, min(5, steps // 10)))
        baseline = float(os.environ.get("A6000_T5_BEAM_APS", "15.0"))
        print(json.dumps({
            "metric": "vqa_rad_t5_beam4_answers_per_sec_per_chip",
            "value": round(aps / jax.device_count(), 2),
            "unit": "answers/sec/chip",
            "vs_baseline": round(aps / jax.device_count() / baseline, 3),
            "detail": {"batch": batch_size, "num_beams": 4,
                       "max_len": int(os.environ.get("BENCH_T5_MAXLEN", "25")),
                       "t5": os.environ.get("BENCH_T5", ""),
                       "beam_impl": os.environ.get("BENCH_T5_IMPL",
                                                   "device"),
                       "batch_time_ms": round(dt * 1000, 2),
                       "baseline_note": "A6000 HF-generate estimate "
                                        "15 answers/s"},
        }))
        return
    if mode == "decode":
        # decode is per-token-overhead-bound: batch amortizes it (b32
        # 86 -> b128 239 -> b512 359 answers/s, batch13b/14); 128 keeps
        # worst-case full-128-token latency ~0.5 s
        batch_size = int(os.environ.get("BENCH_BATCH", "128"))
        aps, dt = bench_decode(batch_size, max(3, min(10, steps // 3)))
        baseline = float(os.environ.get("A6000_DECODE_APS", "40.0"))
        print(json.dumps({
            "metric": "vqa_rad_decoder_greedy_answers_per_sec_per_chip",
            "value": round(aps / jax.device_count(), 2),
            "unit": "answers/sec/chip",
            "vs_baseline": round(aps / jax.device_count() / baseline, 3),
            "detail": {"batch": batch_size,
                       "max_len": int(os.environ.get(
                           "BENCH_DECODE_MAXLEN", "0")) or 128,
                       "batch_time_ms": round(dt * 1000, 2),
                       "baseline_note": "A6000 full-prefix-reforward "
                                        "estimate 40 answers/s"},
        }))
        return
    if mode == "decode_step":
        batch_size = int(os.environ.get("BENCH_BATCH", "16"))
        b, dt = bench_decode_step(batch_size, max(3, min(10, steps // 3)))
        # compose with the measured eval forward (same M3AE fwd the
        # decoder consumes); override via BENCH_EVAL_SPS
        eval_sps = float(os.environ.get("BENCH_EVAL_SPS", "628.7"))
        t_total = dt / b + 1.0 / eval_sps
        aps = 1.0 / t_total
        baseline = float(os.environ.get("A6000_DECODE_APS", "40.0"))
        print(json.dumps({
            "metric": "vqa_rad_decoder_greedy_answers_per_sec_per_chip",
            "value": round(aps / jax.device_count(), 2),
            "unit": "answers/sec/chip",
            "vs_baseline": round(aps / jax.device_count() / baseline, 3),
            "detail": {"batch": batch_size, "max_len": 128,
                       "decode_batch_time_ms": round(dt * 1000, 2),
                       "decode_only_answers_per_sec": round(b / dt, 2),
                       "composed_with_eval_sps": eval_sps,
                       "note": "decoder-only measured, composed with the "
                               "eval-bench encode rate; superseded by "
                               "BENCH_MODE=decode (full pipeline) once "
                               "the params-as-closure-constants compile "
                               "failure was fixed (NOTES_ROUND3 #9)",
                       "baseline_note": "A6000 full-prefix-reforward "
                                        "estimate 40 answers/s"},
        }))
        return

    def run_std_lane(lane_mode: str, lane_batch: int) -> dict:
        """One train/eval/pretrain lane measurement -> result dict."""
        trainer, step, dev_batch, global_batch = build(
            lane_batch, dtype, lane_mode)
        from mm_vqa_healthcare_tpu.train.trainer import make_train_key
        rng = make_train_key(0, os.environ.get("BENCH_RNG", "auto"))

        # NOTE on timing: steps are chained through a data dependency
        # (params in train mode; a loss-perturbed image in eval mode) and
        # the loop ends with jax.device_get, which is the only reliable
        # full-pipeline sync on remote-executed backends
        # (block_until_ready can return early there).
        def run_one(i, carry):
            if lane_mode in ("train", "pretrain"):
                p, o, aux = step(trainer.params, trainer.opt_state,
                                 dev_batch, jax.random.fold_in(rng, i))
                trainer.params, trainer.opt_state = p, o
                return aux["loss"]
            batch = dict(dev_batch)
            if carry is not None:
                batch["image"] = batch["image"] + (carry * 0.0).astype(
                    batch["image"].dtype)
            return step(trainer.params, batch)["loss"]

        # compile + warmup (synced)
        loss = run_one(0, None)
        loss = run_one(1, loss)
        jax.device_get(loss)
        profile_dir = os.environ.get("MMVQA_PROFILE_DIR")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
        t0 = time.perf_counter()
        carry = loss
        for i in range(steps):
            carry = run_one(i + 2, carry)
        jax.device_get(carry)
        dt = time.perf_counter() - t0
        if profile_dir:
            jax.profiler.stop_trace()

        sps = global_batch * steps / dt
        sps_chip = sps / jax.device_count()
        baseline = float(os.environ.get("A6000_BASELINE_SPS", "60.0"))
        # MFU per BASELINE.md accounting: 577 GF/sample train step (fwd+
        # bwd+optimizer), 192 GF/sample fwd-only, at image 384; v5e bf16
        # dense peak 197 TFLOP/s.  Only meaningful on the TPU backend.
        mfu = None
        # GF-per-sample accounting per preset (derivations in BASELINE.md):
        # clip16 = ViT-B/16@577tok + BERT + 6x2 fusion; swin32_base384 =
        # swin-base@384 (94 GF tower, = timm's 47.1 GMACs) + BERT + fusion
        # over the 144-token image stream.  pretrain (clip16 @288, text
        # 64, mlm+mim+itm) = 778.8 GF/sample, XLA-audited executed flops
        # (run_scripts/flops_audit.py; BASELINE.md derivation).
        _GF = {"clip16": (577.0, 192.0, 778.8),
               "swin32_base384": (360.0, 120.0, None)}
        preset_gf = _GF.get(os.environ.get("BENCH_PRESET", "clip16"))
        if (jax.default_backend() == "tpu"
                and lane_mode in ("train", "eval", "pretrain")
                and preset_gf is not None):
            gf_per_sample = {"train": preset_gf[0], "eval": preset_gf[1],
                             "pretrain": preset_gf[2]}[lane_mode]
            if gf_per_sample is not None:
                peak_tf = float(os.environ.get("TPU_PEAK_TFLOPS", "197.0"))
                mfu = round(sps_chip * gf_per_sample / (peak_tf * 1e3), 3)
        return {
            "metric": f"vqa_rad_finetune_{lane_mode}_samples_per_sec_per_chip",
            "value": round(sps_chip, 2),
            "unit": "samples/sec/chip",
            "vs_baseline": round(sps_chip / baseline, 3),
            "detail": {
                "global_samples_per_sec": round(sps, 2),
                "devices": jax.device_count(),
                "per_chip_batch": lane_batch,
                "dtype": dtype,
                "image_size": 288 if lane_mode == "pretrain" else 384,
                "step_time_ms": round(1000 * dt / steps, 2),
                **({"mfu": mfu} if mfu is not None else {}),
                "baseline_note":
                    f"A6000 torch-eager estimate {baseline} samples/s",
            },
        }

    # BASELINE.json's metric is "samples/sec/chip; eval answers/sec":
    # the default (driver-parsed) invocation reports BOTH — the eval
    # forward lane as an extra JSON line first (one answer per forward on
    # the classifier task), then the train lane as the FINAL line the
    # driver parses.  BENCH_EVAL_LANE=0 restores single-lane output
    # (perf sweeps that only want the train lane).
    if (mode == "train" and "BENCH_BATCH" not in os.environ
            and os.environ.get("BENCH_EVAL_LANE", "1") == "1"):
        try:
            print(json.dumps(run_std_lane("eval", 16)), flush=True)
        except Exception as e:            # eval lane is auxiliary — never
            print(f"eval lane failed: {e}", flush=True)  # mask the train lane
    print(json.dumps(run_std_lane(mode, batch_size)))


if __name__ == "__main__":
    main()
