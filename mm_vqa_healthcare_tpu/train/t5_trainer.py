"""T5-head trainer (reference main_t5_m3ae.py + T5VQA_* train/test flow).

Training: frozen M3AE -> soft-prompt encoder inputs -> T5 CE on tokenized
answers (pad positions counted, like the reference which never masks them);
`unfreeze_top_layers(num_encoder_layers, num_decoder_layers)` unfreezes the
top-N T5 encoder blocks and the top-N decoder self+cross attention
sublayers (m3ae_t5_mm_encoder_input.py:79-98) — everything else is frozen
via an optax set_to_zero partition.

Optimizer: the reference calls m3ae_t5_utils.set_schedule which is
commented out at HEAD (SURVEY.md §1) — the intended single-LR two-group
AdamW (set_schedule_decoder twin) is used instead.

Generation: HF-semantics beam search (num_beams=4, early_stopping,
max_length=t5_max_length).  Train-time metric generation honors the
`t5_generation` config flag.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mm_vqa_healthcare_tpu.checkpoint import convert
from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
from mm_vqa_healthcare_tpu.data.datamodule import MTDataModule
from mm_vqa_healthcare_tpu.decode.beam import beam_search
from mm_vqa_healthcare_tpu.models.t5 import T5, T5Config, T5_PRESETS
from mm_vqa_healthcare_tpu.models.t5_heads import T5HeadConfig, T5VQAModel
from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
from mm_vqa_healthcare_tpu.train.optim import (
    resolve_steps, warmup_cosine_schedule, warmup_polynomial_schedule)
from mm_vqa_healthcare_tpu.utils.logging import MetricLogger
from mm_vqa_healthcare_tpu.utils.text_metrics import TextMetrics


def load_t5_tokenizer(config: Dict[str, Any]):
    """T5 tokenizer: local path (zero-egress) or hub cache."""
    path = config.get("t5_tokenizer_path", "")
    name = config.get("t5_model_name", "t5-small")
    from transformers import AutoTokenizer
    try:
        return AutoTokenizer.from_pretrained(path or name)
    except Exception as e:
        raise RuntimeError(
            f"Cannot load T5 tokenizer {name!r}; set t5_tokenizer_path "
            f"to a local sentencepiece dir.") from e


class T5Trainer:
    def __init__(self, config: Dict[str, Any], variant: str = "mm",
                 tokenizer=None):
        self.config = config
        self.variant = variant
        self.mesh = mesh_lib.make_mesh(config.get("mesh_shape"))
        self.logger = MetricLogger(config.get("log_dir", "result"),
                                   config.get("exp_name", "t5"))
        self.seed = config["seed"]
        from mm_vqa_healthcare_tpu.train.trainer import make_train_key
        self.rng = make_train_key(self.seed, config.get("rng_impl", "auto"))
        self.dm: Optional[MTDataModule] = None
        self.params = None
        self.opt_state = None
        self._jitted: Dict[str, Any] = {}
        self.global_step = 0
        self.num_beams = 4
        self._t5_tokenizer = tokenizer
        from mm_vqa_healthcare_tpu.data.transforms import key_to_transform
        tkey = config["val_transform_keys"][0]
        tr = key_to_transform(
            tkey.replace("_randaug", "").replace("_resizedcrop", ""),
            config["image_size"])
        self.image_mean = np.asarray(tr.mean, np.float32)
        self.image_std = np.asarray(tr.std, np.float32)

    # --------------------------------------------------------------- plumbing
    @property
    def t5_tokenizer(self):
        if self._t5_tokenizer is None:
            self._t5_tokenizer = load_t5_tokenizer(self.config)
        return self._t5_tokenizer

    def setup_model(self):
        """Tokenizer + model construction — no dataset required (the
        serving CLI cold-starts models without Arrow data)."""
        if getattr(self, "model", None) is None:
            tok = self.t5_tokenizer
            q_ids = tok("question:", add_special_tokens=False)["input_ids"]
            c_ids = tok("context:", add_special_tokens=False)["input_ids"]
            t5_name = self.config.get("t5_model_name", "t5-small")
            t5_cfg = T5_PRESETS.get(t5_name, T5Config())
            if len(tok) != t5_cfg.vocab_size:
                import dataclasses as dc
                t5_cfg = dc.replace(t5_cfg, vocab_size=max(len(tok),
                                                           t5_cfg.vocab_size))
            self.model_cfg = T5HeadConfig.from_dict(
                self.config, question_prefix_ids=q_ids,
                context_prefix_ids=c_ids, t5_cfg=t5_cfg,
                variant=self.variant)
            self.model = T5VQAModel(self.model_cfg)
        return self.model

    def setup_data(self):
        if self.dm is None:
            self.dm = MTDataModule(self.config,
                                   dist=jax.process_count() > 1,
                                   device_count=self.mesh.devices.shape[0])
            self.dm.setup()
            self.setup_model()
        return self.dm

    def init_params(self):
        cfg = self.config
        self.setup_model()
        b, s = 1, cfg["max_text_len"]
        batch = {
            "text_ids": jnp.ones((b, s), jnp.int32),
            "text_masks": jnp.ones((b, s), jnp.int32),
            "image": jnp.zeros((b, cfg["image_size"], cfg["image_size"], 3),
                               jnp.float32),
            "t5_question_ids": jnp.zeros((b, s), jnp.int32),
        }
        labels = jnp.zeros((b, cfg["t5_max_length"]), jnp.int32)
        params = jax.jit(
            lambda r: self.model.init(r, batch, labels,
                                      rng=jax.random.key(0)))(
            {"params": jax.random.key(self.seed),
             "mim": jax.random.key(self.seed + 1)})
        if cfg.get("t5_pretrained_path"):
            import torch
            sd = torch.load(cfg["t5_pretrained_path"], map_location="cpu",
                            weights_only=False)
            sd = sd.get("state_dict", sd)
            sd = {k: v.numpy() for k, v in sd.items()}
            params, loaded = convert.load_t5_state_dict(
                sd, params, self.model_cfg.t5.num_layers,
                self.model_cfg.t5.num_decoder_layers, flax_prefix=("t5",))
            print(f"Loaded {len(loaded)} pretrained T5 tensors")
        if cfg.get("load_path"):
            m3ae_params = {"params": params["params"]["m3ae"]}
            m3ae_params, loaded, _ = convert.load_reference_checkpoint(
                cfg["load_path"], self.model_cfg.m3ae, m3ae_params)
            params["params"]["m3ae"] = m3ae_params["params"]
            print(f"Loaded {len(loaded)} backbone tensors")
        if cfg.get("load_path_t5"):
            import torch
            ckpt = torch.load(cfg["load_path_t5"], map_location="cpu",
                              weights_only=False)
            sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
                  for k, v in ckpt.get("state_dict", ckpt).items()}
            params, loaded = convert.load_t5_state_dict(
                sd, params, self.model_cfg.t5.num_layers,
                self.model_cfg.t5.num_decoder_layers,
                torch_prefix="t5.", flax_prefix=("t5",))
            m3ae_params = {"params": params["params"]["m3ae"]}
            m3ae_sd = {k[len("m3ae."):]: v for k, v in sd.items()
                       if k.startswith("m3ae.")}
            if m3ae_sd:
                m3ae_params, l2, _ = convert.torch_state_dict_to_params(
                    m3ae_sd, self.model_cfg.m3ae, m3ae_params)
                params["params"]["m3ae"] = m3ae_params["params"]
            print(f"Loaded {len(loaded)} T5 tensors from load_path_t5")
        self.params = jax.device_put(params, mesh_lib.replicated(self.mesh))
        return self.params

    # ------------------------------------------------------------- optimizer
    def _trainable_label(self, path) -> str:
        """unfreeze_top_layers semantics (m3ae_t5_mm_encoder_input.py:79-98):
        top-N encoder blocks (all sublayers), top-N decoder blocks' self and
        cross attention sublayers."""
        cfg = self.config
        n_enc = cfg["unfreeze_num_encoder_layers"]
        n_dec = cfg["unfreeze_num_decoder_layers"]
        t5_cfg = self.model_cfg.t5
        parts = [str(p) for p in path]
        if parts[1] == "feature_projection":
            # the reference builds feature_projection AFTER the freeze_t5 /
            # freeze_m3ae loops (m3ae_t5_mm_encoder_input.py:40-43), so it
            # keeps requires_grad=True.  Unused under bug_compat (the
            # fresh-random per-forward projection_layer quirk, :75-77) but
            # trainable either way, and load-bearing for bug_compat=False.
            return "train"
        if parts[1] != "t5":
            return "frozen"
        name = parts[2]
        if name.startswith("encoder_block_"):
            idx = int(name.rsplit("_", 1)[1])
            return "train" if idx >= t5_cfg.num_layers - n_enc else "frozen"
        if name.startswith("decoder_block_"):
            idx = int(name.rsplit("_", 1)[1])
            if idx >= t5_cfg.num_decoder_layers - n_dec:
                sub = parts[3]
                if sub in ("self_attn", "self_ln", "cross_attn", "cross_ln"):
                    return "train"
            return "frozen"
        return "frozen"

    def setup_optimizer(self, steps_per_epoch: Optional[int] = None):
        cfg = self.config
        max_steps, warmup = resolve_steps(cfg, steps_per_epoch)
        if cfg["decay_power"] == "cosine":
            sched = warmup_cosine_schedule(cfg["learning_rate"], warmup,
                                           max_steps)
        else:
            sched = warmup_polynomial_schedule(
                cfg["learning_rate"], warmup, max_steps, cfg["end_lr"],
                float(cfg["decay_power"]))
        self.lr_fn = sched
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
        flat = flatten(self.params)
        labels = {p: self._trainable_label(p) for p in flat}
        n_train = sum(1 for v in labels.values() if v == "train")
        print(f"Trainable tensors: {n_train}/{len(labels)}")
        per_dev = cfg["per_gpu_batchsize"] or cfg["batch_size"]
        data_devices = self.mesh.devices.shape[0] * cfg.get("num_nodes", 1)
        self.grad_accum_steps = max(
            1, cfg["batch_size"] // (per_dev * data_devices))
        if (cfg.get("fused_optimizer", True)
                and cfg.get("optim_type", "adamw") == "adamw"):
            # frozen leaves carry no moments and pass through; native
            # accum; also avoids optax.multi_transform's MaskedNode
            # structure flip that forces a retrace+recompile on step 2
            # (see optim.py)
            from mm_vqa_healthcare_tpu.train.optim import LeafFusedAdamW
            self.tx = LeafFusedAdamW({"train": sched},
                                     {"train": cfg["weight_decay"]},
                                     unflatten(labels),
                                     accum_steps=self.grad_accum_steps,
                                     moments_dtype=cfg.get(
                                         "opt_moments_dtype", "float32"))
        else:
            self.tx = optax.multi_transform(
                {"train": optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                                      weight_decay=cfg["weight_decay"]),
                 "frozen": optax.set_to_zero()},
                unflatten(labels))
            if self.grad_accum_steps > 1:
                self.tx = optax.MultiSteps(
                    self.tx, every_k_schedule=self.grad_accum_steps)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        # commit the init state to the step's output shardings (rep) —
        # an uncommitted state retraces the jitted step on its second
        # (carried) call (mesh.opt_state_shardings; PERF.md batch19)
        self.opt_state = jax.device_put(
            self.opt_state,
            mesh_lib.opt_state_shardings(self.opt_state, self.params,
                                         self.mesh))

    # ------------------------------------------------------------------ steps
    def _train_step_fn(self, params, opt_state, batch, rng):
        from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch
        batch = prepare_image_batch(batch, self.image_mean, self.image_std,
                                    self.config["image_size"])
        _dt = self.config.get("compute_dtype", "float32")
        cast_dt = (jnp.dtype(_dt) if _dt != "float32"
                   and self.config.get("cast_params_once", True) else None)

        def loss_fn(p):
            if cast_dt is not None:
                from mm_vqa_healthcare_tpu.train.trainer import cast_floats
                p = cast_floats(p, cast_dt)
            # Frozen leaves (M3AE + non-top T5 layers) take no gradient —
            # stop_gradient lets XLA prune their whole backward, like the
            # reference's requires_grad=False (m3ae_t5_mm_encoder_input.py
            # :79-98); their optax updates were set_to_zero anyway, so the
            # parameter trajectory is identical.
            from mm_vqa_healthcare_tpu.checkpoint.convert import (
                flatten, unflatten)
            fp = flatten(p)
            p = unflatten({k: (jax.lax.stop_gradient(v)
                               if self._trainable_label(k) == "frozen" else v)
                           for k, v in fp.items()})
            logits = self.model.apply(
                p, batch, batch["t5_labels"], rng=jax.random.fold_in(rng, 1),
                deterministic=False, rngs={"dropout": rng})
            labels = batch["t5_labels"]
            # HF CE over all positions (labels keep pad=0; reference never
            # sets -100 — m3ae_t5_mm_encoder_input.py:234-248)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
            return nll.mean(), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if hasattr(self.tx, "update_fused"):
            params, opt_state = self.tx.update_fused(grads, opt_state, params)
        else:
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _encode_fn(self, params, batch, rng):
        from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch
        batch = prepare_image_batch(batch, self.image_mean, self.image_std,
                                    self.config["image_size"])
        return self.model.apply(params, batch, rng,
                                method=T5VQAModel.encode)

    def _get_jitted(self, name):
        if name not in self._jitted:
            rep = mesh_lib.replicated(self.mesh)
            data = mesh_lib.batch_sharding(self.mesh)
            from mm_vqa_healthcare_tpu.train.trainer import \
                xla_compiler_options
            copts = xla_compiler_options(self.config)
            if name == "train":
                self._jitted[name] = jax.jit(
                    self._train_step_fn,
                    in_shardings=(rep, rep, data, rep),
                    out_shardings=(rep, rep, rep),
                    donate_argnums=(0, 1),
                    compiler_options=copts)
            elif name == "encode":
                self._jitted[name] = jax.jit(
                    self._encode_fn, in_shardings=(rep, data, rep),
                    out_shardings=(data, data),
                    compiler_options=copts)
        return self._jitted[name]

    def _device_batch(self, batch, with_labels: bool):
        tok = self.t5_tokenizer
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
        if self.variant == "combined":
            q = tok(list(batch["text"]), padding="max_length",
                    truncation=True, max_length=self.config["max_text_len"],
                    add_special_tokens=False)
            arrays["t5_question_ids"] = np.asarray(q["input_ids"], np.int32)
        if with_labels:
            answers = [a[0] for a in batch["vqa_answer"]]
            enc = tok(answers, padding="max_length", truncation=True,
                      max_length=self.config["t5_max_length"])
            arrays["t5_labels"] = np.asarray(enc["input_ids"], np.int32)
        return mesh_lib.shard_batch(self.mesh, arrays)

    def _eval_params(self):
        """Params at eval precision: one-time compute-dtype cast, like the
        classifier eval step (trainer.py:_eval_step_fn) and the reference's
        fp16-AMP validation.  Feeding fp32 master params into generation
        ran the whole T5 stack (and the beam scan's cross K/V) at 2x the
        HBM traffic (PERF.md batch16)."""
        _dt = self.config.get("compute_dtype", "float32")
        if _dt == "float32":
            return self.params
        if "eval_cast" not in self._jitted:
            from mm_vqa_healthcare_tpu.train.trainer import cast_floats
            self._jitted["eval_cast"] = jax.jit(
                lambda p: cast_floats(p, jnp.dtype(_dt)))
        return self._jitted["eval_cast"](self.params)

    # --------------------------------------------------------------- generate
    def generate(self, batch_dev, rng) -> np.ndarray:
        tok = self.t5_tokenizer
        t5_cfg = self.model_cfg.t5
        if self.config.get("beam_impl", "host") == "device_onejit":
            return self._generate_onejit(batch_dev, rng)
        params = self._eval_params()
        enc, mask = self._get_jitted("encode")(params, batch_dev, rng)
        b = enc.shape[0]
        k = self.num_beams
        max_len = self.config["t5_max_length"]
        t5 = T5(t5_cfg)
        t5_params = {"params": params["params"]["t5"]}

        if "beam_step" not in self._jitted:
            # params flow through as a traced argument — a closure capture
            # would bake epoch-0 weights into the compiled step for the
            # rest of the run
            def step_fn(tokens, pos, cache, t5_params, enc_rep, mask_rep):
                return t5.apply(t5_params, tokens, pos, enc_rep, mask_rep,
                                cache, method=T5.decode_step)
            self._jitted["beam_step_raw"] = step_fn
            self._jitted["beam_step"] = jax.jit(step_fn)
            self._jitted["beam_reorder"] = jax.jit(
                lambda c, i: jax.tree_util.tree_map(lambda x: x[i], c))
        step = self._jitted["beam_step"]
        eos = (tok.eos_token_id if tok.eos_token_id is not None
               else tok.sep_token_id)
        if self.config.get("beam_impl", "host") == "device":
            # whole token loop as one jitted scan — no per-token host
            # round trips (decode/beam_device.py); token-identical to the
            # host HF protocol except bitwise score ties.  Cross K/V stay
            # at the encoder batch (beam-grouped cross-attention in
            # models/t5.py) — no K-repetition of the encoder memory.
            from mm_vqa_healthcare_tpu.decode.beam_device import (
                beam_search_device)
            cache = t5.apply(t5_params, b * k, max_len, enc,
                             method=T5.init_cache)
            return beam_search_device(
                self._jitted["beam_step_raw"], cache, b, k, max_len,
                eos_token_id=eos, pad_token_id=tok.pad_token_id,
                decoder_start_token_id=t5_cfg.decoder_start_token_id,
                jit_cache=self._jitted,
                step_args=(t5_params, enc, mask),
                cache_split=(T5.split_cache, T5.merge_cache))
        enc_rep = jnp.repeat(enc, k, axis=0)
        mask_rep = None if mask is None else jnp.repeat(mask, k, axis=0)
        cache = t5.apply(t5_params, b * k, max_len, enc_rep,
                         method=T5.init_cache)
        return beam_search(
            lambda t, p, c: step(t, p, c, t5_params, enc_rep, mask_rep),
            self._jitted["beam_reorder"], cache, b, k, max_len,
            eos_token_id=eos,
            pad_token_id=tok.pad_token_id,
            decoder_start_token_id=t5_cfg.decoder_start_token_id)

    def _generate_onejit(self, batch_dev, rng) -> np.ndarray:
        """beam_impl=device_onejit: encode + KV-cache init + the WHOLE
        beam scan as ONE jitted program — a single host round trip per
        batch (the split path pays one dispatch per phase; ~90 ms each on
        tunneled backends).  Token-identical to beam_impl=device
        (tests/test_t5_head.py)."""
        from mm_vqa_healthcare_tpu.decode.beam_device import (
            finalize_from_scan, scan_beam)
        tok = self.t5_tokenizer
        t5_cfg = self.model_cfg.t5
        k = self.num_beams
        max_len = self.config["t5_max_length"]
        eos = (tok.eos_token_id if tok.eos_token_id is not None
               else tok.sep_token_id)
        start = t5_cfg.decoder_start_token_id
        if "beam_onejit" not in self._jitted:
            t5 = T5(t5_cfg)

            def step_fn(tokens, pos, cache, tp, enc_rep, mask_rep):
                return t5.apply(tp, tokens, pos, enc_rep, mask_rep,
                                cache, method=T5.decode_step)

            _dt = self.config.get("compute_dtype", "float32")

            def onejit(params, batch_dev, rng):
                if _dt != "float32":
                    from mm_vqa_healthcare_tpu.train.trainer import \
                        cast_floats
                    params = cast_floats(params, jnp.dtype(_dt))
                enc, mask = self._encode_fn(params, batch_dev, rng)
                nb = enc.shape[0]          # static per trace; batch-size
                tp = {"params": params["params"]["t5"]}  # changes retrace
                # cross K/V at encoder batch (beam-grouped cross-attn)
                cache = t5.apply(tp, nb * k, max_len, enc,
                                 method=T5.init_cache)
                return scan_beam(step_fn, cache, (tp, enc, mask),
                                 nb, k, max_len, eos_token_id=eos,
                                 pad_token_id=tok.pad_token_id,
                                 decoder_start_token_id=start,
                                 length_penalty=1.0, early_stopping=True,
                                 cache_split=(T5.split_cache,
                                              T5.merge_cache))

            rep = mesh_lib.replicated(self.mesh)
            data = mesh_lib.batch_sharding(self.mesh)
            self._jitted["beam_onejit"] = jax.jit(
                onejit, in_shardings=(rep, data, rep))
        out = self._jitted["beam_onejit"](self.params, batch_dev, rng)
        return finalize_from_scan(
            out, int(out["beam_scores"].shape[0]), k, max_len,
            eos_token_id=eos, pad_token_id=tok.pad_token_id,
            decoder_start_token_id=start)

    # ------------------------------------------------------------------ loops
    def fit(self):
        cfg = self.config
        dm = self.setup_data()
        if self.params is None:
            self.init_params()
        steps_per_epoch = max(1, len(dm.dataset("train")) // dm.batch_size)
        if self.opt_state is None:
            self.setup_optimizer(steps_per_epoch)
        train_step = self._get_jitted("train")
        step = 0
        for epoch in range(cfg["max_epoch"]):
            from mm_vqa_healthcare_tpu.train.trainer import device_prefetch

            def to_dev(b):
                # host ground-truth strings ride along for train metrics
                return (self._device_batch(b, with_labels=True),
                        [a[0] for a in b["vqa_answer"]])

            batches = dm.train_loader(epoch)
            if cfg.get("overlap_h2d", True):
                batches = device_prefetch(batches, to_dev)
            else:
                batches = map(to_dev, batches)
            for dev_batch, truths in batches:
                rng = jax.random.fold_in(self.rng, step)
                self.params, self.opt_state, loss = train_step(
                    self.params, self.opt_state, dev_batch, rng)
                step += 1
                if step % cfg.get("log_every_n_steps", 10) == 0:
                    record = {"loss": float(jax.device_get(loss))}
                    if cfg.get("t5_generation", True):
                        # reference generates (beam 4) during training for
                        # metrics (m3ae_t5_mm_encoder_input.py:252-278);
                        # done at the logging cadence, not every step
                        tm = TextMetrics(self.t5_tokenizer,
                                         cfg.get("bug_compat", True))
                        seqs = self.generate(dev_batch, rng)
                        texts = self.t5_tokenizer.batch_decode(
                            seqs, skip_special_tokens=True)
                        tm.update(texts, truths[: len(texts)])
                        record.update(tm.compute())
                    self.logger.log_step("train", step, record)
                if cfg.get("fast_dev_run"):
                    break
            path = os.path.join(cfg.get("default_root_dir", "checkpoints"),
                                f"{cfg['exp_name']}_epoch{epoch}.msgpack")
            ckpt_io.save_native(path, self.params, cfg, {"epoch": epoch})
            if cfg.get("fast_dev_run"):
                break
        self.global_step = step
        return self.test()

    def test(self) -> Dict[str, float]:
        dm = self.setup_data()
        if self.params is None:
            self.init_params()
        tok = self.t5_tokenizer
        text_metrics = TextMetrics(tok, self.config.get("bug_compat", True))
        for batch in dm.test_loader():
            dev_batch = self._device_batch(batch, with_labels=False)
            seqs = self.generate(dev_batch, jax.random.key(0))
            real = batch.get("_real_count", seqs.shape[0])
            texts = tok.batch_decode(seqs[:real], skip_special_tokens=True)
            truths = [a[0] for a in batch["vqa_answer"][:real]]
            text_metrics.update(texts, truths)
            print(f"model output: {texts},\n labels: {truths}")
        metrics = {f"test/{k}": v for k, v in text_metrics.compute().items()}
        self.logger.log_step("test", self.global_step, metrics)
        print("TEST METRICS:", json.dumps(metrics, indent=2, sort_keys=True))
        return metrics
