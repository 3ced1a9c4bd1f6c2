"""Decoder-head trainer (reference main_decoder_m3ae.py + DecoderModel
train/test flow, m3ae_decoder.py:296-443).

Training: frozen M3AE encode -> teacher-forced decoder -> CE (pad-ignored)
on the golden targets; target construction matches m3ae_decoder.py:337-368
(BERT-tokenized answers, SEP->PAD in the shifted input).  The frozen
backbone is excluded from optimization via an optax set_to_zero partition
(torch skips grad-less params, same effect).

Test: KV-cached greedy search (decode/greedy.py) + text metrics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
from mm_vqa_healthcare_tpu.checkpoint import convert
from mm_vqa_healthcare_tpu.data.datamodule import MTDataModule
from mm_vqa_healthcare_tpu.decode.greedy import greedy_search
from mm_vqa_healthcare_tpu.models.decoder import Decoder
from mm_vqa_healthcare_tpu.models.decoder_model import (
    DecoderModelConfig, DecoderVQAModel)
from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
from mm_vqa_healthcare_tpu.train.objectives import cross_entropy_ignore
from mm_vqa_healthcare_tpu.train.trainer import xla_compiler_options
from mm_vqa_healthcare_tpu.train.optim import (
    resolve_steps, warmup_cosine_schedule, warmup_polynomial_schedule)
from mm_vqa_healthcare_tpu.utils.logging import MetricLogger
from mm_vqa_healthcare_tpu.utils.text_metrics import TextMetrics


class DecoderTrainer:
    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.mesh = mesh_lib.make_mesh(config.get("mesh_shape"))
        self.logger = MetricLogger(config.get("log_dir", "result"),
                                   config.get("exp_name", "decoder"))
        self.seed = config["seed"]
        from mm_vqa_healthcare_tpu.train.trainer import make_train_key
        self.rng = make_train_key(self.seed, config.get("rng_impl", "auto"))
        self.dm: Optional[MTDataModule] = None
        self.params = None
        self.opt_state = None
        self._jitted: Dict[str, Any] = {}
        self.global_step = 0
        self.max_answer_length = 12  # reference DecoderModel default
        from mm_vqa_healthcare_tpu.data.transforms import key_to_transform
        tkey = config["val_transform_keys"][0]
        tr = key_to_transform(
            tkey.replace("_randaug", "").replace("_resizedcrop", ""),
            config["image_size"])
        self.image_mean = np.asarray(tr.mean, np.float32)
        self.image_std = np.asarray(tr.std, np.float32)

    # --------------------------------------------------------------- plumbing
    def setup_model(self, tokenizer=None):
        """Tokenizer + model construction — no dataset required (the
        serving CLI cold-starts models without Arrow data)."""
        if getattr(self, "model", None) is None:
            from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
            self.tokenizer = tokenizer or load_tokenizer(
                self.config["tokenizer"], self.config.get("tokenizer_path", ""))
            # separate instance for target building: the loader prefetch
            # thread tokenizes questions concurrently, and HF fast
            # tokenizers are not thread-safe ("Already borrowed")
            self.target_tokenizer = load_tokenizer(
                self.config["tokenizer"], self.config.get("tokenizer_path", ""))
            self.model_cfg = DecoderModelConfig.from_dict(
                self.config, vocab_size=len(self.tokenizer))
            self.model = DecoderVQAModel(self.model_cfg)
        return self.model

    def setup_data(self):
        if self.dm is None:
            self.dm = MTDataModule(self.config,
                                   dist=jax.process_count() > 1,
                                   device_count=self.mesh.devices.shape[0])
            self.dm.setup()
            self.setup_model(self.dm.tokenizer)
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
        }
        t = self.max_answer_length - 1
        shifted = jnp.zeros((b, t), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        params = jax.jit(self.model.init)(
            {"params": jax.random.key(self.seed),
             "mim": jax.random.key(self.seed + 1)},
            batch, shifted, mask)
        # M3AE backbone weights from load_path (reference DecoderModel wraps
        # M3AETransformerSS(config) which loads them itself)
        if cfg.get("load_path"):
            m3ae_params = {"params": params["params"]["m3ae"]}
            m3ae_params, loaded, _ = convert.load_reference_checkpoint(
                cfg["load_path"], self.model_cfg.m3ae, m3ae_params)
            params = jax.tree_util.tree_map(lambda x: x, params)
            params["params"]["m3ae"] = m3ae_params["params"]
            print(f"Loaded {len(loaded)} backbone tensors")
        if cfg.get("decoder_load_path"):
            params, loaded = convert.load_decoder_head_checkpoint(
                cfg["decoder_load_path"], params,
                self.model_cfg.decoder.num_layers)
            print(f"Loaded {len(loaded)} decoder tensors")
        self.params = jax.device_put(params, mesh_lib.replicated(self.mesh))
        return self.params

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
        wd = cfg["weight_decay"]

        def leaf_label(path_key):
            name = ".".join(path_key)
            return "nd" if ("bias" in name or "LayerNorm" in name
                            or "norm" in name or name.endswith("scale")) \
                else "decay"

        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
        flat = flatten(self.params)
        labels = {}
        for path in flat:
            if path[1] == "m3ae":   # frozen backbone: no updates at all
                labels[path] = "frozen"
            else:
                labels[path] = leaf_label([str(p) for p in path])
        per_dev = cfg["per_gpu_batchsize"] or cfg["batch_size"]
        data_devices = self.mesh.devices.shape[0] * cfg.get("num_nodes", 1)
        self.grad_accum_steps = max(
            1, cfg["batch_size"] // (per_dev * data_devices))
        if (cfg.get("fused_optimizer", True)
                and cfg.get("optim_type", "adamw") == "adamw"):
            # one fused multi-output update per trainable leaf; frozen
            # leaves carry no moments and pass through; native accum (see
            # optim.py — also avoids optax.multi_transform's MaskedNode
            # structure flip that forces a retrace on step 2)
            from mm_vqa_healthcare_tpu.train.optim import LeafFusedAdamW
            self.tx = LeafFusedAdamW({"decay": sched, "nd": sched},
                                     {"decay": wd, "nd": 0.0},
                                     unflatten(labels),
                                     accum_steps=self.grad_accum_steps,
                                     moments_dtype=cfg.get(
                                         "opt_moments_dtype", "float32"))
        else:
            self.tx = optax.multi_transform(
                {"decay": optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                                      weight_decay=wd),
                 "nd": optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                                   weight_decay=0.0),
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

    # ---------------------------------------------------------- target build
    def build_targets(self, answers):
        """Reference m3ae_decoder.py:337-355: tokenize, drop last for the
        shifted input, SEP->PAD in shifted, golden = tokens[1:]."""
        tok = self.target_tokenizer
        enc = tok(answers, padding="max_length", truncation=True,
                  max_length=self.max_answer_length)
        tokens = np.asarray(enc["input_ids"], np.int32)
        shifted = tokens[:, :-1].copy()
        shifted[shifted == tok.sep_token_id] = tok.pad_token_id
        padding_mask = (shifted != tok.pad_token_id).astype(np.int32)
        golden = tokens[:, 1:].copy()
        return shifted, padding_mask, golden

    # ------------------------------------------------------------------ steps
    def _train_step_fn(self, params, opt_state, batch, rng):
        from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch
        batch = prepare_image_batch(batch, self.image_mean, self.image_std,
                                    self.config["image_size"])
        pad_id = self.tokenizer.pad_token_id
        _dt = self.config.get("compute_dtype", "float32")
        cast_dt = (jnp.dtype(_dt) if _dt != "float32"
                   and self.config.get("cast_params_once", True) else None)

        def loss_fn(p):
            if cast_dt is not None:
                from mm_vqa_healthcare_tpu.train.trainer import cast_floats
                p = cast_floats(p, cast_dt)
            # The M3AE backbone is frozen (reference DecoderModel sets
            # requires_grad=False, m3ae_decoder.py:213-216) — stop_gradient
            # prunes its entire backward from the step; its optax updates
            # were set_to_zero anyway, so numerics are unchanged.
            p = dict(p)
            pp = dict(p["params"])
            pp["m3ae"] = jax.lax.stop_gradient(pp["m3ae"])
            p["params"] = pp
            logits = self.model.apply(
                p, batch, batch["target_shifted"], batch["padding_mask"],
                deterministic=False, rngs={"dropout": rng})
            golden = batch["target_golden"]
            labels = jnp.where(golden == pad_id, -100, golden)
            loss = cross_entropy_ignore(logits, labels)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if hasattr(self.tx, "update_fused"):
            params, opt_state = self.tx.update_fused(grads, opt_state, params)
        else:
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        preds = jnp.argmax(logits, axis=-1)
        return params, opt_state, loss, preds

    def _eval_params(self):
        """Params at eval precision: one-time compute-dtype cast, like the
        classifier eval step (trainer.py:_eval_step_fn) and the reference's
        fp16-AMP validation — fp32 master params would otherwise run the
        whole decode at 2x the HBM traffic (PERF.md batch16)."""
        _dt = self.config.get("compute_dtype", "float32")
        if _dt == "float32":
            return self.params
        if "eval_cast" not in self._jitted:
            from mm_vqa_healthcare_tpu.train.trainer import cast_floats
            self._jitted["eval_cast"] = jax.jit(
                lambda p: cast_floats(p, jnp.dtype(_dt)))
        return self._jitted["eval_cast"](self.params)

    def _token_ids(self):
        tok = self.tokenizer
        return dict(cls_id=tok.cls_token_id, sep_id=tok.sep_token_id,
                    pad_id=tok.pad_token_id,
                    eos_id=getattr(tok, "eos_token_id", None))

    def _decode_fn(self, params, batch):
        from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch
        batch = prepare_image_batch(batch, self.image_mean, self.image_std,
                                    self.config["image_size"])
        enc = self.model.apply(params, batch, method=DecoderVQAModel.encode)
        decoder = Decoder(self.model_cfg.decoder)
        dec_params = {"params": params["params"]["decoder"]}
        return greedy_search(decoder, dec_params, enc, **self._token_ids())

    def _host_decode_fn(self):
        """Host-stepped greedy (identical tokens): jitted encoder + jitted
        per-token step, loop on host — sidesteps while_loop compile
        pathologies on remote-compiled runtimes (PERF.md)."""
        from mm_vqa_healthcare_tpu.decode.greedy import greedy_search_host
        from mm_vqa_healthcare_tpu.train.trainer import prepare_image_batch

        def _enc(p, b):
            b = prepare_image_batch(b, self.image_mean, self.image_std,
                                    self.config["image_size"])
            return self.model.apply(p, b, method=DecoderVQAModel.encode)

        encode = jax.jit(_enc)
        jit_cache = {}
        decoder = Decoder(self.model_cfg.decoder)

        def fn(params, batch):
            enc = encode(params, batch)
            dec_params = {"params": params["params"]["decoder"]}
            return greedy_search_host(decoder, dec_params, enc,
                                      jit_cache=jit_cache,
                                      **self._token_ids())
        return fn

    def _get_jitted(self, name):
        if name not in self._jitted:
            rep = mesh_lib.replicated(self.mesh)
            data = mesh_lib.batch_sharding(self.mesh)
            copts = xla_compiler_options(self.config)
            if name == "train":
                self._jitted[name] = jax.jit(
                    self._train_step_fn,
                    in_shardings=(rep, rep, data, rep),
                    out_shardings=(rep, rep, rep, data),
                    donate_argnums=(0, 1),
                    compiler_options=copts)
            else:
                if os.environ.get("MMVQA_HOST_DECODE") or \
                        self.config.get("host_decode"):
                    # host loop outside jit; only the encoder is jitted
                    # (inside greedy_search_host the step fn is jitted)
                    self._jitted[name] = self._host_decode_fn()
                else:
                    self._jitted[name] = jax.jit(
                        self._decode_fn, in_shardings=(rep, data),
                        out_shardings=data,
                        compiler_options=copts)
        return self._jitted[name]

    def _device_batch(self, batch, with_targets: bool):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
        if with_targets:
            answers = [a[0] for a in batch["vqa_answer"]]
            shifted, mask, golden = self.build_targets(answers)
            arrays["target_shifted"] = shifted
            arrays["padding_mask"] = mask
            arrays["target_golden"] = golden
        return mesh_lib.shard_batch(self.mesh, arrays)

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
        bug_compat = cfg.get("bug_compat", True)
        text_metrics = TextMetrics(self.tokenizer, bug_compat)
        step = 0
        max_epoch = cfg["max_epoch"]
        for epoch in range(max_epoch):
            from mm_vqa_healthcare_tpu.train.trainer import device_prefetch
            batches = dm.train_loader(epoch)
            if cfg.get("overlap_h2d", True):
                batches = device_prefetch(
                    batches, lambda b: self._device_batch(b, with_targets=True))
            else:
                batches = (self._device_batch(b, with_targets=True)
                           for b in batches)
            for dev_batch in batches:
                rng = jax.random.fold_in(self.rng, step)
                self.params, self.opt_state, loss, preds = train_step(
                    self.params, self.opt_state, dev_batch, rng)
                step += 1
                if step % cfg.get("log_every_n_steps", 10) == 0:
                    self.logger.log_step("train", step,
                                         {"loss": float(jax.device_get(loss))})
                if cfg.get("fast_dev_run"):
                    break
            # every-epoch checkpoint (reference save_top_k=-1,
            # main_decoder_m3ae.py:42-47)
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
        decode = self._get_jitted("decode")
        text_metrics = TextMetrics(self.tokenizer,
                                   self.config.get("bug_compat", True))
        for batch in dm.test_loader():
            dev_batch = self._device_batch(batch, with_targets=False)
            tokens = np.asarray(jax.device_get(
                decode(self._eval_params(), dev_batch)))
            real = batch.get("_real_count", tokens.shape[0])
            texts = [self.tokenizer.decode(seq, skip_special_tokens=True)
                     for seq in tokens[:real]]
            truths = [a[0] for a in batch["vqa_answer"][:real]]
            text_metrics.update(texts, truths)
            print(f"model output: {texts},\n labels: {truths}")
        metrics = {f"test/{k}": v for k, v in text_metrics.compute().items()}
        self.logger.log_step("test", self.global_step, metrics)
        print("TEST METRICS:", json.dumps(metrics, indent=2, sort_keys=True))
        return metrics
