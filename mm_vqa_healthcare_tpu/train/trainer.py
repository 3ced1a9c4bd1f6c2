"""Training/eval driver for the M3AE classifier + pretraining paths.

Replaces the reference's PL Trainer wiring (main.py:17-82): grad-accum
computation `batch_size // (per_gpu_batchsize * num_devices)` (main.py:50),
best-checkpoint on val VQA score (ModelCheckpoint monitor val/the_metric,
max), deterministic seeding, fit -> test(best) or test-only.

TPU-native execution model: ONE jitted SPMD train step over a device mesh —
params replicated, batch sharded on the data axis, gradient mean inserted
by XLA from the sharding annotations; optax.MultiSteps for accumulation.
Host work per step is limited to collation + metric-sum accumulation.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mm_vqa_healthcare_tpu.checkpoint import io as ckpt_io
from mm_vqa_healthcare_tpu.checkpoint.convert import load_reference_checkpoint
from mm_vqa_healthcare_tpu.data.datamodule import MTDataModule
from mm_vqa_healthcare_tpu.data.transforms import key_to_transform
from mm_vqa_healthcare_tpu.models.m3ae import M3AE, M3AEConfig
from mm_vqa_healthcare_tpu.parallel import mesh as mesh_lib
from mm_vqa_healthcare_tpu.train import objectives
from mm_vqa_healthcare_tpu.train.optim import build_optimizer
from mm_vqa_healthcare_tpu.utils.logging import MetricLogger
from mm_vqa_healthcare_tpu.utils.text_metrics import TextMetrics


def xla_compiler_options(config=None):
    """Per-run XLA compiler options for the jitted steps, from env
    `MMVQA_XLA_OPTS="xla_tpu_foo=true,xla_tpu_bar=128"` (comma-separated
    key=value).  Compiler-level knobs only — numerics/parity are untouched;
    used by the perf sweeps (run_scripts/history/bench_batch42_tpu.sh) to
    A/B scheduler/vmem flags that XLA_FLAGS cannot reach through the
    remote axon compile path."""
    # TPU default (round 5): raise the compiler's scoped-VMEM heuristic
    # limit from 16 MB toward the chip's physical VMEM.  Measured +0.45
    # to +0.55% on the driver train lane (batch42 twice; batch45 lanes
    # 3/4 paired: 189.42 vs 188.58) and REQUIRED for the pretrain lane at
    # the 13 MB packed-bwd budget: the fusion vision-branch attention
    # backward at 325 tokens actually allocates 16.81 MB on-chip (batch44
    # lane-0 compile failure at the 16 MB default limit) while the
    # head-block estimator's working-set model says hb=2 fits.  EXCEPT
    # swin towers: their window kernels fit the 16 MB default and the
    # higher limit measured -1.9% there (batch45 lanes 1/2 paired: 150.55
    # vs 153.47) — XLA schedules prefetch buffering differently under the
    # larger scoped budget.  MMVQA_XLA_OPTS overrides the same key, so
    # A/Bs can force either direction (xla_tpu_scoped_vmem_limit_kib=...).
    opts = {}
    swin_tower = bool(config) and "swin" in str(config.get("vit", "")).lower()
    if jax.default_backend() == "tpu" and not swin_tower:
        opts["xla_tpu_scoped_vmem_limit_kib"] = "32768"
    s = os.environ.get("MMVQA_XLA_OPTS", "")
    opts.update({k: v for k, _, v in
                 (kv.partition("=") for kv in s.split(",") if kv)})
    return opts or None


def make_train_key(seed: int, rng_impl: str = "auto") -> jax.Array:
    """Training PRNG key.  impl "auto" picks the hardware RBG generator on
    TPU (threefry mask generation is a measurable slice of a dropout-heavy
    step; rbg bits come from the core's PRNG at ~vector rate) and threefry
    elsewhere (reproducible CPU goldens)."""
    if rng_impl == "auto":
        rng_impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
    if rng_impl == "threefry":
        rng_impl = "threefry2x32"
    return jax.random.key(seed, impl=rng_impl)


def cast_floats(tree, dtype):
    """Cast float32 leaves to dtype (one-time per-step mixed-precision cast)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32 else x, tree)


def prepare_image_batch(batch, mean, std, image_size: int):
    """In-jit device-side transform tail, shared by all trainers: uint8 ->
    normalized float, plus PIL-parity resize+crop when the batch carries
    `<key>_spec` resample specs (device_resize mode, ops/device_resize.py).
    Float image batches (host-side transforms) pass through untouched."""
    from mm_vqa_healthcare_tpu.ops.device_resize import resize_crop_batch
    mean = jnp.asarray(mean)
    std = jnp.asarray(std)
    out = dict(batch)
    for key in list(out):
        if not ("image" in key and not key.endswith("_spec")):
            continue
        if out[key].dtype == jnp.uint8:
            spec = out.pop(f"{key}_spec", None)
            if spec is not None:
                x = resize_crop_batch(out[key], spec, image_size) / 255.0
            else:
                x = out[key].astype(jnp.float32) / 255.0
            out[key] = (x - mean) / std
    return out


def device_prefetch(host_iter, to_device, depth: int = 2):
    """Double-buffered host->device pipeline: `to_device(batch N+1)` runs
    in a producer thread while the main thread dispatches step N, so the
    H2D transfer overlaps device compute.  The reference gets this for
    free from torch DataLoader workers + CUDA async copies; with explicit
    device_put it must be pipelined by hand — without it the realdata
    train lane on the bench host serializes a ~14 MB uint8 batch transfer
    (~100 MB/s tunnel) against every step.  depth bounds the number of
    batches in flight on device."""
    import queue
    import threading
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in host_iter:
                q.put(to_device(item))
        finally:
            q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item


def prepare_vqa_arrays(batch: Dict[str, Any], label_size: int) -> Dict[str, np.ndarray]:
    """Host-side: densify vqa_labels/scores into [B, label_size] soft targets
    (reference objectives.py:188-197) + answer types + validity mask."""
    out = {}
    if "vqa_labels" in batch:
        b = len(batch["vqa_labels"])
        targets = np.zeros((b, label_size), np.float32)
        for i, (labels, scores) in enumerate(
                zip(batch["vqa_labels"], batch["vqa_scores"])):
            for l, s in zip(labels, scores):
                targets[i, l] = s
        out["vqa_targets"] = targets
        out["answer_types"] = np.asarray(batch["answer_types"], np.int32)
    real = batch.get("_real_count")
    if real is not None:
        b = len(batch.get("vqa_labels", batch.get("text", []))) or None
        if b:
            valid = np.zeros(b, np.float32)
            valid[:real] = 1.0
            out["sample_valid"] = valid
    return out


class Trainer:
    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.model_cfg = M3AEConfig.from_dict(config)
        self.model = M3AE(self.model_cfg)
        self.mesh = mesh_lib.make_mesh(config.get("mesh_shape"))
        self.num_devices = int(np.prod([s for s in self.mesh.devices.shape]))
        import os as _os
        if config.get("debug_nans"):
            jax.config.update("jax_debug_nans", True)
        # run name {exp}-seed{N}-from_{ckpt} (reference main.py:31)
        from_name = _os.path.splitext(_os.path.basename(
            config.get("load_path", "")))[0] or "scratch"
        self.logger = MetricLogger(
            config.get("log_dir", "result"),
            f"{config.get('exp_name', 'exp')}-from_{from_name}",
            seed=config.get("seed", 0))
        self.seed = config["seed"]
        self.rng = make_train_key(self.seed, config.get("rng_impl", "auto"))
        self.label2ans = self._load_label2ans()
        self.dm: Optional[MTDataModule] = None
        self.params = None
        self.opt_state = None
        self._jitted: Dict[str, Any] = {}
        self._best_scores: Dict[str, Dict[str, float]] = {}
        self.global_step = 0
        # normalize constants for device-side transforms
        tkey = config["val_transform_keys"][0]
        tr = key_to_transform(tkey.replace("_randaug", "").replace("_resizedcrop", ""),
                              config["image_size"])
        self.image_mean = np.asarray(tr.mean, np.float32)
        self.image_std = np.asarray(tr.std, np.float32)

    # ------------------------------------------------------------------ setup
    def _load_label2ans(self):
        for root in (self.config.get("data_root", ""), "."):
            path = os.path.join(root, "label2ans.json") if root else "label2ans.json"
            if os.path.isfile(path):
                with open(path) as f:
                    return json.load(f)
        return None

    def setup_data(self):
        if self.dm is None:
            data_devices = self.mesh.devices.shape[0]
            self.dm = MTDataModule(self.config,
                                   dist=jax.process_count() > 1,
                                   device_count=data_devices)
            self.dm.setup()
        return self.dm

    def init_params(self):
        cfg = self.config
        shape = (1, cfg["image_size"], cfg["image_size"], 3)
        batch = {
            "text_ids": jnp.ones((1, cfg["max_text_len"]), jnp.int32),
            "text_masks": jnp.ones((1, cfg["max_text_len"]), jnp.int32),
            "image": jnp.zeros(shape, jnp.float32),
        }
        init_rngs = {"params": jax.random.key(self.seed),
                     "mim": jax.random.key(self.seed + 1)}
        # local_devices: under multi-process DP, jax.devices()[0] may be
        # another host's device; init runs per-host from the shared seed
        # (the reference's DDP model-replication invariant)
        with jax.default_device(jax.local_devices()[0]):
            params = jax.jit(self.model.init)(init_rngs, batch)
        if cfg.get("load_path"):
            params, loaded, missing = load_reference_checkpoint(
                cfg["load_path"], self.model_cfg, params)
            print(f"Loaded {len(loaded)} tensors from {cfg['load_path']} "
                  f"({len(missing)} not in ckpt)")
        elif cfg.get("bootstrap_towers"):
            # reference cold start: pretrained CLIP/Swin vision tower
            # (+ optional HF text tower) instead of random init
            from mm_vqa_healthcare_tpu.checkpoint.convert import (
                bootstrap_text_tower, bootstrap_vision_tower)
            params, loaded, _ = bootstrap_vision_tower(
                self.model_cfg, params,
                path=cfg.get("vision_pretrained_path") or None)
            print(f"Bootstrapped vision tower: {len(loaded)} tensors")
            if cfg.get("text_pretrained_path"):
                params, loaded, _ = bootstrap_text_tower(
                    self.model_cfg, params, cfg["text_pretrained_path"])
                print(f"Bootstrapped text tower: {len(loaded)} tensors")
        # TP-aware placement: params get model-axis partition specs
        # (pure replication when model=1) — jit propagates from these
        # committed shardings
        from mm_vqa_healthcare_tpu.parallel.partition import shard_params
        fsdp_kw = {}
        if cfg.get("fsdp_min_elems") is not None:
            fsdp_kw["fsdp_min_elems"] = cfg["fsdp_min_elems"]
        self.params = shard_params(self.mesh, params,
                                   fsdp=cfg.get("fsdp", False), **fsdp_kw)
        return self.params

    def setup_optimizer(self, steps_per_epoch: Optional[int] = None):
        cfg = self.config
        per_dev = (cfg["per_gpu_batchsize"] or cfg["batch_size"])
        data_devices = self.mesh.devices.shape[0] * cfg.get("num_nodes", 1)
        grad_steps = max(1, cfg["batch_size"] // (per_dev * data_devices))
        self.grad_accum_steps = grad_steps
        # "flat" (flat-buffer) only under pure DP (flat concat of
        # TP-sharded leaves would force gathers); the per-leaf fused
        # variant (True) keeps leaf placements and works under TP
        fused_ok = cfg.get("fused_optimizer", True)
        if fused_ok == "flat" and self.mesh.devices.shape[1] != 1:
            fused_ok = True
        self.tx, self.lr_fn = build_optimizer(
            cfg, self.params, self.model_cfg,
            steps_per_epoch=steps_per_epoch, grad_accum_steps=grad_steps,
            fused=fused_ok)
        self.opt_state = jax.jit(self.tx.init)(self.params)
        # commit the state to the shardings the train step will output —
        # an uncommitted init state changes the jit cache key on the
        # second (carried) step and forces a full retrace+recompile
        # (mesh.opt_state_shardings; PERF.md batch19 postmortem)
        self.opt_state = jax.device_put(
            self.opt_state,
            mesh_lib.opt_state_shardings(self.opt_state, self.params,
                                         self.mesh))

    # ------------------------------------------------------------ jitted steps
    def _device_prepare(self, batch):
        return prepare_image_batch(batch, self.image_mean, self.image_std,
                                   self.config["image_size"])

    @property
    def _step_cast_dtype(self):
        """compute_dtype if the one-time per-step param cast is on."""
        dt = self.model_cfg.compute_dtype
        if dt != "float32" and self.config.get("cast_params_once", True):
            return jnp.dtype(dt)
        return None

    def _train_step_fn(self, params, opt_state, batch, rng):
        import optax
        batch = self._device_prepare(batch)
        rngs = {"dropout": jax.random.fold_in(rng, 0),
                "mim": jax.random.fold_in(rng, 1),
                "itm": jax.random.fold_in(rng, 2)}
        cast_dt = self._step_cast_dtype

        def loss_fn(p):
            # one-time bf16 cast: every downstream per-use astype becomes a
            # no-op, the fwd/bwd GEMMs read half the HBM bytes, and grads
            # flow back through the cast as fp32 (mixed-precision master
            # params; losses are computed in fp32 in objectives.py)
            if cast_dt is not None:
                p = cast_floats(p, cast_dt)
            return objectives.compute_total_loss(
                self.model, p, batch, rngs, self.config["loss_names"],
                train=True)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if hasattr(self.tx, "update_fused"):
            params, opt_state = self.tx.update_fused(grads, opt_state, params)
        else:
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        aux = {k: v for k, v in aux.items()
               if not isinstance(v, jax.Array) or v.ndim == 0}
        aux["loss"] = loss
        return params, opt_state, aux

    def _eval_step_fn(self, params, batch):
        batch = self._device_prepare(batch)
        if self._step_cast_dtype is not None:
            params = cast_floats(params, self._step_cast_dtype)
        # fixed eval rngs: deterministic evaluation (the reference's val
        # MIM masking draws from torch's advancing global RNG — a
        # documented stream difference); "mim" is required whenever the
        # mim loss is active (val-time masked image modeling)
        loss, aux = objectives.compute_total_loss(
            self.model, params, batch,
            rngs={"itm": jax.random.key(0), "mim": jax.random.key(1)},
            loss_names=self.config["loss_names"], train=False)
        aux["loss"] = loss
        return aux

    def _get_jitted(self, name):
        if name in self._jitted:
            return self._jitted[name]
        # input shardings are inferred from the committed inputs (params
        # carry their TP/replicated placement, batches the data-axis
        # sharding); the train step PINS its params/opt outputs to the
        # input shardings so the carried state keeps the same cache key
        # (no step-2 retrace) and donation stays in-place
        if name == "train":
            assert self.params is not None and self.opt_state is not None, \
                "call init_params + setup_optimizer before the train step"
            leaf_sh = lambda tree: jax.tree_util.tree_map(
                lambda x: x.sharding, tree)
            fn = jax.jit(
                self._train_step_fn, donate_argnums=(0, 1),
                out_shardings=(leaf_sh(self.params),
                               leaf_sh(self.opt_state),
                               mesh_lib.replicated(self.mesh)),
                compiler_options=xla_compiler_options(self.config))
        elif name == "eval":
            fn = jax.jit(self._eval_step_fn,
                         compiler_options=xla_compiler_options(self.config))
        self._jitted[name] = fn
        return fn

    # ------------------------------------------------------------------ loops
    def _device_batch(self, batch):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
        arrays.update(prepare_vqa_arrays(
            batch, self.config["vqa_label_size"]))
        return mesh_lib.shard_batch(self.mesh, arrays)

    def fit(self):
        cfg = self.config
        dm = self.setup_data()
        steps_per_epoch = max(
            1, len(dm.dataset("train")) // (dm.batch_size))
        if self.params is None:
            self.init_params()
        if self.opt_state is None:
            self.setup_optimizer(steps_per_epoch)
        max_steps, _ = _resolved_steps(cfg, steps_per_epoch,
                                       self.grad_accum_steps)
        train_step = self._get_jitted("train")
        best_metric, best_path = -float("inf"), None
        micro_steps_total = max_steps * self.grad_accum_steps
        micro_step = 0
        epoch = 0
        ckpt_dir = cfg.get("default_root_dir", "checkpoints")
        last_path = os.path.join(ckpt_dir, f"{cfg['exp_name']}_last.ckpt")
        # resume_from: dead config key in the reference (config.py:93);
        # implemented here as full train-state restore (SURVEY.md §5)
        if cfg.get("resume_from"):
            self.params, self.opt_state, micro_step = \
                ckpt_io.load_train_state(cfg["resume_from"], self.params,
                                         self.opt_state)
            self.global_step = micro_step // self.grad_accum_steps
            print(f"Resumed from {cfg['resume_from']} at micro-step "
                  f"{micro_step}")
        # fractional val_check_interval (reference PL semantics: evaluate
        # every int(steps_per_epoch * interval) steps within the epoch)
        vci = cfg.get("val_check_interval", 1.0)
        val_every = (max(1, int(steps_per_epoch * vci))
                     if isinstance(vci, float) and vci < 1.0 else None)
        # PL Trainer(check_val_every_n_epoch=N) equivalent (default 1, the
        # reference never overrides it).  With tiny fixtures an "epoch" is
        # ~2 steps; validating + checkpointing every epoch through the axon
        # tunnel dominated the round-4 hardware overfit run's wall clock
        # (163 val passes for 326 steps) and pushed it past the wrapper
        # timeout — this knob exists so calibrated overfit runs can keep
        # per-epoch semantics elsewhere while validating every N epochs.
        val_every_n_epoch = int(cfg.get("check_val_every_n_epoch", 1))

        def run_validation():
            nonlocal best_metric, best_path
            val_metrics = self.evaluate("val")
            # ModelCheckpoint(monitor="val/the_metric") semantics: the vqa
            # score for the finetune tasks.  The reference's
            # m3ae_utils.epoch_wrapup never logs the_metric for the
            # pretrain losses (only m3ae_t5_utils does), so PL skips
            # best-saving there and test() runs the LAST weights — mirror
            # that by not tracking a best when the monitored key is absent
            # (defaulting it to 0.0 froze "best" at the first epoch and
            # made pretrain test() evaluate near-initial weights; caught
            # by tests/test_overfit.py::test_overfit_pretrain).
            the_metric = val_metrics.get("vqa/score")
            self.logger.log_step("val", self.global_step, val_metrics)
            if the_metric is None:
                return
            if the_metric > best_metric:
                best_metric = the_metric
                best_path = os.path.join(
                    ckpt_dir, f"{cfg['exp_name']}_best.msgpack")
                ckpt_io.save_native(best_path, self.params, cfg,
                                    {"step": self.global_step,
                                     "val_metric": the_metric})

        # optional jax.profiler capture of steps 3..8 (SURVEY.md §5 tracing
        # rebuild); set MMVQA_PROFILE_DIR to enable
        profile_dir = os.environ.get("MMVQA_PROFILE_DIR")
        t0 = time.time()
        while micro_step < micro_steps_total and epoch < cfg["max_epoch"]:
            batches = dm.train_loader(epoch)
            if cfg.get("overlap_h2d", True):
                batches = device_prefetch(batches, self._device_batch)
            else:
                batches = map(self._device_batch, batches)
            for dev_batch in batches:
                if profile_dir and micro_step == 3:
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and micro_step == 8:
                    jax.profiler.stop_trace()
                rng = jax.random.fold_in(self.rng, micro_step)
                self.params, self.opt_state, aux = train_step(
                    self.params, self.opt_state, dev_batch, rng)
                micro_step += 1
                self.global_step = micro_step // self.grad_accum_steps
                if micro_step % (cfg.get("log_every_n_steps", 10)
                                 * self.grad_accum_steps) == 0:
                    aux_host = jax.device_get(aux)
                    sps = (micro_step * dm.batch_size) / (time.time() - t0)
                    self.logger.log_step("train", self.global_step, {
                        "loss": float(aux_host["loss"]),
                        "samples_per_sec": sps,
                        "lr": float(self.lr_fn(self.global_step)),
                    })
                if (val_every and not cfg.get("fast_dev_run")
                        and micro_step % (val_every
                                          * self.grad_accum_steps) == 0):
                    run_validation()
                if micro_step >= micro_steps_total:
                    break
            epoch += 1
            epoch_boundary = (epoch % val_every_n_epoch == 0
                              or micro_step >= micro_steps_total
                              or epoch >= cfg["max_epoch"])
            if epoch_boundary:
                # save-last with optimizer state (resume point; the
                # reference's ModelCheckpoint keeps best + last,
                # main.py:37-44)
                ckpt_io.save_train_state(last_path, self.params,
                                         self.opt_state, micro_step, cfg)
                if not cfg.get("fast_dev_run"):
                    run_validation()
            if cfg.get("fast_dev_run"):
                break
        # load best before test (reference trainer.test(ckpt_path="best"))
        if best_path and os.path.isfile(best_path):
            self.params = ckpt_io.load_native(best_path, self.params)
        return self.test()

    def evaluate(self, split: str) -> Dict[str, float]:
        dm = self.setup_data()
        loader = dm.val_loader() if split == "val" else dm.test_loader()
        eval_step = self._get_jitted("eval")
        sums: Dict[str, float] = {}
        # dedicated tokenizer instance: the loader's prefetch thread uses
        # dm.tokenizer concurrently and HF fast tokenizers are not
        # thread-safe ("Already borrowed")
        if not hasattr(self, "_metrics_tokenizer"):
            from mm_vqa_healthcare_tpu.data.tokenization import load_tokenizer
            self._metrics_tokenizer = load_tokenizer(
                self.config["tokenizer"], self.config.get("tokenizer_path", ""))
        text_metrics = TextMetrics(tokenizer=self._metrics_tokenizer,
                                   bug_compat=self.config.get("bug_compat", True))
        for batch in loader:
            dev_batch = self._device_batch(batch)
            aux = jax.device_get(eval_step(self.params, dev_batch))
            for k, v in aux.items():
                if np.ndim(v) == 0:
                    sums[k] = sums.get(k, 0.0) + float(v)
            if "vqa_preds" in aux and self.label2ans is not None:
                real = batch.get("_real_count", len(aux["vqa_preds"]))
                preds = aux["vqa_preds"][:real]
                answers = [self.label2ans[str(int(p))] for p in preds]
                truths = [a for l in batch["vqa_answer"][:real] for a in l]
                text_metrics.update(answers, truths)
                if split == "test":
                    print(f"model output: {answers},\n labels: {truths}")
        metrics: Dict[str, float] = {}
        if "vqa_total" in sums and sums["vqa_total"] > 0:
            n = sums["vqa_total"]
            metrics["vqa/score"] = sums["vqa_score_sum"] / n
            if sums.get("vqa_close_total", 0) > 0:
                metrics["vqa/close_score"] = (
                    sums["vqa_close_score_sum"] / sums["vqa_close_total"])
            if sums.get("vqa_open_total", 0) > 0:
                metrics["vqa/open_score"] = (
                    sums["vqa_open_score_sum"] / sums["vqa_open_total"])
        if "mlm_total" in sums and sums["mlm_total"] > 0:
            metrics["mlm/accuracy"] = sums["mlm_correct"] / sums["mlm_total"]
        if "itm_total" in sums and sums["itm_total"] > 0:
            metrics["itm/accuracy"] = sums["itm_correct"] / sums["itm_total"]
        if "mim_loss_sum" in sums:
            metrics["mim/loss"] = sums["mim_loss_sum"]
        for k, v in text_metrics.compute().items():
            metrics[f"{split}/{k}"] = v
        # sticky best-score tracking across epochs (reference epoch_wrapup
        # score_best_epoch / close / open, m3ae_utils.py:66-75)
        if "vqa/score" in metrics:
            best = self._best_scores.setdefault(split, {"score": -1.0})
            if metrics["vqa/score"] > best["score"]:
                best["score"] = metrics["vqa/score"]
                best["close"] = metrics.get("vqa/close_score", 0.0)
                best["open"] = metrics.get("vqa/open_score", 0.0)
            metrics["vqa/score_best_epoch"] = best["score"]
            metrics["vqa/close_score_best_epoch"] = best.get("close", 0.0)
            metrics["vqa/open_score_best_epoch"] = best.get("open", 0.0)
        return metrics

    def test(self) -> Dict[str, float]:
        metrics = self.evaluate("test")
        self.logger.log_step("test", self.global_step, metrics)
        print("TEST METRICS:", json.dumps(metrics, indent=2, sort_keys=True))
        return metrics


def _resolved_steps(cfg, steps_per_epoch, grad_accum):
    max_steps = cfg["max_steps"]
    if max_steps is None or max_steps == -1:
        max_steps = steps_per_epoch * cfg["max_epoch"] // max(1, grad_accum)
    return int(max_steps), steps_per_epoch
