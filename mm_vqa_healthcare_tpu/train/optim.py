"""Optimizer and LR schedules (reference m3ae/modules/m3ae_utils.py:112-242
`set_schedule` and m3ae_t5_utils.py:290-375 `set_schedule_decoder`).

Reproduces the reference's 6-way param grouping EXACTLY by labeling each
flax leaf with its *torch* parameter name (obtained from the checkpoint
converter's rule table) and applying the reference's substring tests
verbatim:

  no_decay     : "bias", "LayerNorm.bias", "LayerNorm.weight", "norm.bias",
                 "norm.weight", "norm1.*", "norm2.*"   (m3ae_utils.py:121-131)
  head_names   : mlm_head, mim_head, itm_head, vqa_head, cls_head, irtr_head
  multi_modal  : any name containing "multi_modal"

  group                     weight_decay   lr
  base                      wd             lr
  base/no-decay             0              lr
  head                      wd             lr * lr_multiplier_head
  head/no-decay             0              lr * lr_multiplier_head
  multi_modal               wd             lr * lr_multiplier_multi_modal
  multi_modal/no-decay      0              lr * lr_multiplier_multi_modal

Optimizer: AdamW(eps=1e-8, betas=(0.9, 0.98)) / Adam / SGD(momentum 0.9);
schedule: polynomial-decay-with-warmup (HF semantics) or cosine; fractional
warmup_steps = ratio of max_steps (m3ae_utils.py:222-224); gradient
accumulation via optax.MultiSteps (reference main.py:50 grad_steps).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_PATTERNS = ("bias", "LayerNorm.bias", "LayerNorm.weight",
                     "norm.bias", "norm.weight", "norm1.bias", "norm1.weight",
                     "norm2.bias", "norm2.weight")
HEAD_NAMES = ("mlm_head", "mim_head", "itm_head", "vqa_head", "cls_head",
              "irtr_head")
MULTI_MODAL_NAMES = ("multi_modal",)


def torch_name_map(params, model_cfg) -> Dict[tuple, str]:
    """flax leaf path -> reference torch param name, via converter rules."""
    from mm_vqa_healthcare_tpu.checkpoint.convert import build_rules, flatten
    rules = build_rules(model_cfg)
    by_path = {("params",) + fp: tk for tk, fp, _ in rules}
    flat = flatten(params)
    out = {}
    for path in flat:
        if path in by_path:
            out[path] = by_path[path]
        else:
            out[path] = ".".join(str(p) for p in path[1:])
    return out


def group_label(torch_name: str) -> str:
    nd = any(p in torch_name for p in NO_DECAY_PATTERNS)
    head = any(p in torch_name for p in HEAD_NAMES)
    mm = any(p in torch_name for p in MULTI_MODAL_NAMES)
    if head and not mm:
        return "head_nd" if nd else "head"
    if mm and not head:
        return "mm_nd" if nd else "mm"
    if mm and head:
        # reference's filters exclude params that are both; none exist in
        # practice — treat as head (first matching group)
        return "head_nd" if nd else "head"
    return "base_nd" if nd else "base"


def label_params(params, model_cfg):
    """Pytree of group labels matching the params structure."""
    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
    names = torch_name_map(params, model_cfg)
    flat = flatten(params)
    labels = {p: group_label(names[p]) for p in flat}
    return unflatten(labels)


def warmup_polynomial_schedule(lr: float, warmup_steps: int, total_steps: int,
                               end_lr: float = 0.0, power: float = 1.0):
    """HF get_polynomial_decay_schedule_with_warmup semantics."""
    total_steps = max(total_steps, 1)
    warmup_steps = max(warmup_steps, 0)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(1.0, warmup_steps)
        remaining = jnp.maximum(
            0.0, 1.0 - (step - warmup_steps) / jnp.maximum(
                1.0, total_steps - warmup_steps))
        decay = (lr - end_lr) * remaining ** power + end_lr
        return jnp.where(step < warmup_steps, warm, decay)
    return fn


def warmup_cosine_schedule(lr: float, warmup_steps: int, total_steps: int,
                           num_cycles: float = 0.5):
    """HF get_cosine_schedule_with_warmup semantics."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress)))
        return jnp.where(step < warmup_steps, warm, lr * cos)
    return fn


def resolve_steps(config: Dict[str, Any],
                  steps_per_epoch: Optional[int] = None):
    """(max_steps, warmup_steps) with fractional-warmup resolution."""
    max_steps = config["max_steps"]
    if max_steps is None or max_steps == -1:
        if steps_per_epoch is None:
            raise ValueError("max_steps=-1 needs steps_per_epoch")
        max_steps = steps_per_epoch * config["max_epoch"]
    warmup = config["warmup_steps"]
    if isinstance(warmup, float):
        warmup = int(max_steps * warmup)
    return int(max_steps), int(warmup)


def _single_group(optim_type: str, schedule, weight_decay: float):
    if optim_type == "adamw":
        return optax.adamw(learning_rate=schedule, b1=0.9, b2=0.98,
                           eps=1e-8, weight_decay=weight_decay)
    if optim_type == "adam":
        return optax.adam(learning_rate=schedule)
    if optim_type == "sgd":
        return optax.sgd(learning_rate=schedule, momentum=0.9)
    raise ValueError(optim_type)


class LeafFusedAdamW:
    """AdamW with ONE multi-output elementwise fusion per leaf (TPU perf).

    ``optax.multi_transform(adamw)`` lowers each leaf's update as a chain
    of separate tree_maps (moments, bias correction, weight decay,
    schedule scale, apply) — several HBM passes over every leaf.  Here the
    whole update (new_p, new_mu, new_nu) is a single expression per leaf,
    so XLA emits one fusion streaming g/m/v/p exactly once.  Unlike
    ``FusedAdamW`` (flat buffers) there is NO per-step concatenation — the
    round-2 ablation showed XLA does not fuse the big concats, and the
    flat-master-params autodiff variant materializes a full-size padded
    buffer per leaf in the backward (measured on the HLO), so per-leaf
    fusion is the efficient formulation.

    Numerics match ``optax.adamw`` bit-for-bit (same operand order, count+1
    bias correction, schedule(count) pre-increment, decoupled weight decay
    before the -lr scale) — tests/test_optim_fused.py.  Works under any
    sharding (leaves keep their placement; no cross-leaf ops).
    """

    def __init__(self, schedules, wds, labels,
                 b1: float = 0.9, b2: float = 0.98, eps: float = 1e-8,
                 accum_steps: int = 1, moments_dtype: Optional[str] = None):
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
        self._schedules = schedules          # group -> schedule(count)->lr
        self._wds = wds                      # group -> weight decay
        self._labels = flatten(labels)       # leaf path -> group
        self._b1, self._b2, self._eps = b1, b2, eps
        # Native gradient accumulation (optax.MultiSteps equivalent):
        # running-mean accumulators for trainable leaves, one lax.cond
        # applies the fused update every `accum_steps` micro-steps.
        # Replaces MultiSteps for the fused path — MultiSteps wraps
        # multi_transform, whose MaskedNode state structure flips between
        # init and the jitted update and forces a step-2 retrace.
        self._accum = max(1, int(accum_steps))
        # Moment STORAGE dtype (config `opt_moments_dtype`, DEVIATIONS
        # #13): "auto" -> bfloat16 on TPU / float32 elsewhere.  The
        # update arithmetic always runs fp32 inside the fusion (m/v are
        # upcast on read, rounded on store), so this trades one storage
        # rounding per step for 28->20 bytes/param of optimizer HBM
        # traffic — measured +2.1% on the driver train lane (batch46:
        # 193.2/193.3 vs 189.3, paired).  float32 remains bit-parity
        # with optax.adamw (tests/test_optim_fused.py) and is the
        # default off-TPU so CPU goldens stay exact.  Env
        # MMVQA_OPT_MOMENTS_DTYPE overrides for A/Bs.
        import os
        mdt = os.environ.get("MMVQA_OPT_MOMENTS_DTYPE",
                             moments_dtype or "float32")
        if mdt == "auto":
            mdt = ("bfloat16" if jax.default_backend() == "tpu"
                   else "float32")
        self._mdtype = jnp.dtype(mdt)

    @staticmethod
    def _is_float(x):
        return jnp.issubdtype(jnp.result_type(x), jnp.floating)

    def init(self, params):
        """Leaves labeled "frozen" get NO moments — update_fused passes
        them through untouched (the reference's requires_grad=False
        semantics for frozen backbones; optax.set_to_zero equivalent
        without the multi_transform MaskedNode structure, which is
        UNSTABLE between init and the jitted update's output and forces a
        full retrace+recompile on the second training step)."""
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
        fp = flatten(params)
        zeros = {k: jnp.zeros(v.shape, self._mdtype)
                 for k, v in fp.items()
                 if self._is_float(v) and self._labels.get(k) != "frozen"}
        state = {"count": jnp.zeros((), jnp.int32),
                 "mu": unflatten(zeros), "nu": unflatten(zeros)}
        if self._accum > 1:
            state["micro"] = jnp.zeros((), jnp.int32)
            state["acc"] = unflatten({k: jnp.zeros(v.shape, jnp.float32)
                                      for k, v in zeros.items()})
        return state

    def _leaf_updates(self, g32, fp, fmu, fnu, count):
        """The fused per-leaf AdamW math over the trainable leaves.

        g32: fp32 gradient (or accumulated mean) per trainable path.
        Returns (new_p, new_mu, new_nu) dicts over exactly fmu's paths.
        """
        count_inc = count + 1
        t = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.asarray(self._b1, jnp.float32) ** t
        bc2 = 1.0 - jnp.asarray(self._b2, jnp.float32) ** t
        lrs = {g: jnp.asarray(s(count), jnp.float32)
               for g, s in self._schedules.items()}
        new_p, new_mu, new_nu = {}, {}, {}
        for path in fmu:
            p = fp[path]
            label = self._labels[path]
            p32 = p.astype(jnp.float32)
            mu = (1.0 - self._b1) * g32[path] + self._b1 * fmu[path].astype(
                jnp.float32)
            nu = ((1.0 - self._b2) * (g32[path] * g32[path])
                  + self._b2 * fnu[path].astype(jnp.float32))
            u = (mu / bc1) / (jnp.sqrt(nu / bc2) + self._eps)
            wd = self._wds[label]
            if wd:
                u = u + wd * p32
            new_p[path] = (p32 - lrs[label] * u).astype(p.dtype)
            new_mu[path] = mu.astype(self._mdtype)
            new_nu[path] = nu.astype(self._mdtype)
        return new_p, new_mu, new_nu

    def update_fused(self, grads, state, params):
        """(grads, state, params) -> (new_params, new_state)."""
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
        count = state["count"]
        fg, fp = flatten(grads), flatten(params)
        fmu, fnu = flatten(state["mu"]), flatten(state["nu"])

        if self._accum <= 1:
            g32 = {k: fg[k].astype(jnp.float32) for k in fmu}
            up, umu, unu = self._leaf_updates(g32, fp, fmu, fnu, count)
            new_p = dict(fp)
            new_p.update(up)
            return unflatten(new_p), {"count": count + 1,
                                      "mu": unflatten(umu),
                                      "nu": unflatten(unu)}

        # ---- accumulation: running mean like optax.MultiSteps, apply on
        # the k-th micro-step via ONE cond (skip branch touches nothing)
        micro = state["micro"]
        facc = flatten(state["acc"])
        denom = (micro + 1).astype(jnp.float32)
        acc_new = {k: facc[k] + (fg[k].astype(jnp.float32) - facc[k]) / denom
                   for k in facc}
        is_apply = (micro + 1) >= self._accum
        fp_tr = {k: fp[k] for k in fmu}

        def apply_fn(ops):
            fp_, fmu_, fnu_, acc_, cnt = ops
            up, umu, unu = self._leaf_updates(acc_, fp_, fmu_, fnu_, cnt)
            zero_acc = {k: jnp.zeros_like(v) for k, v in acc_.items()}
            return up, umu, unu, zero_acc, cnt + 1

        def skip_fn(ops):
            fp_, fmu_, fnu_, acc_, cnt = ops
            return dict(fp_), dict(fmu_), dict(fnu_), dict(acc_), cnt

        up, umu, unu, acc_out, count_out = jax.lax.cond(
            is_apply, apply_fn, skip_fn, (fp_tr, fmu, fnu, acc_new, count))
        micro_out = jnp.where(is_apply, 0, micro + 1)
        new_p = dict(fp)
        new_p.update(up)
        return unflatten(new_p), {"count": count_out, "micro": micro_out,
                                  "mu": unflatten(umu),
                                  "nu": unflatten(unu),
                                  "acc": unflatten(acc_out)}


class FusedAdamW:
    """AdamW over per-group flat fp32 buffers (TPU perf).

    The per-leaf ``optax.multi_transform`` update lowers to ~2k tiny
    elementwise kernels at ~50% HBM efficiency — 21 ms/step vs the ~11 ms
    traffic floor on this workload (PERF.md profile).  Concatenating each
    group's leaves lets XLA emit a handful of large multi-output fusions
    that stream g/m/v/p through HBM exactly once, and ``update_fused``
    returns the new params directly so the ``optax.apply_updates``
    read-modify-write round-trip is folded into the same fusion.

    Numerics match ``optax.adamw`` bit-for-bit: same moment-update operand
    order, bias correction by count+1, lr from schedule(count) pre-
    increment, decoupled weight decay added before the -lr scale.  Only
    valid when params are mesh-replicated (pure DP) — flat concatenation
    of TP-sharded leaves would force gathers, so callers gate on the
    model-axis size.
    """

    def __init__(self, schedules, wds, labels,
                 b1: float = 0.9, b2: float = 0.98, eps: float = 1e-8):
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
        self._schedules = schedules          # group -> schedule(count)->lr
        self._wds = wds                      # group -> weight decay
        self._labels = flatten(labels)       # leaf path -> group
        self._b1, self._b2, self._eps = b1, b2, eps
        self._spec = None                    # group -> ordered leaf paths

    def _build_spec(self, flat_params):
        spec: Dict[str, list] = {}
        for path in sorted(flat_params):
            leaf = flat_params[path]
            if not jnp.issubdtype(jnp.result_type(leaf), jnp.floating):
                continue
            spec.setdefault(self._labels[path], []).append(path)
        return spec

    def init(self, params):
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten
        flat = flatten(params)
        self._spec = self._build_spec(flat)
        import numpy as _np
        sizes = {g: sum(int(_np.prod(flat[p].shape)) for p in paths)
                 for g, paths in self._spec.items()}
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": {g: jnp.zeros(n, jnp.float32) for g, n in sizes.items()},
            "nu": {g: jnp.zeros(n, jnp.float32) for g, n in sizes.items()},
        }

    def update_fused(self, grads, state, params):
        """(grads, state, params) -> (new_params, new_state)."""
        from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
        import numpy as _np
        fg, fp = flatten(grads), flatten(params)
        if self._spec is None:
            self._spec = self._build_spec(fp)
        count = state["count"]
        count_inc = count + 1
        tcount = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.asarray(self._b1, jnp.float32) ** tcount
        bc2 = 1.0 - jnp.asarray(self._b2, jnp.float32) ** tcount
        new_flat = dict(fp)
        new_mu, new_nu = {}, {}
        for g, paths in self._spec.items():
            gflat = jnp.concatenate(
                [fg[p].reshape(-1).astype(jnp.float32) for p in paths])
            pflat = jnp.concatenate(
                [fp[p].reshape(-1).astype(jnp.float32) for p in paths])
            mu = (1.0 - self._b1) * gflat + self._b1 * state["mu"][g]
            nu = (1.0 - self._b2) * (gflat * gflat) + self._b2 * state["nu"][g]
            u = (mu / bc1) / (jnp.sqrt(nu / bc2) + self._eps)
            wd = self._wds[g]
            if wd:
                u = u + wd * pflat
            lr = jnp.asarray(self._schedules[g](count), jnp.float32)
            pnew = pflat - lr * u
            off = 0
            for p in paths:
                n = int(_np.prod(fp[p].shape))
                new_flat[p] = pnew[off:off + n].reshape(
                    fp[p].shape).astype(fp[p].dtype)
                off += n
            new_mu[g], new_nu[g] = mu, nu
        return unflatten(new_flat), {"count": count_inc,
                                     "mu": new_mu, "nu": new_nu}


def build_optimizer(config: Dict[str, Any], params, model_cfg,
                    steps_per_epoch: Optional[int] = None,
                    grad_accum_steps: int = 1,
                    fused: Optional[bool] = None):
    """The full reference optimizer: 6 groups x schedule x grad-accum."""
    lr = config["learning_rate"]
    wd = config["weight_decay"]
    mult_head = config["lr_multiplier_head"]
    mult_mm = config["lr_multiplier_multi_modal"]
    max_steps, warmup = resolve_steps(config, steps_per_epoch)
    decay_power = config["decay_power"]
    end_lr = config["end_lr"]
    optim_type = config["optim_type"]

    def make_sched(group_lr):
        if decay_power == "cosine":
            return warmup_cosine_schedule(group_lr, warmup, max_steps)
        return warmup_polynomial_schedule(group_lr, warmup, max_steps,
                                          end_lr, float(decay_power))

    labels = label_params(params, model_cfg)
    use_fused = (fused if fused is not None
                 else config.get("fused_optimizer", True))
    if use_fused and optim_type == "adamw":
        scheds = {"base": make_sched(lr), "base_nd": make_sched(lr),
                  "head": make_sched(lr * mult_head),
                  "head_nd": make_sched(lr * mult_head),
                  "mm": make_sched(lr * mult_mm),
                  "mm_nd": make_sched(lr * mult_mm)}
        wds = {"base": wd, "base_nd": 0.0, "head": wd, "head_nd": 0.0,
               "mm": wd, "mm_nd": 0.0}
        if use_fused == "flat" and grad_accum_steps == 1:
            # flat-buffer variant: loses to per-leaf on this XLA version
            # (PERF.md round-2 ablation); kept for re-evaluation
            return FusedAdamW(scheds, wds, labels), make_sched(lr)
        return (LeafFusedAdamW(scheds, wds, labels,
                               accum_steps=grad_accum_steps,
                               moments_dtype=config.get(
                                   "opt_moments_dtype", "float32")),
                make_sched(lr))
    groups = {
        "base": _single_group(optim_type, make_sched(lr), wd),
        "base_nd": _single_group(optim_type, make_sched(lr), 0.0),
        "head": _single_group(optim_type, make_sched(lr * mult_head), wd),
        "head_nd": _single_group(optim_type, make_sched(lr * mult_head), 0.0),
        "mm": _single_group(optim_type, make_sched(lr * mult_mm), wd),
        "mm_nd": _single_group(optim_type, make_sched(lr * mult_mm), 0.0),
    }
    tx = optax.multi_transform(groups, labels)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx, make_sched(lr)


def build_single_lr_optimizer(config: Dict[str, Any], params,
                              steps_per_epoch: Optional[int] = None,
                              grad_accum_steps: int = 1,
                              learning_rate: Optional[float] = None):
    """Decoder/T5-head optimizer (reference m3ae_t5_utils.set_schedule_decoder
    :290-375): single LR, two groups (decay / no-decay by torch name)."""
    lr = learning_rate if learning_rate is not None else config["learning_rate"]
    wd = config["weight_decay"]
    max_steps, warmup = resolve_steps(config, steps_per_epoch)
    sched = warmup_polynomial_schedule(lr, warmup, max_steps,
                                       config["end_lr"],
                                       float(config["decay_power"])
                                       if config["decay_power"] != "cosine" else 1.0)

    def is_nd(path):
        name = ".".join(str(p) for p in path)
        return ("bias" in name or "LayerNorm" in name or "norm" in name
                or name.endswith("scale"))

    from mm_vqa_healthcare_tpu.checkpoint.convert import flatten, unflatten
    flat = flatten(params)
    labels = unflatten({p: ("nd" if is_nd(p) else "decay") for p in flat})
    tx = optax.multi_transform(
        {"decay": optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                              weight_decay=wd),
         "nd": optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                           weight_decay=0.0)},
        labels)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx, sched
