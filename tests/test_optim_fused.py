"""Fused flat-buffer AdamW (train/optim.py:FusedAdamW) must be numerically
identical to the reference-parity optax.multi_transform 6-group AdamW it
replaces — same moment math, bias correction, schedule stepping, decoupled
weight decay (reference m3ae_utils.py:112-242 set_schedule semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mm_vqa_healthcare_tpu.train.optim import (
    FusedAdamW, LeafFusedAdamW, warmup_polynomial_schedule)


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    params = {
        "enc": {"w": mk(8, 16), "b": mk(16), "ln": {"scale": mk(16)}},
        "head": {"w": mk(16, 4), "b": mk(4)},
        "mm": {"w": mk(16, 16)},
    }
    labels = {
        "enc": {"w": "base", "b": "base_nd", "ln": {"scale": "base_nd"}},
        "head": {"w": "head", "b": "head_nd"},
        "mm": {"w": "mm"},
    }
    return params, labels


def _grads(params, seed):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), x.dtype), params)


@pytest.mark.parametrize("cls", [FusedAdamW, LeafFusedAdamW])
@pytest.mark.fast
def test_fused_adamw_matches_optax_exactly(cls):
    params, labels = _tree()
    lr, wd, mh, mm = 1e-3, 0.01, 50.0, 5.0
    sched = lambda m: warmup_polynomial_schedule(lr * m, 2, 10)
    scheds = {"base": sched(1), "base_nd": sched(1), "head": sched(mh),
              "head_nd": sched(mh), "mm": sched(mm), "mm_nd": sched(mm)}
    wds = {"base": wd, "base_nd": 0.0, "head": wd, "head_nd": 0.0,
           "mm": wd, "mm_nd": 0.0}
    fused = cls(scheds, wds, labels)

    mk_adamw = lambda s, w: optax.adamw(s, b1=0.9, b2=0.98, eps=1e-8,
                                        weight_decay=w)
    ref_tx = optax.multi_transform(
        {g: mk_adamw(scheds[g], wds[g]) for g in scheds}, labels)

    p_f, s_f = params, fused.init(params)
    p_r, s_r = params, ref_tx.init(params)
    for step in range(5):
        grads = _grads(params, 100 + step)
        p_f, s_f = jax.jit(fused.update_fused)(grads, s_f, p_f)
        upd, s_r = ref_tx.update(grads, s_r, p_r)
        p_r = optax.apply_updates(p_r, upd)
        for path, a in jax.tree_util.tree_leaves_with_path(p_f):
            b = {tuple(k.key for k in p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(p_r)}[
                     tuple(k.key for k in path)]
            # 1-2 ULP: XLA emits fma for (p - lr*u) in the fused kernel
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-7, atol=5e-7,
                                       err_msg=f"step {step} {path}")


@pytest.mark.parametrize("cls", [FusedAdamW, LeafFusedAdamW])
@pytest.mark.fast
def test_fused_adamw_skips_non_float_leaves(cls):
    params = {"w": jnp.ones((4, 4), jnp.float32),
              "steps": jnp.zeros((), jnp.int32)}
    labels = {"w": "base", "steps": "base"}
    sched = warmup_polynomial_schedule(1e-3, 0, 10)
    fused = cls({"base": sched}, {"base": 0.01}, labels)
    state = fused.init(params)
    grads = {"w": jnp.ones((4, 4), jnp.float32),
             "steps": jnp.zeros((), jnp.int32)}
    new_p, _ = fused.update_fused(grads, state, params)
    assert new_p["steps"] == params["steps"]
    assert not np.allclose(new_p["w"], params["w"])


@pytest.mark.slow
def test_trainer_fused_matches_multitransform(tmp_path):
    """End-to-end: two tiny train steps with fused on vs off give the same
    params (the jitted step, cast-once mixed precision, and grouping all
    route through the same math)."""
    from tests import fixtures
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    root = str(tmp_path)
    data_root, label2ans, vocab = fixtures.make_vqa_fixture(root)

    def run(fused):
        cfg = fixtures.tiny_config(data_root, vocab, max_steps=2,
                                   fused_optimizer=fused)
        t = Trainer(cfg)
        t.setup_data()
        t.init_params()
        t.setup_optimizer(steps_per_epoch=2)
        dm = t.dm
        step = t._get_jitted("train")
        params, opt_state = t.params, t.opt_state
        for i, batch in enumerate(dm.train_loader(0)):
            dev = t._device_batch(batch)
            rng = jax.random.fold_in(t.rng, i)
            params, opt_state, _ = step(params, opt_state, dev, rng)
            if i == 1:
                break
        return jax.device_get(params)

    p_fused, p_ref = run(True), run(False)
    flat_f = {tuple(str(k.key) for k in p): v for p, v in
              jax.tree_util.tree_leaves_with_path(p_fused)}
    flat_r = {tuple(str(k.key) for k in p): v for p, v in
              jax.tree_util.tree_leaves_with_path(p_ref)}
    assert flat_f.keys() == flat_r.keys()
    for k in flat_f:
        np.testing.assert_allclose(flat_f[k], flat_r[k], rtol=0, atol=2e-6,
                                   err_msg=str(k))


@pytest.mark.fast
def test_leaf_fused_frozen_passthrough_and_stable_structure():
    """Frozen leaves: no moments allocated, params pass through unchanged;
    and the opt-state pytree structure is IDENTICAL between init and the
    jitted update's output (optax.multi_transform's MaskedNode placement
    is not — it forces a retrace+recompile on the second training step,
    the batch19 postmortem)."""
    params, labels = _tree()
    labels = dict(labels)
    labels["enc"] = jax.tree.map(lambda _: "frozen", labels["enc"])
    sched = warmup_polynomial_schedule(1e-3, 0, 10)
    groups = ["base", "base_nd", "head", "head_nd", "mm", "mm_nd"]
    fused = LeafFusedAdamW({g: sched for g in groups},
                           {g: 0.01 for g in groups}, labels)
    state = fused.init(params)
    # no moments for the frozen subtree
    assert "enc" not in state["mu"] or not state["mu"].get("enc")
    grads = _grads(params, 7)
    new_p, new_s = jax.jit(fused.update_fused)(grads, state, params)
    # frozen params unchanged bitwise
    for k in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(new_p["enc"][k] if k != "ln"
                                                 else 0),
                                      np.asarray(params["enc"][k] if k != "ln"
                                                 else 0))
    np.testing.assert_array_equal(np.asarray(new_p["enc"]["ln"]["scale"]),
                                  np.asarray(params["enc"]["ln"]["scale"]))
    # trainable params moved
    assert not np.allclose(np.asarray(new_p["head"]["w"]),
                           np.asarray(params["head"]["w"]))
    # state structure is stable across the update (no retrace trigger)
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(new_s))


def test_leaf_fused_accum_matches_multisteps():
    """Native accumulation == optax.MultiSteps(multi_transform) trajectory
    (running-mean grads, apply every k, schedule stepped per APPLIED step),
    including frozen leaves."""
    k = 3
    params, labels = _tree()
    labels = dict(labels)
    labels["mm"] = {"w": "frozen"}
    sched = warmup_polynomial_schedule(1e-3, 2, 10)
    groups = ["base", "base_nd", "head", "head_nd"]
    fused = LeafFusedAdamW({g: sched for g in groups},
                           {g: (0.01 if not g.endswith("_nd") else 0.0)
                            for g in groups},
                           labels, accum_steps=k)
    mk_adamw = lambda w: optax.adamw(sched, b1=0.9, b2=0.98, eps=1e-8,
                                     weight_decay=w)
    ref_tx = optax.MultiSteps(
        optax.multi_transform(
            {"base": mk_adamw(0.01), "base_nd": mk_adamw(0.0),
             "head": mk_adamw(0.01), "head_nd": mk_adamw(0.0),
             "frozen": optax.set_to_zero()}, labels),
        every_k_schedule=k)

    p_f, s_f = params, fused.init(params)
    p_r, s_r = params, ref_tx.init(params)
    jit_f = jax.jit(fused.update_fused)
    for micro in range(2 * k + 1):   # crosses two applies + one partial
        grads = _grads(params, 200 + micro)
        p_f, s_f = jit_f(grads, s_f, p_f)
        upd, s_r = ref_tx.update(grads, s_r, p_r)
        p_r = optax.apply_updates(p_r, upd)
        flat_f = {tuple(str(kk.key) for kk in p): v for p, v in
                  jax.tree_util.tree_leaves_with_path(p_f)}
        flat_r = {tuple(str(kk.key) for kk in p): v for p, v in
                  jax.tree_util.tree_leaves_with_path(p_r)}
        for kk in flat_f:
            np.testing.assert_allclose(
                np.asarray(flat_f[kk]), np.asarray(flat_r[kk]),
                rtol=1e-6, atol=1e-6, err_msg=f"micro {micro} {kk}")
    # frozen leaf never moved
    np.testing.assert_array_equal(np.asarray(p_f["mm"]["w"]),
                                  np.asarray(params["mm"]["w"]))


@pytest.mark.slow
def test_trainer_fused_accum_matches_multisteps(tmp_path):
    """End-to-end with grad_accum_steps=2 (reference recipes: batch 64,
    per-gpu 8, accum 8 — main.py:50): the fused native-accum path gives
    the same params as optax.MultiSteps over the same micro-batches."""
    from tests import fixtures
    from mm_vqa_healthcare_tpu.train.trainer import Trainer

    root = str(tmp_path)
    data_root, label2ans, vocab = fixtures.make_vqa_fixture(root)

    def run(fused):
        cfg = fixtures.tiny_config(data_root, vocab, max_steps=2,
                                   fused_optimizer=fused,
                                   batch_size=8)   # accum = 8/(2*2) = 2
        t = Trainer(cfg)
        t.setup_data()
        t.init_params()
        t.setup_optimizer(steps_per_epoch=2)
        assert t.grad_accum_steps == 2
        step = t._get_jitted("train")
        params, opt_state = t.params, t.opt_state
        batches = []
        for i, batch in enumerate(t.dm.train_loader(0)):
            batches.append(batch)
            if i == 3:
                break
        for i, batch in enumerate(batches):
            dev = t._device_batch(batch)
            rng = jax.random.fold_in(t.rng, i)
            params, opt_state, _ = step(params, opt_state, dev, rng)
        return jax.device_get(params)

    p_fused, p_ref = run(True), run(False)
    flat_f = {tuple(str(k.key) for k in p): v for p, v in
              jax.tree_util.tree_leaves_with_path(p_fused)}
    flat_r = {tuple(str(k.key) for k in p): v for p, v in
              jax.tree_util.tree_leaves_with_path(p_ref)}
    assert flat_f.keys() == flat_r.keys()
    for k in flat_f:
        np.testing.assert_allclose(flat_f[k], flat_r[k], rtol=0, atol=2e-6,
                                   err_msg=str(k))
