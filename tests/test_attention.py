"""Attention kernel tests: the Pallas fused kernel (interpreter mode on CPU)
must match the XLA reference implementation in forward and backward, with
masks, cross-attention shapes, and padding-to-tile edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_vqa_healthcare_tpu.ops.attention import (
    _xla_attention, causal_bias, dot_product_attention,
    dot_product_attention_packed, extended_attention_mask)
from mm_vqa_healthcare_tpu.ops.flash_attention import fused_attention

_ON_TPU = jax.default_backend() == "tpu"
# On hardware, run the REAL Mosaic kernels in the parity tests (interpret
# mode would emulate them as plain jax ops) and compute the XLA references
# in true fp32 — the TPU default matmul precision is bf16-grade and shows
# up as ~3e-3 reference error, not kernel error.  The precision context
# must be SCOPED to the reference (a module-wide setting leaks into the
# pallas kernels' dot_generals and breaks Mosaic lowering: "Bad lhs type").
_INTERP = not _ON_TPU

# Tolerances are backend-aware: on CPU the interpreter runs every dot in
# fp32, so kernel-vs-reference parity is tight.  On hardware the kernels
# feed the MXU its native bf16 operand path (matching production bf16
# compute) while the _ref reference runs at HIGHEST precision — the honest
# gap is bf16 operand rounding, ~0.4% relative (measured max |diff| 0.012
# on O(2)-magnitude grads, batch31; wrong math would diff O(1)).
_FWD_TOL = (dict(atol=2e-2, rtol=1e-2) if _ON_TPU
            else dict(atol=1e-5, rtol=1e-5))
_BWD_TOL = dict(atol=3e-2) if _ON_TPU else dict(atol=2e-4)
# Tests that force interpret=True exercise CPU-interpreter semantics (the
# PRNG stub returns zero bits -> dropout degenerates to keep-all); on the
# TPU backend they would measure interpreter emulation, not the kernels.
_CPU_ONLY = pytest.mark.skipif(
    _ON_TPU, reason="forces interpret mode / CPU PRNG-stub semantics")


def _ref(fn, *args, **kwargs):
    with jax.default_matmul_precision("highest"):
        return fn(*args, **kwargs)


def _rand(shape, key):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("sq,sk", [(8, 8), (16, 48), (33, 129), (5, 577)])
def test_fused_matches_xla_forward(sq, sk):
    b, h, d = 2, 3, 64
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, h, sk, d), 1), _rand((b, h, sk, d), 2)
    mask = (jax.random.uniform(jax.random.key(3), (b, sk)) > 0.3).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)  # at least one valid key
    bias = extended_attention_mask(mask)
    ref = _ref(_xla_attention, q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=_INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_FWD_TOL)


def test_fused_matches_xla_no_bias():
    q, k, v = _rand((1, 2, 40, 32), 0), _rand((1, 2, 40, 32), 1), _rand((1, 2, 40, 32), 2)
    ref = _ref(_xla_attention, q, k, v, None)
    out = fused_attention(q, k, v, None, interpret=_INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_FWD_TOL)


def test_fused_causal():
    s = 24
    q, k, v = _rand((1, 2, s, 32), 0), _rand((1, 2, s, 32), 1), _rand((1, 2, s, 32), 2)
    bias = causal_bias(s)
    ref = _ref(_xla_attention, q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=_INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_FWD_TOL)


@pytest.mark.fast
def test_fused_backward_matches_xla():
    b, h, sq, sk, d = 2, 2, 17, 33, 32
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, h, sk, d), 1), _rand((b, h, sk, d), 2)
    mask = (jax.random.uniform(jax.random.key(5), (b, sk)) > 0.2).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    bias = extended_attention_mask(mask)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(_xla_attention, q, k, v, bias)))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fused_attention(q, k, v, bias, interpret=_INTERP)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), **_BWD_TOL)


def test_dispatch_auto_off_tpu_uses_xla():
    q = _rand((1, 1, 4, 8), 0)
    out = dot_product_attention(q, q, q, impl="auto")
    ref = _ref(_xla_attention, q, q, q, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_FWD_TOL)


def test_bf16_inputs():
    q, k, v = (_rand((1, 2, 16, 32), i).astype(jnp.bfloat16) for i in range(3))
    out = fused_attention(q, k, v, None, interpret=_INTERP)
    ref = _ref(_xla_attention, q, k, v, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_dropout_rate_zero_is_identity():
    q, k, v = (_rand((1, 2, 16, 32), i) for i in range(3))
    a = fused_attention(q, k, v, None, interpret=_INTERP)
    b = dot_product_attention(q, k, v, impl="xla", dropout_rate=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), **_FWD_TOL)


@_CPU_ONLY
def test_kernel_dropout_cpu_degenerate_and_grad():
    """On CPU the TPU-interpreter PRNG stub returns zero bits, so the
    in-kernel dropout degenerates to keep-all: out == attention / (1-p).
    Verifies the wiring + backward runs; real statistics are checked on
    TPU (test_kernel_dropout_statistics_tpu)."""
    q, k, v = (_rand((1, 2, 32, 32), i) for i in range(3))
    seed = jnp.asarray(1234, jnp.int32)
    out = fused_attention(q, k, v, None, interpret=True,
                          dropout_rate=0.5, dropout_seed=seed)
    ref = _ref(_xla_attention, q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref) / 0.5,
                               atol=1e-4)

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, None, interpret=True,
                                       dropout_rate=0.3, dropout_seed=seed))

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.tpu
def test_kernel_dropout_statistics_tpu():
    """Real-TPU PRNG: deterministic in seed, ~rate of prob mass dropped."""
    q, k, v = (_rand((1, 2, 64, 32), i) for i in range(3))
    seed = jnp.asarray(1234, jnp.int32)
    out1 = fused_attention(q, k, v, None, dropout_rate=0.5,
                           dropout_seed=seed)
    out2 = fused_attention(q, k, v, None, dropout_rate=0.5,
                           dropout_seed=seed)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = fused_attention(q, k, v, None, dropout_rate=0.5,
                           dropout_seed=jnp.asarray(99, jnp.int32))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # row sums of dropped+rescaled probs have mean ~1
    ones_v = jnp.ones_like(v)
    row = fused_attention(q, k, ones_v, None, dropout_rate=0.5,
                          dropout_seed=seed)
    mean = float(jnp.mean(row))
    assert 0.8 < mean < 1.2


# ---------------------------------------------------------------------------
# Packed-layout kernels ([B, S, H*D] operands, head axis in the lane dim)
# ---------------------------------------------------------------------------

def _packed_ref(q3, k3, v3, h, bias):
    from mm_vqa_healthcare_tpu.ops.attention import merge_heads, split_heads
    return merge_heads(_xla_attention(
        split_heads(q3, h), split_heads(k3, h), split_heads(v3, h), bias))


@pytest.mark.parametrize("sq,sk,h,d", [
    (16, 16, 2, 64), (33, 129, 3, 64), (5, 577, 12, 64), (32, 577, 12, 64),
    (16, 16, 2, 32),   # tiny_debug head_dim
])
@pytest.mark.fast
def test_packed_matches_xla_forward(sq, sk, h, d):
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention_packed)
    b = 2
    q3, k3, v3 = (_rand((b, s, h * d), i)
                  for i, s in enumerate((sq, sk, sk)))
    mask = (jax.random.uniform(jax.random.key(3), (b, sk)) > 0.3).astype(jnp.int32)
    mask = mask.at[:, 0].set(1)
    bias = extended_attention_mask(mask)
    ref = _ref(_packed_ref, q3, k3, v3, h, bias)
    out = fused_attention_packed(q3, k3, v3, h, bias, interpret=_INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_FWD_TOL)


@pytest.mark.fast
def test_packed_backward_matches_xla():
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention_packed)
    b, s, h, d = 2, 37, 4, 64
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    bias = extended_attention_mask(jnp.ones((b, s), jnp.int32))
    w = _rand((b, s, h * d), 9)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, h, bias,
                                              interpret=_INTERP) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(_packed_ref, q, k, v, h, bias) * w)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q3, k3, v3)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, k3, v3)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   err_msg=f"d{name}", **_BWD_TOL)


@_CPU_ONLY
def test_packed_dropout_cpu_degenerate_and_grad():
    """CPU TPU-interpreter PRNG stub -> keep-all: out == attn / (1-p);
    backward runs and matches the same degenerate scaling."""
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention_packed)
    b, s, h, d = 1, 24, 2, 64
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    p = 0.25
    out = fused_attention_packed(q3, k3, v3, h, None, interpret=True,
                                 dropout_rate=p,
                                 dropout_seed=jnp.int32(7))
    ref = _ref(_packed_ref, q3, k3, v3, h, None) / (1 - p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss(q):
        return jnp.sum(fused_attention_packed(
            q, k3, v3, h, None, interpret=True, dropout_rate=p,
            dropout_seed=jnp.int32(7)))
    g = jax.grad(loss)(q3)
    assert np.isfinite(np.asarray(g)).all()


def test_packed_head_block_lane_validity():
    """Mosaic requires lane-dim block sizes to be 128-multiples: the packed
    head-block chooser must never return a lane-invalid hb (regression:
    image-sized 592x640 dropout tiles used to fall to hb=1 -> 64-lane block
    -> TPU lowering error; the CPU interpreter doesn't enforce this)."""
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        _LANE, _SUBLANE, _round_up, _packed_head_block,
        _FWD_VMEM_BUDGET, _BWD_VMEM_BUDGET)
    # every (sq, sk, h, d, dropout) the model family actually runs
    shapes = [(32, 32), (64, 64), (577, 577), (32, 577), (577, 32),
              (129, 129), (129, 577), (325, 325), (325, 64), (64, 325)]
    for sq, sk in shapes:
        for h, d in ((12, 64), (8, 64), (2, 32), (16, 64)):
            sq_b = _round_up(max(sq, 8), _SUBLANE)
            sk_b = _round_up(max(sk, _LANE), _LANE)
            for dropout in (False, True):
                for n_f32, op, budget in ((3, 2, _FWD_VMEM_BUDGET),
                                          (5, 4, _BWD_VMEM_BUDGET)):
                    hb = _packed_head_block(h, sq_b, sk_b, d, n_f32, op,
                                            dropout, budget)
                    assert hb == 0 or (hb * d) % _LANE == 0, \
                        (sq, sk, h, d, dropout, hb)


@_CPU_ONLY
def test_packed_fallback_over_budget_matches_split():
    """When no lane-valid head block fits VMEM (image self-attention with
    dropout), fused_attention_packed must fall back to the split layout and
    stay numerically identical — fwd and bwd (per-absolute-head dropout
    seeding makes the mask layout-invariant)."""
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    b, sq, h, d = 1, 40, 4, 64
    q3, k3, v3 = (_rand((b, sq, h * d), i) for i in range(3))
    bias = extended_attention_mask(jnp.ones((b, sq), jnp.int32))
    w = _rand((b, sq, h * d), 9)
    p = 0.25

    def run():
        def loss(q, k, v):
            return jnp.sum(fa.fused_attention_packed(
                q, k, v, h, bias, interpret=True, dropout_rate=p,
                dropout_seed=jnp.int32(7)) * w)
        val = loss(q3, k3, v3)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q3, k3, v3)
        return jax.device_get((val, grads))

    val_packed, g_packed = run()
    # force the fallback by shrinking the budgets below any candidate
    old = fa._FWD_VMEM_BUDGET, fa._BWD_VMEM_BUDGET
    try:
        fa._FWD_VMEM_BUDGET = fa._BWD_VMEM_BUDGET = 1
        val_split, g_split = run()
    finally:
        fa._FWD_VMEM_BUDGET, fa._BWD_VMEM_BUDGET = old
    np.testing.assert_allclose(val_packed, val_split, rtol=1e-5)
    for a, b_, name in zip(g_packed, g_split, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, err_msg=f"d{name}")


@pytest.mark.parametrize("h,d", [
    (4, 32),   # swin head_dim: packed kernel, hb*d = 128
    (4, 64),   # clip-like: packed kernel, multi-head blocks
    (2, 8),    # lane-infeasible: exercises the split-kernel fallback
])
def test_periodic_batch_bias_fwd_bwd(h, d):
    """A bias with 1 < bb < B batch rows (bb dividing B) repeats with
    period bb over the batch grid — the swin shifted-window mask shape
    ([nW, H, N, N] against a [B*nW] window-batch axis).  Both kernel
    families must match a reference that tiles the bias to the full
    batch, in forward and backward."""
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention_packed)
    b, bb, s = 6, 3, 16
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    bias = _rand((bb, h, s, s), 7) * 3.0
    w = _rand((b, s, h * d), 9)
    tiled = jnp.tile(bias, (b // bb, 1, 1, 1))

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, h, bias,
                                              interpret=_INTERP) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(_packed_ref, q, k, v, h, tiled) * w)

    np.testing.assert_allclose(
        np.asarray(fused_attention_packed(q3, k3, v3, h, bias,
                                          interpret=_INTERP)),
        np.asarray(_ref(_packed_ref, q3, k3, v3, h, tiled)),
        **_FWD_TOL)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q3, k3, v3)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, k3, v3)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   err_msg=f"d{name}", **_BWD_TOL)


def test_periodic_batch_bias_must_divide():
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention_packed)
    q3, k3, v3 = (_rand((5, 16, 128), i) for i in range(3))
    bias = _rand((2, 4, 16, 16), 7)
    with pytest.raises(ValueError, match="divide"):
        fused_attention_packed(q3, k3, v3, 4, bias, interpret=True)


# ---------------------------------------------------------------------------
# Grouped-head mode for the packed kernels (MMVQA_ATTN_PACKED_GROUP)
# ---------------------------------------------------------------------------

def _with_group(monkeypatch, mode):
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    monkeypatch.setattr(fa, "_PACKED_GROUP", mode)
    return fa


@pytest.mark.parametrize("h,d,bb", [
    (8, 32, 1),    # swin window regime: many small heads, broadcast bias
    (8, 32, 3),    # + periodic (shifted-window) bias
    (4, 64, 1),    # clip head_dim
])
def test_packed_grouped_matches_ungrouped(monkeypatch, h, d, bb):
    """gb>1 batches gb heads into one dot_general; it must match the
    per-head loop exactly (same fp32 score math per head slice) in both
    forward and backward, including periodic-bias streaming."""
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    b, s = 6 if bb > 1 else 2, 16
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    bias = _rand((bb, h, s, s), 7) * 3.0 if bb > 1 else None
    w = _rand((b, s, h * d), 9)

    def run():
        def loss(q, k, v):
            return jnp.sum(fa.fused_attention_packed(
                q, k, v, h, bias, interpret=_INTERP) * w)
        out = fa.fused_attention_packed(q3, k3, v3, h, bias,
                                        interpret=_INTERP)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q3, k3, v3)
        return jax.device_get((out, grads))

    monkeypatch.setattr(fa, "_PACKED_GROUP", "0")
    out_1, g_1 = run()
    monkeypatch.setattr(fa, "_PACKED_GROUP", "auto")
    out_g, g_g = run()
    np.testing.assert_allclose(out_g, out_1, atol=1e-6, rtol=1e-6)
    for a, b_, name in zip(g_g, g_1, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, err_msg=f"d{name}")


@_CPU_ONLY
def test_packed_grouped_dropout_degenerate(monkeypatch):
    """Grouped dropout path runs fwd+bwd; on the CPU TPU-interpreter the
    PRNG stub keeps all, so out == attn / (1-p) exactly as ungrouped."""
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    b, s, h, d = 1, 24, 4, 32
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    p = 0.25
    monkeypatch.setattr(fa, "_PACKED_GROUP", "auto")
    out = fa.fused_attention_packed(q3, k3, v3, h, None, interpret=True,
                                    dropout_rate=p,
                                    dropout_seed=jnp.int32(7))
    ref = _ref(_packed_ref, q3, k3, v3, h, None) / (1 - p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss(q):
        return jnp.sum(fa.fused_attention_packed(
            q, k3, v3, h, None, interpret=True, dropout_rate=p,
            dropout_seed=jnp.int32(7)))
    g = jax.grad(loss)(q3)
    assert np.isfinite(np.asarray(g)).all()


def test_group_size_divides_and_respects_budget():
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    orig = fa._PACKED_GROUP
    try:
        fa._PACKED_GROUP = "0"
        assert fa._group_size(8, 144, 256, 3, False) == 1
        fa._PACKED_GROUP = "auto"
        for hb in (1, 2, 4, 8, 32):
            gb = fa._group_size(hb, 144, 256, 3, True)
            assert hb % gb == 0
            per = 144 * 256 * (4 * 3 + 6)
            assert gb * per <= fa._GROUP_SCORE_BUDGET or gb == 1
        fa._PACKED_GROUP = "2"
        assert fa._group_size(8, 16, 128, 3, False) == 2
    finally:
        fa._PACKED_GROUP = orig


@pytest.mark.fast
def test_custom_scale_matches_xla():
    """T5 convention: scale=1.0 (no 1/sqrt(d)).  The kernel's scale
    parameter must match the XLA path fwd AND bwd (packed + split)."""
    rng = np.random.default_rng(11)
    b, s, h, d = 2, 24, 4, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(1, h, s, s)), jnp.float32)

    def loss(impl):
        return lambda q: jnp.sum(dot_product_attention_packed(
            q, k, v, h, bias, impl=impl, scale=1.0) ** 2)

    out_pl = dot_product_attention_packed(q, k, v, h, bias, impl="pallas",
                                          scale=1.0)
    out_x = dot_product_attention_packed(q, k, v, h, bias, impl="xla",
                                         scale=1.0)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_x),
                               atol=2e-5)
    # scale actually matters: default (1/sqrt(d)) must differ
    out_def = dot_product_attention_packed(q, k, v, h, bias, impl="pallas")
    assert np.max(np.abs(np.asarray(out_def) - np.asarray(out_pl))) > 1e-3
    g_pl = jax.grad(loss("pallas"))(q)
    g_x = jax.grad(loss("xla"))(q)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_x), atol=5e-5)


# ---------------------------------------------------------------------------
# Window-batched grid for the packed kernels (MMVQA_ATTN_WB)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("h,d,bb,wb", [
    (8, 32, 1, "4"),    # broadcast bias, wb=4
    (8, 32, 4, "4"),    # periodic (shifted-window) bias, wb == period
    (8, 32, 4, "2"),    # periodic bias, wb < period (wb | bb)
])
def test_packed_window_batched_matches_wb1(monkeypatch, h, d, bb, wb):
    """wb>1 folds wb batch rows into one grid program (an outer kernel
    loop); forward and backward must match the wb=1 grid exactly,
    including the periodic-bias block streaming (bias block carries wb
    rows, indexed i % (bb//wb))."""
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    b, s = 8, 16
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    bias = _rand((bb, h, s, s), 7) * 3.0 if bb > 1 else None
    w = _rand((b, s, h * d), 9)

    def run():
        def loss(q, k, v):
            return jnp.sum(fa.fused_attention_packed(
                q, k, v, h, bias, interpret=_INTERP) * w)
        out = fa.fused_attention_packed(q3, k3, v3, h, bias,
                                        interpret=_INTERP)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q3, k3, v3)
        return jax.device_get((out, grads))

    monkeypatch.setattr(fa, "_PACKED_WB", "1")
    out_1, g_1 = run()
    monkeypatch.setattr(fa, "_PACKED_WB", wb)
    out_w, g_w = run()
    np.testing.assert_allclose(out_w, out_1, atol=1e-6, rtol=1e-6)
    for a, b_, name in zip(g_w, g_1, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-6, err_msg=f"d{name}")


@_CPU_ONLY
def test_packed_window_batched_dropout_stream_parity(monkeypatch):
    """Dropout seeds are per ABSOLUTE batch row (ab = i*wb + w), so the
    kept/dropped pattern is identical between wb grids — checked exactly
    on the interpreter where the PRNG stub is deterministic."""
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa
    b, s, h, d = 4, 16, 4, 32
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    seed = jnp.array(123, jnp.int32)

    def run():
        return jax.device_get(fa.fused_attention_packed(
            q3, k3, v3, h, None, interpret=True,
            dropout_rate=0.3, dropout_seed=seed))

    monkeypatch.setattr(fa, "_PACKED_WB", "1")
    out_1 = run()
    monkeypatch.setattr(fa, "_PACKED_WB", "4")
    out_w = run()
    np.testing.assert_array_equal(out_w, out_1)


# ---------------------------------------------------------------------------
# Bias-free kernels + the _norm_bias broadcast-q guard (round 4).
#
# The round-3 T5 cross-attention SIGABRT (q 12 x k 512, jellyfish
# 'Check failed: limits[i] <= dim(i)') was the ZERO-BIAS block spec — a
# bias with broadcast batch AND q axes — not the shape itself
# (run_scripts/probe_shortq.py: bias-free kernels compile at every probed
# shape on hardware).  These lock the two fixes: (a) bias=None streams no
# bias operand at all, (b) biases in the crash class ([1,1,1,Sk] /
# [1,H,1,Sk]) get their q axis materialized by _norm_bias.
# ---------------------------------------------------------------------------

def test_fused_no_bias_backward_matches_xla():
    b, h, sq, sk, d = 2, 2, 12, 96, 32
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, h, sk, d), 1), _rand((b, h, sk, d), 2)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(_xla_attention, q, k, v, None)))

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fused_attention(q, k, v, None,
                                               interpret=_INTERP)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), **_BWD_TOL)


def test_packed_no_bias_backward_matches_xla():
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention_packed)
    b, s, h, d = 2, 24, 4, 32
    q3, k3, v3 = (_rand((b, s, h * d), i) for i in range(3))
    w = _rand((b, s, h * d), 9)

    def loss_packed(q, k, v):
        return jnp.sum(fused_attention_packed(q, k, v, h, None,
                                              interpret=_INTERP) * w)

    def loss_ref(q, k, v):
        from mm_vqa_healthcare_tpu.ops.attention import (merge_heads,
                                                         split_heads)
        ctx = _ref(_xla_attention, split_heads(q, h), split_heads(k, h),
                   split_heads(v, h), None)
        return jnp.sum(merge_heads(ctx) * w)

    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(q3, k3, v3)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q3, k3, v3)
    for a, b_, name in zip(g_p, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   err_msg=f"d{name}", **_BWD_TOL)


@pytest.mark.parametrize("bias_shape", [(1, 1, 1, None), (1, 3, 1, None)])
def test_broadcast_q_bias_guard_fwd_bwd(bias_shape):
    """Crash-class biases (broadcast batch + q axes) route through the
    _norm_bias q-axis materialization and stay XLA-exact fwd + bwd."""
    b, h, sq, sk, d = 2, 3, 12, 64, 32
    bb, bh, bq, _ = bias_shape
    q, k, v = _rand((b, h, sq, d), 0), _rand((b, h, sk, d), 1), _rand((b, h, sk, d), 2)
    bias = _rand((bb, bh, bq, sk), 7)
    ref = _ref(_xla_attention, q, k, v, bias)
    out = fused_attention(q, k, v, bias, interpret=_INTERP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **_FWD_TOL)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fused_attention(q, k, v, bias,
                                               interpret=_INTERP)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_ref(_xla_attention, q, k, v, bias)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), **_BWD_TOL)


@pytest.mark.fast
def test_vmem_sizing_counts_operand_itemsize():
    """The head-block chooser must price operand blocks at their REAL
    itemsize: with bf16 pricing, the fp32 ViT-B cross-attention backward
    (sq 32, sk 577->640, d 64, h 12) picked hb=12 and overran the 16 MB
    scoped-vmem limit on the real chip at production shape (20.29M,
    result/r4_prod_compile_check.log).  fp32 must choose a strictly
    smaller block than bf16 whenever the bf16 choice was operand-bound."""
    from mm_vqa_healthcare_tpu.ops import flash_attention as fa

    kw = dict(n_f32=5, op_mult=4, dropout=True,
              budget=fa._BWD_VMEM_BUDGET)
    hb_bf16 = fa._packed_head_block(12, 32, 640, 64, itemsize=2, **kw)
    hb_fp32 = fa._packed_head_block(12, 32, 640, 64, itemsize=4, **kw)
    assert hb_bf16 >= 1 and hb_fp32 >= 1
    assert hb_fp32 < hb_bf16, (hb_fp32, hb_bf16)
    # split-layout chooser: same property
    sb = fa._head_block(12, 32, 640, 64, n_f32=5, op_mult=4, dropout=True,
                        budget=fa._BWD_VMEM_BUDGET, itemsize=2)
    sf = fa._head_block(12, 32, 640, 64, n_f32=5, op_mult=4, dropout=True,
                        budget=fa._BWD_VMEM_BUDGET, itemsize=4)
    assert sf <= sb
