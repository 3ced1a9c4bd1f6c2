"""Fused attention Pallas kernels for TPU.

Design notes (TPU-first, not a port — the reference computes attention with
eager torch matmuls that materialize the [B,H,Sq,Sk] score tensor in HBM):

The sequence lengths in this workload are short (text <= 64 tokens, image
<= 577 patches @384/16, decoder <= 129): a full [Sq, Sk] score tile fits in
VMEM, so instead of a streaming flash-attention with running max/denominator
the optimal kernel is a *single-tile fused attention*: each grid step
computes QK^T, the masked softmax, and PV entirely in VMEM — scores never
touch HBM in either direction.

v2 (round 2, from the round-1 profile — pad/copy ops around the kernels
were ~15% of the train step):
  * NO host-side padding.  Blocks deliberately overrun the 577-length
    arrays (Pallas tail-masks the reads/writes); key validity is enforced
    in-kernel with an iota mask, and the backward additionally zeroes
    overhanging query rows so OOB garbage cannot leak into dK/dV.
  * Head-blocked grid: (batch, heads/hb) programs, hb chosen per shape as
    the largest head-count whose fp32 score tile fits a VMEM budget
    (12 heads/program for text-sized tiles, 2 for 577x640 image tiles).
  * Dropout PRNG is seeded PER HEAD (not per program), so the mask is
    bit-identical between forward and backward even when they pick
    different hb.

Numerics: scores/softmax in float32 (matches the reference's fp16-safe
behavior), matmuls take native (bf16) operands with fp32 accumulation —
full-rate MXU.  The backward recomputes probabilities (FLOPs are cheap next
to the HBM traffic of stashing [B,H,Sq,Sk] residuals).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANE = 128
_SUBLANE = 16
# VMEM budgets (bytes) for the per-program working set; the core has
# ~16 MB scoped VMEM, leave headroom for Mosaic internals.  The bwd
# budget is 13 MB (round-4 batch43): at 10 MB the fusion image-branch
# self-attention backward (584x640 fp32 score family + dropout bits =
# 12.2 MB at the minimum lane-valid hb=2) fell back to the split layout
# and paid the [B,577,12,64] relayout copies — 13 MB lets it stay packed
# and Mosaic accepts the real allocation on-chip (driver lane 179.6 ->
# 188.0 samples/s, step 178.2 -> 170.2 ms; a 24 MB budget with
# xla_tpu_scoped_vmem_limit_kib=32768 adds nothing further).
_FWD_VMEM_BUDGET = int(os.environ.get("MMVQA_ATTN_FWD_BUDGET", 12 * 2 ** 20))
_BWD_VMEM_BUDGET = int(os.environ.get("MMVQA_ATTN_BWD_BUDGET", 13 * 2 ** 20))
# Default ON (round-2 batch7: +9 samples/s train, +27 eval): Mosaic's
# allocator reuses the per-head loop buffers, so the fp32 score family
# is live once per program, letting image self-attention (dropout) pack.
_PACKED_PERHEAD = os.environ.get("MMVQA_ATTN_PACKED_PERHEAD", "1") == "1"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_block(h: int, sq_b: int, sk_b: int, d: int,
                n_f32: int, op_mult: int, dropout: bool,
                budget: int, itemsize: int = 2) -> int:
    """Largest divisor of h whose per-program VMEM working set fits.

    Counts: fp32 score-family buffers (n_f32 of them), the dropout
    bits+mask, and the operand blocks at their actual `itemsize` (bf16=2,
    fp32=4 — the fp32 undercount was the prod-shape vmem OOM,
    result/r4_prod_compile_check.log) — whose minor dim is lane-PADDED by
    Mosaic (d=64 tiles occupy 128 lanes) and double-buffered across grid
    steps (x2)."""
    d_eff = _round_up(d, _LANE)
    per = sq_b * sk_b * 4 * n_f32
    if dropout:
        per += sq_b * sk_b * 6          # uint32 bits + bool keep-ish
    per += op_mult * (sq_b + sk_b) * d_eff * itemsize * 2
    for hb in range(h, 0, -1):
        if h % hb == 0 and hb * per <= budget:
            return hb
    return 1


def _dropout_keep_mask(shape, rate):
    """keep iff bits < (1-rate)*2^32 — chosen so the CPU TPU-interpreter
    (whose prng stub returns zeros) degenerates to keep-all rather than
    drop-all; real-TPU bits are uniform, P(keep) = 1-rate."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    threshold = jnp.uint32(min(int((1.0 - rate) * float(2 ** 32)),
                               2 ** 32 - 1))
    return bits < threshold


def _per_head_keep(shape_hb, rate, seed_ref, num_heads, hb):
    """[hb, SQ, SK] keep-mask, seeded per absolute head index so the mask
    is invariant to the fwd/bwd head-block choice."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    keeps = []
    for t in range(hb):
        head = j * hb + t
        pltpu.prng_seed(seed_ref[0], i * num_heads + head)
        keeps.append(_dropout_keep_mask(shape_hb[1:], rate))
    return jnp.stack(keeps, axis=0)


def _row_valid(ref_block, n):
    """[1, Sb, 1] validity mask for the (overrunning) sequence axis."""
    return jax.lax.broadcasted_iota(
        jnp.int32, (1, ref_block.shape[1], 1), 1) < n


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, sk,
                     num_heads, hb, dropout_rate=0.0, seed_ref=None):
    q = q_ref[0]                                   # [hb, SQb, D]
    k = k_ref[0]                                   # [hb, SKb, D]
    # OOB tail rows of V are garbage (can be NaN); 0-prob x NaN poisons the
    # PV contraction, so zero them (K's tail only reaches masked scores)
    v = jnp.where(_row_valid(v_ref[0], sk), v_ref[0], 0).astype(v_ref.dtype)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # [hb, SQb, SKb] fp32
    # bias_ref is None for bias-free attention (e.g. image self-attention,
    # T5 cross-attention): no zero tensor is streamed, and no broadcast-add
    # is emitted — a bias block with a size-1 q axis reliably SIGABRTs the
    # TPU backend compiler ('Check failed: limits[i] <= dim(i)', round-4
    # probe run_scripts/probe_shortq.py: split+broadcast crashes at EVERY
    # Sq 12..577 while full [1,H,Sq,Sk] biases compile fine)
    if bias_ref is not None:
        scores = scores + bias_ref[0].astype(jnp.float32)
    # key-tail validity (blocks overrun the real Sk; OOB reads are garbage)
    kmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2) < sk
    scores = jnp.where(kmask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom
    if dropout_rate > 0.0:
        # HF semantics: dropout on the attention probabilities
        keep = _per_head_keep(probs.shape, dropout_rate, seed_ref,
                              num_heads, hb)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jax.lax.dot_general(probs.astype(v.dtype), v,
                              (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, sq, sk,
                     num_heads, hb, dropout_rate=0.0, seed_ref=None):
    # OOB tail rows are garbage (can be NaN) and all of q/k/v/do feed
    # contractions over the overrunning axis in the backward — zero them
    # (0 x NaN = NaN would otherwise poison dQ/dK/dV)
    qvalid = _row_valid(q_ref[0], sq)
    kvalid = _row_valid(k_ref[0], sk)
    q = jnp.where(qvalid, q_ref[0], 0).astype(q_ref.dtype)
    k = jnp.where(kvalid, k_ref[0], 0).astype(k_ref.dtype)
    v = jnp.where(kvalid, v_ref[0], 0).astype(v_ref.dtype)
    do = jnp.where(qvalid, do_ref[0], 0).astype(do_ref.dtype)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    if bias_ref is not None:   # None = bias-free (see _attn_fwd_kernel)
        scores = scores + bias_ref[0].astype(jnp.float32)
    kmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2) < sk
    scores = jnp.where(kmask, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    qmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < sq
    probs = jnp.where(qmask, e / denom, 0.0)       # [hb, SQb, SKb]
    if dropout_rate > 0.0:
        keep = _per_head_keep(probs.shape, dropout_rate, seed_ref,
                              num_heads, hb)
        inv = 1.0 / (1.0 - dropout_rate)
        probs_dropped = jnp.where(keep, probs * inv, 0.0)
    else:
        probs_dropped = probs
    # dV = D(P)^T dO
    dv = jax.lax.dot_general(probs_dropped.astype(do.dtype), do,
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dD(P) = dO V^T;  dP = mask/(1-p) * dD(P)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dp * inv, 0.0)
    # dS = P * (dP - rowsum(dP * P))  (fp32 statistics; garbage rows -> 0)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds = jnp.where(qmask, ds, 0.0)
    ds_lp = ds.astype(k.dtype)
    dq = jax.lax.dot_general(ds_lp, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds_lp, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _norm_bias(bias, b, sq, sk):
    """Normalize to a 4-D additive bias with a full-length key axis.

    Callers gate on ``bias is not None`` — bias-free attention never
    reaches here (no zero tensor is streamed, see _attn_fwd_kernel).

    Shape guard (round-4 probe matrix, run_scripts/probe_shortq.py +
    probe_t5_attn_shapes.py): a bias whose BATCH and Q axes are both
    broadcast (size 1) produces a block spec the TPU backend compiler
    aborts on ('Check failed: limits[i] <= dim(i)') — [1,1,1,Sk] and
    [1,H,1,Sk] crash at every probed Sq 12..577 while [1,H,Sq,Sk] and
    the production [B,1,1,Sk] key masks compile fine.  Materializing the
    q axis (tiny: the batch axis is 1) keeps every reachable bias shape
    outside the crash class, so no caller can hit the SIGABRT."""
    bias = bias.astype(jnp.float32)
    if b % bias.shape[0]:
        raise ValueError(
            f"bias batch dim {bias.shape[0]} must divide the operand "
            f"batch {b} (broadcast, periodic, or full)")
    if bias.shape[3] != sk:
        bias = jnp.broadcast_to(bias, bias.shape[:3] + (sk,))
    if bias.shape[0] == 1 and bias.shape[2] == 1:
        bias = jnp.broadcast_to(bias, bias.shape[:2] + (sq, sk))
    return bias


def _bias_spec(bias_shape, sq_b, sk_b, hb, wb=1):
    """Block spec honoring broadcast (size-1) bias dims.

    The batch dim may also be PERIODIC: a bias with 1 < bb < B batch rows
    (bb dividing B) repeats with period bb over the batch grid — the swin
    shifted-window mask is per-window ([nW, H, N, N]) while the operands
    carry a [B*nW] window-batch axis, so indexing i % bb streams the same
    nW mask rows for every image instead of materializing a [B*nW, ...]
    broadcast in HBM (reference swin_transformer.py:262-270 adds the mask
    on a [B_, nW, H, N, N] view).

    With a window-batched grid (wb > 1) the batch block carries wb bias
    rows when the bias has a real batch axis (callers guarantee wb
    divides bb then); index arithmetic is in BLOCK units, so the periodic
    stream becomes i % (bb // wb)."""
    bb, bh, bq, _ = bias_shape
    bwb = wb if bb > 1 else 1
    block = (bwb, hb if bh > 1 else 1, sq_b if bq > 1 else 1, sk_b)

    def index(i, j, _bb=bb, _bh=bh, _bwb=bwb):
        return (i % (_bb // _bwb) if _bb > 1 else 0,
                j if _bh > 1 else 0, 0, 0)

    return pl.BlockSpec(block, index, memory_space=pltpu.VMEM)


def _seed_spec():
    return pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM)


def _blocks(q, k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_b = _round_up(max(sq, 8), _SUBLANE)
    sk_b = _round_up(max(sk, _LANE), _LANE)
    return b, h, sq, sk, d, sq_b, sk_b


def _qkv_specs(sq_b, sk_b, d, hb):
    qspec = pl.BlockSpec((1, hb, sq_b, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, hb, sk_b, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec


def _check_specs(*triples):
    from mm_vqa_healthcare_tpu.ops.pallas_checks import check_block
    for block, shape, what in triples:
        check_block(block, shape, what)


def _fwd(q, k, v, bias, interpret, dropout_rate=0.0, seed=None,
         scale=None):
    b, h, sq, sk, d, sq_b, sk_b = _blocks(q, k)
    scale = (1.0 / (d ** 0.5)) if scale is None else float(scale)
    hb = _head_block(h, sq_b, sk_b, d, n_f32=3, op_mult=2,
                     dropout=dropout_rate > 0.0, budget=_FWD_VMEM_BUDGET,
                     itemsize=q.dtype.itemsize)
    has_bias = bias is not None
    qspec, kspec = _qkv_specs(sq_b, sk_b, d, hb)
    _check_specs(((1, hb, sq_b, d), q.shape, "split q"),
                 ((1, hb, sk_b, d), k.shape, "split k"))
    in_specs = [qspec, kspec, kspec]
    operands = [q, k, v]
    if has_bias:
        bias = _norm_bias(bias, b, sq, sk)
        _check_specs((_bias_spec(bias.shape, sq_b, sk_b, hb).block_shape,
                      bias.shape, "split bias"))
        in_specs.append(_bias_spec(bias.shape, sq_b, sk_b, hb))
        operands.append(bias)
    kw = dict(scale=scale, sk=sk, num_heads=h, hb=hb)
    if dropout_rate > 0.0:
        if has_bias:
            def kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref):
                _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                                 dropout_rate=dropout_rate,
                                 seed_ref=seed_ref, **kw)
        else:
            def kernel(q_ref, k_ref, v_ref, seed_ref, o_ref):
                _attn_fwd_kernel(q_ref, k_ref, v_ref, None, o_ref,
                                 dropout_rate=dropout_rate,
                                 seed_ref=seed_ref, **kw)
        in_specs.append(_seed_spec())
        operands.append(seed.reshape(1).astype(jnp.int32))
    elif has_bias:
        kernel = functools.partial(_attn_fwd_kernel, **kw)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _attn_fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)
    if interpret and dropout_rate > 0.0:
        # plain interpret mode lacks pltpu PRNG primitives; use the TPU
        # interpreter which emulates them
        interpret = pltpu.InterpretParams()
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hb),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_b * sk_b * d,
            bytes_accessed=(2 * b * h * sq_b * d
                            + 2 * b * h * sk_b * d) * 2,
            transcendentals=b * h * sq_b * sk_b,
        ),
        interpret=interpret,
    )(*operands)
    return out


def _bwd(q, k, v, bias, do, interpret, dropout_rate=0.0, seed=None,
         scale=None):
    b, h, sq, sk, d, sq_b, sk_b = _blocks(q, k)
    scale = (1.0 / (d ** 0.5)) if scale is None else float(scale)
    hb = _head_block(h, sq_b, sk_b, d, n_f32=5, op_mult=4,
                     dropout=dropout_rate > 0.0, budget=_BWD_VMEM_BUDGET,
                     itemsize=q.dtype.itemsize)
    has_bias = bias is not None
    qspec, kspec = _qkv_specs(sq_b, sk_b, d, hb)
    _check_specs(((1, hb, sq_b, d), q.shape, "split bwd q"),
                 ((1, hb, sk_b, d), k.shape, "split bwd k"))
    in_specs = [qspec, kspec, kspec]
    operands = [q, k, v]
    if has_bias:
        bias = _norm_bias(bias, b, sq, sk)
        _check_specs((_bias_spec(bias.shape, sq_b, sk_b, hb).block_shape,
                      bias.shape, "split bwd bias"))
        in_specs.append(_bias_spec(bias.shape, sq_b, sk_b, hb))
        operands.append(bias)
    in_specs.append(qspec)
    operands.append(do)
    kw = dict(scale=scale, sq=sq, sk=sk, num_heads=h, hb=hb)
    if dropout_rate > 0.0:
        if has_bias:
            def kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, seed_ref,
                       dq_ref, dk_ref, dv_ref):
                _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                                 dq_ref, dk_ref, dv_ref,
                                 dropout_rate=dropout_rate,
                                 seed_ref=seed_ref, **kw)
        else:
            def kernel(q_ref, k_ref, v_ref, do_ref, seed_ref,
                       dq_ref, dk_ref, dv_ref):
                _attn_bwd_kernel(q_ref, k_ref, v_ref, None, do_ref,
                                 dq_ref, dk_ref, dv_ref,
                                 dropout_rate=dropout_rate,
                                 seed_ref=seed_ref, **kw)
        in_specs.append(_seed_spec())
        operands.append(seed.reshape(1).astype(jnp.int32))
    elif has_bias:
        kernel = functools.partial(_attn_bwd_kernel, **kw)
    else:
        def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, None, do_ref,
                             dq_ref, dk_ref, dv_ref, **kw)
    if interpret and dropout_rate > 0.0:
        interpret = pltpu.InterpretParams()
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h // hb),
        in_specs=in_specs,
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * sq_b * sk_b * d,
            bytes_accessed=(4 * b * h * sq_b * d
                            + 4 * b * h * sk_b * d) * 2,
            transcendentals=b * h * sq_b * sk_b,
        ),
        interpret=interpret,
    )(*operands)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Packed-layout kernels: q/k/v stay [B, S, H*D] (the projection output
# layout) and the head axis is carved out of the LANE dimension by the
# BlockSpec (hb*d = 128 lanes for the production head_dim=64 -> zero lane
# padding).  This eliminates the [B,S,H,D]<->[B,H,S,D] relayout copies XLA
# otherwise materializes around the custom call (~7 ms/step, PERF.md r2).
# ---------------------------------------------------------------------------

def _packed_row_valid(ref, n):
    """[Sb, 1] validity mask for a packed (1, Sb, lanes) block."""
    return jax.lax.broadcasted_iota(jnp.int32, (ref.shape[1], 1), 0) < n


# Grouped-head mode for the packed kernels: instead of one (M=Sq, K=d,
# N=Sk) dot per head, transpose gb heads' lane slices to [gb, S, d] IN
# VMEM and issue one batched dot_general — Mosaic pipelines the group and
# the per-head VPU softmax work vectorizes over the group axis.  Matters
# for the swin window regime (d=32, hb up to 32: the per-head loop is 32
# serialized tiny matmuls per program, 6% MXU efficiency in the batch30
# profile).  "auto" caps the group so the fp32 score family fits
# _GROUP_SCORE_BUDGET; "0" disables (bit-path-identical per-head loop).
# Default ON (batch31 same-batch A/B: swin eval 403->470.6 +16.8%, swin
# train 126->147.6 +17.1%, clip16 train 173.6->177.5 +2.2%; clip image
# self-attention auto-degrades to gb=1 — its grouped score family
# overruns the budget — so the big-tile regime is untouched).
_PACKED_GROUP = os.environ.get("MMVQA_ATTN_PACKED_GROUP", "auto")
# 8 MB (batch32: swin train +2.8% over 4 MB, eval +0.5%): still leaves the
# clip16 image self-attention at gb=1 (one 592x640 fp32 score family is
# 4.4 MB eval / 6.8 MB dropout — a group of 2 would overrun), so only the
# small-tile regimes group wider.  Mosaic re-checks actual VMEM at lowering.
_GROUP_SCORE_BUDGET = int(os.environ.get("MMVQA_ATTN_GROUP_BUDGET",
                                         8 * 2 ** 20))


def _group_size(hb: int, sq_b: int, sk_b: int, n_f32: int,
                dropout: bool) -> int:
    """Heads per batched dot: largest divisor of hb whose grouped score
    family fits the budget.  1 = per-head loop (grouping off)."""
    if _PACKED_GROUP == "0":
        return 1
    per_head = sq_b * sk_b * (4 * n_f32 + (6 if dropout else 0))
    cap = int(_PACKED_GROUP) if _PACKED_GROUP not in ("auto",) else hb
    for gb in range(min(hb, cap), 0, -1):
        if hb % gb == 0 and gb * per_head <= _GROUP_SCORE_BUDGET:
            return gb
    return 1


# Window-batched grid for the packed kernels: each program consumes wb
# batch rows instead of 1.  Motivation (batch36 swin train profile): the
# window regime runs a (B*nW, heads) grid of 2048 programs whose operand
# blocks are only ~36 KB — the attention custom-calls spend 49.8 ms/step
# moving tiny DMA transfers for ~3 ms of MXU math.  Batching wb windows
# per program divides the grid by wb and multiplies every operand fetch
# by wb; the per-window math is an outer Python loop, so the fp32 score
# family stays single-window-live (same liveness argument as the hb head
# loop) and dropout streams keep their absolute-batch seeds
# (bit-identical numerics, regression-locked).
# MEASURED NEGATIVE (probe_swin_wb.py, .tpu_probe_wb.log, 2026-08-19):
# on the real chip only stage1 (b=2048, nW=64) compiles at wb∈{2,4,8} and
# stage2 at wb=2 — every other (stage, wb>1) combination crashes the TPU
# backend compiler (tpu_compile_helper exit 1).  Where it does compile the
# win is fwd-only and small (s1 fwd 3.33→2.88 ms at wb=4, grad flat;
# s2 fwd −5% at wb=2), ≈0.7 ms of a 211 ms b32 train step (+0.3%).  The
# grad path not moving says the grid/DMA overhead hypothesis was wrong —
# the cost is elsewhere.  Default OFF; the plumbing stays (parity-locked
# by tests) for experimentation via MMVQA_ATTN_WB=<n|auto>.
_PACKED_WB = os.environ.get("MMVQA_ATTN_WB", "1")


def _window_batch(b: int, d: int, bias_bb: int) -> int:
    if _PACKED_WB in ("0", "1"):
        return 1
    cap = 8 if _PACKED_WB == "auto" else int(_PACKED_WB)
    if _PACKED_WB == "auto" and d >= 64:
        return 1
    for wb in range(min(cap, b), 1, -1):
        if b % wb:
            continue
        if bias_bb == 1 or bias_bb % wb == 0:
            return wb
    return 1


def _group_keep(shape_g, rate, seed_ref, num_heads, hb, t0, gb, ab=None):
    """[gb, SQ, SK] keep-mask with the exact per-absolute-head streams of
    the per-head loop (seed per head, then draw), so grouping is
    bit-identical to the ungrouped kernels even under dropout.  `ab` is
    the ABSOLUTE batch row (window-batched grids pass i*wb + w); default
    is the program id (wb == 1)."""
    if ab is None:
        ab = pl.program_id(0)
    j = pl.program_id(1)
    keeps = []
    for t in range(t0, t0 + gb):
        pltpu.prng_seed(seed_ref[0], ab * num_heads + (j * hb + t))
        keeps.append(_dropout_keep_mask(shape_g[1:], rate))
    return jnp.stack(keeps, axis=0)


def _group_view(x_all, t0, gb, d):
    """[Sb, hb*d] lanes -> [gb, Sb, d] batched-head view (in VMEM).

    Built from stacked per-head lane slices: Mosaic's layout inference
    rejects the natural reshape ([Sb, gb*d] -> [Sb, gb, d] is an
    "unsupported shape cast" when d < 128 lanes), but stacking static
    slices lowers to plain VMEM copies."""
    return jnp.stack([x_all[:, (t0 + t) * d:(t0 + t + 1) * d]
                      for t in range(gb)], axis=0)


def _ungroup(out, gb):
    """[gb, Sb, d] -> [Sb, gb*d] (inverse of _group_view's gather)."""
    return jnp.concatenate([out[t] for t in range(gb)], axis=1)


def _packed_fwd_kernel_grouped(q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                               scale, sk, num_heads, hb, d, gb, wb=1,
                               bias_wb=False, dropout_rate=0.0,
                               seed_ref=None):
    kvalid = _packed_row_valid(k_ref, sk)
    i = pl.program_id(0)
    for w in range(wb):
        q_all = q_ref[w]                           # [SQb, hb*d]
        k_all = k_ref[w]                           # [SKb, hb*d]
        v_all = jnp.where(kvalid, v_ref[w], 0).astype(v_ref.dtype)
        # bias_ref None = bias-free attention: nothing streamed, no add
        # (also avoids the short-Sq broadcast-bias compiler SIGABRT —
        # probe_shortq.py)
        bias_w = None if bias_ref is None else bias_ref[w if bias_wb else 0]
        ab = i * wb + w
        for t0 in range(0, hb, gb):
            sl = slice(t0 * d, (t0 + gb) * d)
            qg = _group_view(q_all, t0, gb, d)
            kg = _group_view(k_all, t0, gb, d)
            vg = _group_view(v_all, t0, gb, d)
            scores = jax.lax.dot_general(
                qg, kg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # [gb,SQb,SKb]
            if bias_w is not None:
                bsl = (bias_w[t0:t0 + gb] if bias_w.shape[0] > 1
                       else jnp.broadcast_to(bias_w,
                                             (gb,) + bias_w.shape[1:]))
                scores = scores + bsl.astype(jnp.float32)
            kmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2) < sk
            scores = jnp.where(kmask, scores, _NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            if dropout_rate > 0.0:
                keep = _group_keep(probs.shape, dropout_rate, seed_ref,
                                   num_heads, hb, t0, gb, ab=ab)
                probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
            out = jax.lax.dot_general(probs.astype(vg.dtype), vg,
                                      (((2,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            o_ref[w, :, sl] = _ungroup(out, gb).astype(o_ref.dtype)


def _packed_bwd_kernel_grouped(q_ref, k_ref, v_ref, bias_ref, do_ref,
                               dq_ref, dk_ref, dv_ref, *, scale, sq, sk,
                               num_heads, hb, d, gb, wb=1, bias_wb=False,
                               dropout_rate=0.0, seed_ref=None):
    qvalid = _packed_row_valid(q_ref, sq)
    kvalid = _packed_row_valid(k_ref, sk)
    i = pl.program_id(0)
    for w in range(wb):
        q_all = jnp.where(qvalid, q_ref[w], 0).astype(q_ref.dtype)
        k_all = jnp.where(kvalid, k_ref[w], 0).astype(k_ref.dtype)
        v_all = jnp.where(kvalid, v_ref[w], 0).astype(v_ref.dtype)
        do_all = jnp.where(qvalid, do_ref[w], 0).astype(do_ref.dtype)
        bias_w = None if bias_ref is None else bias_ref[w if bias_wb else 0]
        ab = i * wb + w
        for t0 in range(0, hb, gb):
            sl = slice(t0 * d, (t0 + gb) * d)
            qg = _group_view(q_all, t0, gb, d)
            kg = _group_view(k_all, t0, gb, d)
            vg = _group_view(v_all, t0, gb, d)
            dog = _group_view(do_all, t0, gb, d)
            scores = jax.lax.dot_general(
                qg, kg, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            if bias_w is not None:
                bsl = (bias_w[t0:t0 + gb] if bias_w.shape[0] > 1
                       else jnp.broadcast_to(bias_w,
                                             (gb,) + bias_w.shape[1:]))
                scores = scores + bsl.astype(jnp.float32)
            kmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2) < sk
            scores = jnp.where(kmask, scores, _NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            qmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < sq
            probs = jnp.where(qmask, e / denom, 0.0)   # [gb, SQb, SKb]
            if dropout_rate > 0.0:
                keep = _group_keep(probs.shape, dropout_rate, seed_ref,
                                   num_heads, hb, t0, gb, ab=ab)
                inv = 1.0 / (1.0 - dropout_rate)
                probs_dropped = jnp.where(keep, probs * inv, 0.0)
            else:
                probs_dropped = probs
            dv = jax.lax.dot_general(probs_dropped.astype(dog.dtype), dog,
                                     (((1,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(dog, vg, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                dp = jnp.where(keep, dp * inv, 0.0)
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            ds = jnp.where(qmask, ds, 0.0)
            ds_lp = ds.astype(kg.dtype)
            dq = jax.lax.dot_general(
                ds_lp, kg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds_lp, qg, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            dq_ref[w, :, sl] = _ungroup(dq, gb).astype(dq_ref.dtype)
            dk_ref[w, :, sl] = _ungroup(dk, gb).astype(dk_ref.dtype)
            dv_ref[w, :, sl] = _ungroup(dv, gb).astype(dv_ref.dtype)


def _packed_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, sk,
                       num_heads, hb, d, gb=1, wb=1, bias_wb=False,
                       dropout_rate=0.0, seed_ref=None):
    if gb > 1:
        return _packed_fwd_kernel_grouped(
            q_ref, k_ref, v_ref, bias_ref, o_ref, scale=scale, sk=sk,
            num_heads=num_heads, hb=hb, d=d, gb=gb, wb=wb, bias_wb=bias_wb,
            dropout_rate=dropout_rate, seed_ref=seed_ref)
    kvalid = _packed_row_valid(k_ref, sk)
    i = pl.program_id(0)
    j = pl.program_id(1)
    for w in range(wb):
        q_all = q_ref[w]                           # [SQb, hb*d]
        k_all = k_ref[w]                           # [SKb, hb*d]
        v_all = jnp.where(kvalid, v_ref[w], 0).astype(v_ref.dtype)
        b = None if bias_ref is None else bias_ref[w if bias_wb else 0]
        ab = i * wb + w
        for t in range(hb):
            sl = slice(t * d, (t + 1) * d)
            q = q_all[:, sl]
            k = k_all[:, sl]
            v = v_all[:, sl]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # [SQb, SKb]
            if b is not None:  # None = bias-free (see _attn_fwd_kernel)
                scores = scores + (b[t] if b.shape[0] > 1 else b[0]).astype(
                    jnp.float32)
            kmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < sk
            scores = jnp.where(kmask, scores, _NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            if dropout_rate > 0.0:
                pltpu.prng_seed(seed_ref[0], ab * num_heads + (j * hb + t))
                keep = _dropout_keep_mask(probs.shape, dropout_rate)
                probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
            out = jnp.dot(probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            o_ref[w, :, sl] = out.astype(o_ref.dtype)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, sq, sk,
                       num_heads, hb, d, gb=1, wb=1, bias_wb=False,
                       dropout_rate=0.0, seed_ref=None):
    if gb > 1:
        return _packed_bwd_kernel_grouped(
            q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref,
            scale=scale, sq=sq, sk=sk, num_heads=num_heads, hb=hb, d=d,
            gb=gb, wb=wb, bias_wb=bias_wb, dropout_rate=dropout_rate,
            seed_ref=seed_ref)
    qvalid = _packed_row_valid(q_ref, sq)
    kvalid = _packed_row_valid(k_ref, sk)
    i = pl.program_id(0)
    j = pl.program_id(1)
    for w in range(wb):
        q_all = jnp.where(qvalid, q_ref[w], 0).astype(q_ref.dtype)
        k_all = jnp.where(kvalid, k_ref[w], 0).astype(k_ref.dtype)
        v_all = jnp.where(kvalid, v_ref[w], 0).astype(v_ref.dtype)
        do_all = jnp.where(qvalid, do_ref[w], 0).astype(do_ref.dtype)
        b = None if bias_ref is None else bias_ref[w if bias_wb else 0]
        ab = i * wb + w
        for t in range(hb):
            sl = slice(t * d, (t + 1) * d)
            q = q_all[:, sl]
            k = k_all[:, sl]
            v = v_all[:, sl]
            do = do_all[:, sl]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if b is not None:  # None = bias-free (see _attn_fwd_kernel)
                scores = scores + (b[t] if b.shape[0] > 1 else b[0]).astype(
                    jnp.float32)
            kmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) < sk
            scores = jnp.where(kmask, scores, _NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            qmask = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) < sq
            probs = jnp.where(qmask, e / denom, 0.0)
            if dropout_rate > 0.0:
                pltpu.prng_seed(seed_ref[0], ab * num_heads + (j * hb + t))
                keep = _dropout_keep_mask(probs.shape, dropout_rate)
                inv = 1.0 / (1.0 - dropout_rate)
                probs_dropped = jnp.where(keep, probs * inv, 0.0)
            else:
                probs_dropped = probs
            dv = jax.lax.dot_general(probs_dropped.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if dropout_rate > 0.0:
                dp = jnp.where(keep, dp * inv, 0.0)
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            ds = jnp.where(qmask, ds, 0.0)
            ds_lp = ds.astype(k.dtype)
            dq = jnp.dot(ds_lp, k,
                         preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds_lp, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32
                                     ) * scale
            dq_ref[w, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[w, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[w, :, sl] = dv.astype(dv_ref.dtype)


def _packed_specs(sq_b, sk_b, d, hb, wb=1):
    qspec = pl.BlockSpec((wb, sq_b, hb * d), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((wb, sk_b, hb * d), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    return qspec, kspec


def _packed_head_block(h: int, sq_b: int, sk_b: int, d: int,
                       n_f32: int, op_mult: int, dropout: bool,
                       budget: int, itemsize: int = 2) -> int:
    """Packed layout: the operand lane width is hb*d (no per-head 128-pad).

    Mosaic requires lane-dim block sizes to be 128-multiples (or the full
    array dim), so only lane-valid hb are candidates.  Returns 0 when no
    lane-valid head block fits the VMEM budget — callers MUST fall back to
    the split layout then (numerics are identical either way; dropout
    streams are seeded per absolute head in both kernel families)."""
    for hb in range(h, 0, -1):
        if h % hb or (hb * d) % _LANE:
            continue
        # The packed kernels loop over in-block heads, so with a
        # liveness-reusing allocator the fp32 score family is live once,
        # not hb times (MMVQA_ATTN_PACKED_PERHEAD=1 counts it that way —
        # empirical knob; Mosaic errors at lowering if it doesn't fit).
        mult = 1 if _PACKED_PERHEAD else hb
        per_prog = (mult * sq_b * sk_b * 4 * n_f32
                    + (mult * sq_b * sk_b * 6 if dropout else 0)
                    + op_mult * (sq_b + sk_b) * hb * d * itemsize * 2)
        if per_prog <= budget:
            return hb
    return 0


def _split_heads(x, h):
    b, s, dm = x.shape
    return x.reshape(b, s, h, dm // h).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _packed_fwd(q, k, v, bias, num_heads, interpret, dropout_rate, seed,
                scale=None):
    b, sq, dm = q.shape
    sk = k.shape[1]
    d = dm // num_heads
    scale = (1.0 / (d ** 0.5)) if scale is None else float(scale)
    sq_b = _round_up(max(sq, 8), _SUBLANE)
    sk_b = _round_up(max(sk, _LANE), _LANE)
    hb = _packed_head_block(num_heads, sq_b, sk_b, d, n_f32=3, op_mult=2,
                            dropout=dropout_rate > 0.0,
                            budget=_FWD_VMEM_BUDGET,
                            itemsize=q.dtype.itemsize)
    assert hb > 0, "packed fwd infeasible — caller must gate on feasibility"
    has_bias = bias is not None
    if has_bias:
        bias = _norm_bias(bias, b, sq, sk)
    wb = _window_batch(b, d, bias.shape[0] if has_bias else 1)
    qspec, kspec = _packed_specs(sq_b, sk_b, d, hb, wb)
    _check_specs(((wb, sq_b, hb * d), q.shape, "packed q"),
                 ((wb, sk_b, hb * d), k.shape, "packed k"))
    in_specs = [qspec, kspec, kspec]
    operands = [q, k, v]
    if has_bias:
        _check_specs((_bias_spec(bias.shape, sq_b, sk_b, hb, wb).block_shape,
                      bias.shape, "packed bias"))
        in_specs.append(_bias_spec(bias.shape, sq_b, sk_b, hb, wb))
        operands.append(bias)
    kw = dict(scale=scale, sk=sk, num_heads=num_heads, hb=hb, d=d,
              wb=wb, bias_wb=has_bias and bias.shape[0] > 1,
              gb=_group_size(hb, sq_b, sk_b, n_f32=3,
                             dropout=dropout_rate > 0.0))
    if dropout_rate > 0.0:
        if has_bias:
            def kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref):
                _packed_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                                   dropout_rate=dropout_rate,
                                   seed_ref=seed_ref, **kw)
        else:
            def kernel(q_ref, k_ref, v_ref, seed_ref, o_ref):
                _packed_fwd_kernel(q_ref, k_ref, v_ref, None, o_ref,
                                   dropout_rate=dropout_rate,
                                   seed_ref=seed_ref, **kw)
        in_specs.append(_seed_spec())
        operands.append(seed.reshape(1).astype(jnp.int32))
    elif has_bias:
        kernel = functools.partial(_packed_fwd_kernel, **kw)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            _packed_fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, **kw)
    if interpret and dropout_rate > 0.0:
        interpret = pltpu.InterpretParams()
    return pl.pallas_call(
        kernel,
        grid=(b // wb, num_heads // hb),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, sq, dm), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * sq_b * sk_b * d,
            bytes_accessed=(2 * b * sq_b + 2 * b * sk_b) * dm * 2,
            transcendentals=b * num_heads * sq_b * sk_b,
        ),
        interpret=interpret,
    )(*operands)


def _packed_bwd(q, k, v, bias, do, num_heads, interpret, dropout_rate, seed,
                scale=None):
    b, sq, dm = q.shape
    sk = k.shape[1]
    d = dm // num_heads
    scale = (1.0 / (d ** 0.5)) if scale is None else float(scale)
    sq_b = _round_up(max(sq, 8), _SUBLANE)
    sk_b = _round_up(max(sk, _LANE), _LANE)
    hb = _packed_head_block(num_heads, sq_b, sk_b, d, n_f32=5, op_mult=4,
                            dropout=dropout_rate > 0.0,
                            budget=_BWD_VMEM_BUDGET,
                            itemsize=q.dtype.itemsize)
    assert hb > 0, "packed bwd infeasible — caller must gate on feasibility"
    has_bias = bias is not None
    if has_bias:
        bias = _norm_bias(bias, b, sq, sk)
    wb = _window_batch(b, d, bias.shape[0] if has_bias else 1)
    qspec, kspec = _packed_specs(sq_b, sk_b, d, hb, wb)
    _check_specs(((wb, sq_b, hb * d), q.shape, "packed bwd q"),
                 ((wb, sk_b, hb * d), k.shape, "packed bwd k"))
    in_specs = [qspec, kspec, kspec]
    operands = [q, k, v]
    if has_bias:
        _check_specs((_bias_spec(bias.shape, sq_b, sk_b, hb, wb).block_shape,
                      bias.shape, "packed bwd bias"))
        in_specs.append(_bias_spec(bias.shape, sq_b, sk_b, hb, wb))
        operands.append(bias)
    in_specs.append(qspec)
    operands.append(do)
    kw = dict(scale=scale, sq=sq, sk=sk, num_heads=num_heads, hb=hb, d=d,
              wb=wb, bias_wb=has_bias and bias.shape[0] > 1,
              gb=_group_size(hb, sq_b, sk_b, n_f32=5,
                             dropout=dropout_rate > 0.0))
    if dropout_rate > 0.0:
        if has_bias:
            def kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, seed_ref,
                       dq_ref, dk_ref, dv_ref):
                _packed_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                                   dq_ref, dk_ref, dv_ref,
                                   dropout_rate=dropout_rate,
                                   seed_ref=seed_ref, **kw)
        else:
            def kernel(q_ref, k_ref, v_ref, do_ref, seed_ref,
                       dq_ref, dk_ref, dv_ref):
                _packed_bwd_kernel(q_ref, k_ref, v_ref, None, do_ref,
                                   dq_ref, dk_ref, dv_ref,
                                   dropout_rate=dropout_rate,
                                   seed_ref=seed_ref, **kw)
        in_specs.append(_seed_spec())
        operands.append(seed.reshape(1).astype(jnp.int32))
    elif has_bias:
        kernel = functools.partial(_packed_bwd_kernel, **kw)
    else:
        def kernel(q_ref, k_ref, v_ref, do_ref,
                   dq_ref, dk_ref, dv_ref):
            _packed_bwd_kernel(q_ref, k_ref, v_ref, None, do_ref,
                               dq_ref, dk_ref, dv_ref, **kw)
    if interpret and dropout_rate > 0.0:
        interpret = pltpu.InterpretParams()
    return pl.pallas_call(
        kernel,
        grid=(b // wb, num_heads // hb),
        in_specs=in_specs,
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, sq, dm), q.dtype),
            jax.ShapeDtypeStruct((b, sk, dm), k.dtype),
            jax.ShapeDtypeStruct((b, sk, dm), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * num_heads * sq_b * sk_b * d,
            bytes_accessed=(4 * b * sq_b + 4 * b * sk_b) * dm * 2,
            transcendentals=b * num_heads * sq_b * sk_b,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 8))
def _fused_attention_packed(q, k, v, bias, num_heads, interpret,
                            dropout_rate, seed, scale):
    return _packed_fwd(q, k, v, bias, num_heads, interpret, dropout_rate,
                       seed, scale)


def _fused_attention_packed_fwd(q, k, v, bias, num_heads, interpret,
                                dropout_rate, seed, scale):
    out = _packed_fwd(q, k, v, bias, num_heads, interpret, dropout_rate,
                      seed, scale)
    return out, (q, k, v, bias, seed)


def _fused_attention_packed_bwd(num_heads, interpret, dropout_rate, scale,
                                res, g):
    q, k, v, bias, seed = res
    b, sq, dm = q.shape
    sk = k.shape[1]
    d = dm // num_heads
    sq_b = _round_up(max(sq, 8), _SUBLANE)
    sk_b = _round_up(max(sk, _LANE), _LANE)
    hb = _packed_head_block(num_heads, sq_b, sk_b, d, n_f32=5, op_mult=4,
                            dropout=dropout_rate > 0.0,
                            budget=_BWD_VMEM_BUDGET,
                            itemsize=q.dtype.itemsize)
    if hb == 0:
        # packed bwd working set doesn't fit VMEM (image-sized score tiles
        # with dropout): run the split-layout backward — bit-identical
        # (per-absolute-head dropout seeding), pays only relayout copies
        dqs, dks, dvs = _bwd(_split_heads(q, num_heads),
                             _split_heads(k, num_heads),
                             _split_heads(v, num_heads), bias,
                             _split_heads(g, num_heads), interpret,
                             dropout_rate, seed, scale)
        return (_merge_heads(dqs), _merge_heads(dks), _merge_heads(dvs),
                None, None)
    dq, dk, dv = _packed_bwd(q, k, v, bias, g, num_heads, interpret,
                             dropout_rate, seed, scale)
    return dq, dk, dv, None, None


_fused_attention_packed.defvjp(_fused_attention_packed_fwd,
                               _fused_attention_packed_bwd)


def fused_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           num_heads: int,
                           bias: Optional[jax.Array] = None,
                           interpret: Optional[bool] = None,
                           dropout_rate: float = 0.0,
                           dropout_seed: Optional[jax.Array] = None,
                           scale: Optional[float] = None) -> jax.Array:
    """Fused attention on PACKED [B, S, H*D] operands (projection layout).

    Numerically identical to fused_attention on the split layout —
    including the per-head dropout streams — without the relayout copies.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_seed required when dropout_rate > 0")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    d = q.shape[-1] // num_heads
    sq_b = _round_up(max(q.shape[1], 8), _SUBLANE)
    sk_b = _round_up(max(k.shape[1], _LANE), _LANE)
    if _packed_head_block(num_heads, sq_b, sk_b, d, n_f32=3, op_mult=2,
                          dropout=dropout_rate > 0.0,
                          budget=_FWD_VMEM_BUDGET,
                          itemsize=q.dtype.itemsize) == 0:
        # no lane-valid head block fits VMEM: split layout end to end
        out = _fused_attention(
            _split_heads(q, num_heads), _split_heads(k, num_heads),
            _split_heads(v, num_heads), bias, interpret,
            float(dropout_rate), dropout_seed, scale)
        return _merge_heads(out)
    return _fused_attention_packed(q, k, v, bias, num_heads, interpret,
                                   float(dropout_rate), dropout_seed, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 7))
def _fused_attention(q, k, v, bias, interpret, dropout_rate, seed, scale):
    return _fwd(q, k, v, bias, interpret, dropout_rate, seed, scale)


def _fused_attention_fwd(q, k, v, bias, interpret, dropout_rate, seed,
                         scale):
    out = _fwd(q, k, v, bias, interpret, dropout_rate, seed, scale)
    return out, (q, k, v, bias, seed)


def _fused_attention_bwd(interpret, dropout_rate, scale, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd(q, k, v, bias, g, interpret, dropout_rate, seed, scale)
    return dq, dk, dv, None, None


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    interpret: Optional[bool] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jax.Array] = None,
                    scale: Optional[float] = None) -> jax.Array:
    """Fused single-tile attention.  q,k,v: [B, H, S, D]; bias additive.

    dropout_rate > 0 applies in-kernel dropout on the attention
    probabilities (HF semantics) using the TPU PRNG, with the exact same
    keep-mask regenerated in the backward recompute; dropout_seed is a
    scalar int32 array (required when dropout_rate > 0).

    interpret=None auto-selects interpreter mode off-TPU so the same code
    path is exercised by CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_seed required when dropout_rate > 0")
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    return _fused_attention(q, k, v, bias, interpret, float(dropout_rate),
                            dropout_seed, scale)
