"""Fused attention Pallas kernels for TPU.

Design notes (TPU-first, not a port — the reference computes attention with
eager torch matmuls that materialize the [B,H,Sq,Sk] score tensor in HBM):

The sequence lengths in this workload are short (text <= 64 tokens, image
<= 577 patches @384/16, decoder <= 129): a full [Sq_pad, Sk_pad] score tile
fits comfortably in VMEM (640 x 640 fp32 = 1.6 MB).  So instead of a
streaming flash-attention with running max/denominator, the optimal kernel
here is a *single-tile fused attention*: one grid step per (batch, head)
computes QK^T, the masked softmax, and PV entirely in VMEM — scores never
touch HBM in either the forward or the backward pass.  For longer sequences
the wrapper falls back to blocking over the query axis (keys still fit).

Numerics: scores/softmax in float32 (matches the reference's fp16-safe
LayerNorm/softmax behavior), output cast back to the input dtype.

The backward pass recomputes the probabilities (FLOPs are cheap next to the
HBM traffic saved by not stashing [B,H,Sq,Sk] residuals).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dropout_keep_mask(shape, rate):
    """Deterministic per-program dropout keep-mask from the seeded PRNG.
    The PRNG must have been seeded (same seed in fwd and bwd so the mask
    reproduces exactly for the recompute-based backward).

    keep iff bits < (1-rate)*2^32 — chosen so the CPU TPU-interpreter
    (whose prng stub returns zeros) degenerates to keep-all rather than
    drop-all; real-TPU bits are uniform, P(keep) = 1-rate."""
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    threshold = jnp.uint32(min(int((1.0 - rate) * float(2 ** 32)),
                               2 ** 32 - 1))
    return bits < threshold


def _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                     dropout_rate=0.0, seed_ref=None):
    # matmuls take the native (bf16) operands with fp32 accumulation —
    # full-rate MXU; softmax statistics stay fp32
    q = q_ref[0, 0]                                # [Sq, D]
    k = k_ref[0, 0]                                # [Sk, D]
    v = v_ref[0, 0]                                # [Sk, D]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [Sq, Sk] fp32
    scores = scores + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom
    if dropout_rate > 0.0:
        # HF semantics: dropout on the attention probabilities
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        keep = _dropout_keep_mask(probs.shape, dropout_rate)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale,
                     dropout_rate=0.0, seed_ref=None):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom                              # [Sq, Sk]
    if dropout_rate > 0.0:
        # regenerate the forward's exact keep-mask (same seed, same grid)
        pltpu.prng_seed(
            seed_ref[0],
            pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
        keep = _dropout_keep_mask(probs.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        probs_dropped = jnp.where(keep, probs * inv, 0.0)
    else:
        probs_dropped = probs
    # dV = D(P)^T dO
    dv = jax.lax.dot_general(probs_dropped.astype(do.dtype), do,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dD(P) = dO V^T;  dP = mask/(1-p) * dD(P)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dp * inv, 0.0)
    # dS = P * (dP - rowsum(dP * P))  (fp32 statistics)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds_lp = ds.astype(k.dtype)
    dq = jnp.dot(ds_lp, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds_lp, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_operands(q, k, v, bias):
    """Pad Sq/Sk to lane multiples.  The bias keeps its broadcastable shape
    (e.g. [B,1,1,Sk] key masks, [1,1,Sq,Sk] causal) — it is NOT
    materialized to [B,H,Sq,Sk] (that would stream gigabytes of redundant
    mask through HBM per call); broadcasting happens in-kernel in VMEM.
    Padded key positions get -inf via bias padding along Sk."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sq_p = _round_up(max(sq, 8), 8)
    sk_p = _round_up(max(sk, _LANE), _LANE)
    if bias is None:
        bias = jnp.zeros((1, 1, 1, sk), jnp.float32)
    bias = bias.astype(jnp.float32)
    # normalize: broadcast the key axis (padding needs real entries there)
    bias = jnp.broadcast_to(
        bias, bias.shape[:3] + (sk,)) if bias.shape[3] != sk else bias
    if sq_p != sq and bias.shape[2] != 1:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)),
                       constant_values=_NEG_INF)
    if sk_p != sk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, sk_p - sk)),
                       constant_values=_NEG_INF)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    return q, k, v, bias, sq, sk


def _specs(b, h, sq_p, sk_p, d, bias_shape):
    qspec = pl.BlockSpec((1, 1, sq_p, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, sk_p, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    bb, bh, bq, _ = bias_shape
    bspec = pl.BlockSpec(
        (1, 1, bq, sk_p),
        lambda i, j, _bb=bb, _bh=bh: (i if _bb > 1 else 0,
                                      j if _bh > 1 else 0, 0, 0),
        memory_space=pltpu.VMEM)
    return qspec, kspec, bspec


def _seed_spec():
    return pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM)


def _fwd(q, k, v, bias, interpret, dropout_rate=0.0, seed=None):
    b, h, sq, d = q.shape
    scale = 1.0 / (d ** 0.5)
    q, k, v, bias, sq0, sk0 = _pad_operands(q, k, v, bias)
    sq_p, sk_p = q.shape[2], k.shape[2]
    qspec, kspec, bspec = _specs(b, h, sq_p, sk_p, d, bias.shape)
    in_specs = [qspec, kspec, kspec, bspec]
    extra = []
    if dropout_rate > 0.0:
        def kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, o_ref):
            _attn_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                             scale=scale, dropout_rate=dropout_rate,
                             seed_ref=seed_ref)
        in_specs.append(_seed_spec())
        extra = [seed.reshape(1).astype(jnp.int32)]
    else:
        kernel = functools.partial(_attn_fwd_kernel, scale=scale)
    if interpret and dropout_rate > 0.0:
        # plain interpret mode lacks pltpu PRNG primitives; use the TPU
        # interpreter which emulates them
        interpret = pltpu.InterpretParams()
    # Collapse (1,1) leading block dims inside the kernel via ref[0,0].
    out = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * sk_p * d,
            bytes_accessed=(2 * b * h * sq_p * d + 2 * b * h * sk_p * d
                            + b * h * sq_p * sk_p) * 4,
            transcendentals=b * h * sq_p * sk_p,
        ),
        interpret=interpret,
    )(q, k, v, bias, *extra)
    return out[:, :, :sq0, :]


def _bwd(q, k, v, bias, do, interpret, dropout_rate=0.0, seed=None):
    b, h, sq, d = q.shape
    scale = 1.0 / (d ** 0.5)
    q, k, v, bias, sq0, sk0 = _pad_operands(q, k, v, bias)
    do = jnp.pad(do, ((0, 0), (0, 0), (0, q.shape[2] - sq0), (0, 0)))
    sq_p, sk_p = q.shape[2], k.shape[2]
    qspec, kspec, bspec = _specs(b, h, sq_p, sk_p, d, bias.shape)
    in_specs = [qspec, kspec, kspec, bspec, qspec]
    extra = []
    if dropout_rate > 0.0:
        def kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, seed_ref,
                   dq_ref, dk_ref, dv_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                             dq_ref, dk_ref, dv_ref, scale=scale,
                             dropout_rate=dropout_rate, seed_ref=seed_ref)
        in_specs.append(_seed_spec())
        extra = [seed.reshape(1).astype(jnp.int32)]
    else:
        kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    if interpret and dropout_rate > 0.0:
        interpret = pltpu.InterpretParams()
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=in_specs,
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk_p, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * sq_p * sk_p * d,
            bytes_accessed=(4 * b * h * sq_p * d + 4 * b * h * sk_p * d
                            + b * h * sq_p * sk_p) * 4,
            transcendentals=b * h * sq_p * sk_p,
        ),
        interpret=interpret,
    )(q, k, v, bias, do, *extra)
    return dq[:, :, :sq0, :], dk[:, :, :sk0, :], dv[:, :, :sk0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention(q, k, v, bias, interpret, dropout_rate, seed):
    return _fwd(q, k, v, bias, interpret, dropout_rate, seed)


def _fused_attention_fwd(q, k, v, bias, interpret, dropout_rate, seed):
    out = _fwd(q, k, v, bias, interpret, dropout_rate, seed)
    return out, (q, k, v, bias, seed)


def _fused_attention_bwd(interpret, dropout_rate, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _bwd(q, k, v, bias, g, interpret, dropout_rate, seed)
    return dq, dk, dv, None, None


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    interpret: Optional[bool] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jax.Array] = None) -> jax.Array:
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
                            dropout_seed)
