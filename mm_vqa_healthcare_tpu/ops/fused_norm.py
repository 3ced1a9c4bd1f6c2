"""Fused LayerNorm Pallas kernels for TPU.

The round-2 train profile showed the XLA lowering of the fp32-stat
LayerNorm (36 sites on [16,577,768] activations) costing ~14.5 ms/step
across `convert+reduce` chains — ~5x the HBM floor.  This kernel does the
whole thing in one VMEM pass per row-block: upcast, mean/var, normalize,
scale+bias, downcast.  The backward recomputes the (cheap) statistics
instead of stashing them and emits per-block partial dscale/dbias sums
that XLA reduces outside.

Numerics are IDENTICAL to models/layers.LayerNorm's XLA path: statistics
in float32, parameters upcast to float32, output cast back to the input
dtype (reference fp16-safe LayerNorm, clip_model.py:27-33).

Row-local op: blocks that overrun the row count produce garbage rows that
are dropped on the masked write (forward) and explicitly zeroed before the
cross-row dscale/dbias sums (backward).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 512          # rows per grid step ([512, 768] fp32 = 1.5 MB)
_LANE = 128
# Ablation knob: MMVQA_FUSED_LN_BWD=0 keeps the pallas forward but computes
# the backward with plain XLA ops (lets XLA fuse dy into adjacent work).
_PALLAS_BWD = os.environ.get("MMVQA_FUSED_LN_BWD", "1") == "1"


def _valid_rows(block_rows: int, n_rows: int):
    base = pl.program_id(0) * block_rows
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    return idx < n_rows


def _ln_fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)                    # [R, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(x_ref, s_ref, dy_ref, dx_ref, ds_ref, db_ref,
                   *, eps, n_rows):
    valid = _valid_rows(x_ref.shape[0], n_rows)
    x = jnp.where(valid, x_ref[...], 0).astype(jnp.float32)
    dy = jnp.where(valid, dy_ref[...], 0).astype(jnp.float32)
    scale = s_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    dxhat = dy * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    # per-block partial parameter grads (summed across blocks by XLA).
    # Partial rows are sublane-padded to 8 (Mosaic: block sublane dim must
    # be a multiple of 8 or the full array dim) — row 0 carries the sum,
    # rows 1..7 are zero.
    pad = jnp.zeros((7, x.shape[1]), jnp.float32)
    ds_ref[...] = jnp.concatenate(
        [jnp.sum(dy * xhat, axis=0, keepdims=True), pad], axis=0)
    db_ref[...] = jnp.concatenate(
        [jnp.sum(dy, axis=0, keepdims=True), pad], axis=0)


def _fwd(x2, scale, bias, eps, interpret):
    from mm_vqa_healthcare_tpu.ops.pallas_checks import check_block
    n, d = x2.shape
    check_block((_ROWS, d), (n, d), "ln fwd x")
    grid = (pl.cdiv(n, _ROWS),)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, d), bias.reshape(1, d))


def _bwd(x2, scale, dy2, eps, interpret):
    from mm_vqa_healthcare_tpu.ops.pallas_checks import check_block
    n, d = x2.shape
    nblocks = pl.cdiv(n, _ROWS)
    check_block((_ROWS, d), (n, d), "ln bwd x")
    check_block((8, d), (nblocks * 8, d), "ln bwd partials")
    dx, ds_part, db_part = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps, n_rows=n),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROWS, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((nblocks * 8, d), jnp.float32),
            jax.ShapeDtypeStruct((nblocks * 8, d), jnp.float32),
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, d), dy2)
    return dx, ds_part.sum(0), db_part.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_layer_norm(x2, scale, bias, eps, interpret):
    return _fwd(x2, scale, bias, eps, interpret)


def _fused_ln_fwd(x2, scale, bias, eps, interpret):
    return _fwd(x2, scale, bias, eps, interpret), (x2, scale)


def _bwd_xla(x2, scale, dy2, eps):
    """Same math as _ln_bwd_kernel, left to XLA to schedule/fuse."""
    x = x2.astype(jnp.float32)
    dy = dy2.astype(jnp.float32)
    s = scale.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    dxhat = dy * s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x2.dtype)
    return dx, jnp.sum(dy * xhat, axis=0), jnp.sum(dy, axis=0)


def _fused_ln_bwd(eps, interpret, res, dy2):
    x2, scale = res
    if _PALLAS_BWD:
        dx, dscale, dbias = _bwd(x2, scale, dy2, eps, interpret)
    else:
        dx, dscale, dbias = _bwd_xla(x2, scale, dy2, eps)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_fused_layer_norm.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def supports(d: int) -> bool:
    """Kernel handles lane-aligned feature dims."""
    return d % _LANE == 0


def fused_layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float = 1e-5,
                     interpret: Optional[bool] = None) -> jax.Array:
    """LayerNorm over the last axis, fp32 statistics, any leading shape."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    d = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    out = _fused_layer_norm(x2, scale, bias, float(eps), interpret)
    return out.reshape(*lead, d)
