"""Probe the window-batched packed attention (MMVQA_ATTN_WB) on the real
chip, one swin-base-384 stage shape at a time: does each wb compile under
Mosaic's 16 MB scoped-vmem limit, and what does it do to kernel wall time?

Motivation: the batch36 swin train profile — 49.8 ms/step of attention
custom-calls for ~3 ms of MXU math over a 2048-program grid moving ~36 KB
per operand.  First full-model attempt (contaminated batch40 lane 1) OOMed
scoped vmem at stage2/wb=8, so this bisects per stage before re-enabling.

Usage: python run_scripts/probe_swin_wb.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

import mm_vqa_healthcare_tpu.ops.flash_attention as fa

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 50

# swin-base @384, per-chip image batch 32: (window-batch b, heads, nW)
STAGES = [
    ("s1", 2048, 4, 64),
    ("s2", 512, 8, 16),
    ("s3", 128, 16, 4),
    ("s4", 32, 32, 1),
]
D = 32
N = 144


def bench_one(name, b, h, nw, wb_mode):
    fa._PACKED_WB = wb_mode
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, N, h * D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, N, h * D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, N, h * D)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(nw, h, N, N)), jnp.float32)

    def fwd(q, k, v):
        return jnp.sum(fa.fused_attention_packed(
            q, k, v, h, bias=bias, interpret=False).astype(jnp.float32))

    grad = jax.jit(jax.grad(fwd, argnums=(0, 1, 2)))
    fj = jax.jit(fwd)
    try:
        fj(q, k, v).block_until_ready()
        out = grad(q, k, v)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name} wb={wb_mode}: FAIL {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fj(q, k, v)
    r.block_until_ready()
    t_f = (time.perf_counter() - t0) / ITERS * 1e3
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = grad(q, k, v)
    jax.block_until_ready(out)
    t_g = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name} wb={wb_mode}: fwd {t_f:.3f} ms  grad {t_g:.3f} ms",
          flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} iters={ITERS}", flush=True)
    for name, b, h, nw in STAGES:
        for wb in ["1", "2", "4", "8"]:
            bench_one(name, b, h, nw, wb)
