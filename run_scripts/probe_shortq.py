"""Probe the short-query pallas SIGABRT (round-4, VERDICT item 5).

Round-3 found the teacher-forced T5 CROSS-attention shape (q 12 x k 512)
aborts the TPU backend compiler (jellyfish 'Check failed: limits[i] <=
dim(i) (4 vs. 1)') while dec-self 12x12 and enc-self 512x512 compile fine
(run_scripts/probe_t5_attn_shapes.py, PERF.md batch37).  VERDICT r3 asks
whether padding Sq to a larger block inside the kernel entry avoids the
crash before falling back to a general route-to-xla shape guard.

Each case runs in a SUBPROCESS (the failure is a process abort, not an
exception).  Usage:
  python run_scripts/probe_shortq.py driver      # run the matrix
  python run_scripts/probe_shortq.py one SQPAD DROPOUT SK   # single case
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(sq_pad: int, dropout: int, sk: int, bias_kind: str,
            layout: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    from mm_vqa_healthcare_tpu.ops.flash_attention import (
        fused_attention, fused_attention_packed)

    rng = np.random.default_rng(0)
    sq = 12 if sq_pad <= 128 else sq_pad
    h, d = 8, 64
    q = jnp.asarray(rng.normal(size=(32, h, sq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(32, h, sk, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(32, h, sk, d)), jnp.bfloat16)
    if sq_pad > sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        sq = sq_pad
    if bias_kind == "none":
        bias = None
    elif bias_kind == "bq1":          # broadcast q axis (size 1)
        bias = jnp.asarray(rng.normal(size=(1, h, 1, sk)), jnp.float32)
    else:                             # full [1,H,Sq,Sk]
        bias = jnp.asarray(rng.normal(size=(1, h, sq, sk)), jnp.float32)
    rate = 0.1 if dropout else 0.0
    seed = jnp.zeros((), jnp.int32)

    if layout == "packed":
        qp = q.transpose(0, 2, 1, 3).reshape(32, sq, h * d)
        kp = k.transpose(0, 2, 1, 3).reshape(32, sk, h * d)
        vp = v.transpose(0, 2, 1, 3).reshape(32, sk, h * d)

        def fwd(qp):
            out = fused_attention_packed(qp, kp, vp, h, bias,
                                         dropout_rate=rate,
                                         dropout_seed=seed, scale=1.0)
            return jnp.sum(out.astype(jnp.float32))
        arg = qp
    else:
        def fwd(q):
            out = fused_attention(q, k, v, bias, dropout_rate=rate,
                                  dropout_seed=seed, scale=1.0)
            return jnp.sum(out.astype(jnp.float32))
        arg = q

    for what, fn in [("fwd", fwd), ("grad", jax.grad(fwd))]:
        jax.jit(fn).lower(arg).compile()
        print(f"layout={layout} sq={sq} sk={sk} bias={bias_kind} "
              f"dropout={dropout} {what}: OK", flush=True)


CASES = [
    # (sq_pad, dropout, sk, bias_kind, layout)
    (12, 0, 512, "none", "split"),    # the T5 cross shape, no-bias kernel
    (12, 1, 512, "none", "split"),
    (12, 0, 512, "none", "packed"),
    (577, 0, 577, "none", "split"),
    (577, 0, 577, "none", "packed"),  # the clip16 image self-attn family
    (577, 1, 577, "none", "packed"),
]


def driver() -> None:
    for case in CASES:
        sq_pad, dropout, sk, bias_kind, layout = case
        r = subprocess.run(
            [sys.executable, __file__, "one", str(sq_pad), str(dropout),
             str(sk), bias_kind, layout],
            capture_output=True, text=True, timeout=2400)
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        status = "OK" if r.returncode == 0 else f"CRASH rc={r.returncode}"
        print(f"case {case}: {status}")
        for line in tail:
            print(f"    {line}")


if __name__ == "__main__":
    if sys.argv[1] == "one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5], sys.argv[6])
    else:
        driver()
