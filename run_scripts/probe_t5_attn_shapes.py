"""Bisect the batch37 t5_train TPU compile crash (jellyfish
'Check failed: limits[i] <= dim(i) (4 vs. 1)'): compile each NEW attention
shape family introduced by the kernel-routed T5 attention, one at a time,
fwd and grad, dropout on/off.  Run on the real chip (ambient env)."""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from mm_vqa_healthcare_tpu.ops.attention import dot_product_attention


def probe(name, qs, ks, bias_shape, dropout):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=qs), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=ks), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=ks), jnp.bfloat16)
    bias = (None if bias_shape is None
            else jnp.asarray(rng.normal(size=bias_shape), jnp.float32))
    rate = 0.1 if dropout else 0.0
    key = jax.random.key(0) if dropout else None

    def fwd(q):
        return jnp.sum(dot_product_attention(
            q, k, v, bias, impl="pallas", scale=1.0,
            dropout_rate=rate, dropout_rng=key).astype(jnp.float32))

    for what, fn in [("fwd", fwd), ("grad", jax.grad(fwd))]:
        try:
            jax.jit(fn).lower(q).compile()
            print(f"{name} {what} dropout={dropout}: OK", flush=True)
        except Exception as e:
            print(f"{name} {what} dropout={dropout}: FAIL {type(e).__name__}:"
                  f" {str(e)[:200]}", flush=True)
            return False
    return True


if __name__ == "__main__":
    cases = [
        ("enc-self", (32, 8, 512, 64), (32, 8, 512, 64), (1, 8, 512, 512)),
        ("dec-self", (32, 8, 12, 64), (32, 8, 12, 64), (1, 8, 12, 12)),
        ("dec-cross", (32, 8, 12, 64), (32, 8, 512, 64), None),
    ]
    for name, qs, ks, bs in cases:
        for dropout in (False, True):
            probe(name, qs, ks, bs, dropout)
