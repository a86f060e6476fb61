#!/usr/bin/env python
"""Round-5 TrajGRU decode experiment (VERDICT r4 #5).

The recurrent decode is three STAGED time-scans (fore_rnn3 finishes all T
steps before fore_rnn2 starts — models/ef.py:221-231, mirroring
TrajGru.py:166-210), so cross-level warp batching is impossible without a
wavefront pipeline. The per-step bodies at 4^2/8^2 x 192ch are tiny; the
hypothesis is that `lax.while` per-step overhead + unfusable step
boundaries dominate, which `nn.scan(unroll=k)` removes directly.

Measures TrajGRU_EF forward fps at the bench config (B16, 128^2, 5-in,
20-out, bf16 params+input) for unroll in {1, 4, 10, 20}.

Usage: python scripts/diag_trajgru_unroll.py [unrolls...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kmunet_tpu.configs import ModelConfig
from kmunet_tpu.models import zoo

B, IMG, OUT = 16, 128, 20


def bf16_tree(t):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)


def main():
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 4, 10, 20]
    model = zoo.build(ModelConfig(name="trajgru", num_classes=OUT))
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 5, IMG, IMG))
    variables = bf16_tree(
        jax.jit(model.init)(jax.random.PRNGKey(1), jnp.zeros((1, 5, IMG, IMG))))
    x = x.astype(jnp.bfloat16)

    for u in unrolls:
        m = model.clone(unroll=u)
        # block_until_ready is a no-op on the remote tunnel — sync with a
        # scalar readback (see bench.py timing methodology).
        fn = jax.jit(lambda v, xx, m=m: jnp.sum(m.apply(v, xx)
                                                .astype(jnp.float32)))
        t0 = time.perf_counter()
        _ = float(fn(variables, x))
        compile_s = time.perf_counter() - t0
        _ = float(fn(variables, x))  # absorb second-execution penalty
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            _ = float(fn(variables, x))
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "unroll": u, "ms": round(dt * 1e3, 1),
            "fps_per_chip": round(B * OUT / dt, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
