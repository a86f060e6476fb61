#!/usr/bin/env python
"""Round-4 diagnostic: where does the flagship train step's time go?

Times, on the live chip, the fwd and fwd+bwd of the bilinear-gather ops at
the flagship decoder shapes (the train-step bottleneck hypothesis: the
custom VJP recomputes through the XLA scatter-add formulation).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from kmunet_tpu.kernels.bilinear_pallas import (
    gather_bilinear_border, gather_bilinear_grouped)
from kmunet_tpu.ops.sample import bilinear_gather_xla, bilinear_gather_grouped_xla
from kmunet_tpu.utils.profiler import chained_time_ms


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = jax.random.PRNGKey(0)
    print(f"B={B} bf16; DySample decoder shapes (grouped G=4) fwd vs grad")
    for hw, c in ((16, 64), (32, 64), (64, 64)):
        k1, k2, k3 = jax.random.split(key, 3)
        img = jax.random.uniform(k1, (B, hw, hw, c), jnp.bfloat16)
        ho = 2 * hw
        x = jax.random.uniform(k2, (B, 4, ho, ho), jnp.float32) * (hw - 1)
        y = jax.random.uniform(k3, (B, 4, ho, ho), jnp.float32) * (hw - 1)

        fwd = lambda i, a, b: gather_bilinear_grouped(i, a, b)
        loss = lambda i, a, b: jnp.sum(fwd(i, a, b).astype(jnp.float32) ** 2)
        ms_f = chained_time_ms(fwd, img, x, y, iters=10)
        ms_g = chained_time_ms(jax.grad(loss, argnums=(0, 1, 2)), img, x, y,
                               iters=10)
        # decompose: grad wrt img only vs coords only
        ms_gi = chained_time_ms(jax.grad(loss, argnums=(0,)), img, x, y,
                                iters=10)
        ms_gc = chained_time_ms(jax.grad(loss, argnums=(1, 2)), img, x, y,
                                iters=10)
        # pure XLA fwd+bwd for reference
        lossx = lambda i, a, b: jnp.sum(
            bilinear_gather_grouped_xla(i, a, b).astype(jnp.float32) ** 2)
        ms_gx = chained_time_ms(jax.grad(lossx, argnums=(0, 1, 2)), img, x, y,
                                iters=10)
        print(f"grouped {hw}->{ho} C{c}: fwd {ms_f:7.2f}  grad(all) {ms_g:7.2f}"
              f"  grad(img) {ms_gi:7.2f}  grad(coords) {ms_gc:7.2f}"
              f"  grad(xla-all) {ms_gx:7.2f} ms")


if __name__ == "__main__":
    main()
