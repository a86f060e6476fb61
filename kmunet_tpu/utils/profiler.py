"""Profiling helpers: jax.profiler traces + honest step timing.

The reference only has static FLOP counting (SURVEY.md §5 Tracing). Here:
- ``trace(dir)``: context manager around jax.profiler (TensorBoard format).
- ``chained_time_ms``: the only valid wall-clock method in this environment
  (the remote-TPU tunnel does not honor block_until_ready — see
  memory/axon-tpu-quirks): run N iterations inside one jitted fori_loop with
  a data dependency and force a scalar readback.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_time_ms(apply_fn: Callable, *xs, iters: int = 50) -> float:
    """Mean per-iteration time of ``apply_fn(*xs)`` with chained dependencies.

    Note: the measurement includes ONE host readback (~25 ms RTT through the
    tunnel) amortized over ``iters`` — keep iters >= 50 for sub-ms ops.
    """

    @jax.jit
    def run(*xs):
        def body(i, c):
            # args and result may be pytrees (lists of feature maps, param
            # dicts): perturb ONE floating leaf per top-level arg (so a
            # params tree doesn't add a full-tree multiply to every timed
            # iteration), reduce over all floating output leaves.
            def perturb(arg):
                leaves, treedef = jax.tree.flatten(arg)
                for j, leaf in enumerate(leaves):
                    if hasattr(leaf, "dtype") and jnp.issubdtype(
                            leaf.dtype, jnp.floating):
                        leaves[j] = leaf * (1.0 + 1e-20 * c).astype(leaf.dtype)
                        break
                return jax.tree.unflatten(treedef, leaves)

            y = apply_fn(*[perturb(x) for x in xs])
            leaves = [jnp.mean(l.astype(jnp.float32))
                      for l in jax.tree.leaves(y)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return c + sum(leaves) / max(len(leaves), 1)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(run(*xs))  # compile + warm
    t0 = time.perf_counter()
    float(run(*xs))
    return (time.perf_counter() - t0) / iters * 1e3
