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
            y = apply_fn(*[x * (1.0 + 1e-20 * c) for x in xs])
            return c + jnp.mean(
                y.astype(jnp.float32) if hasattr(y, "astype") else jnp.float32(0)
            )

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(run(*xs))  # compile + warm
    t0 = time.perf_counter()
    float(run(*xs))
    return (time.perf_counter() - t0) / iters * 1e3
