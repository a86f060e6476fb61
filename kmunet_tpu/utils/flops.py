"""Analytic cost estimation via XLA, reproducing the reference's flops() API.

The reference counts FLOPs with fvcore / hand-written flops() methods
(SURVEY.md §5 Tracing). On JAX the compiler already knows: we lower the
jitted function and read the XLA cost analysis.
"""

from __future__ import annotations

import jax


def flops_of(fn, *args) -> dict:
    """Compile ``fn(*args)`` and return {'flops': ..., 'bytes': ...}."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }
