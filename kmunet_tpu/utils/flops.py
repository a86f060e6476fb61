"""Analytic cost estimation, reproducing the reference's flops() API.

The reference counts FLOPs with fvcore / hand-written flops() methods
(SURVEY.md §5 Tracing). On JAX the compiler already knows most of it: we
lower the jitted function and read the XLA cost analysis. Two gaps the
VERDICT r2 audit flagged, both closed here:

- **Pallas custom-calls count as 0 FLOPs.** Kernels report their *useful*
  operation count (the math a minimal sequential implementation performs,
  not the kernel's internal formulation) through ``record_custom_flops``,
  collected at trace time by the ``tally_custom_flops`` context manager.
- **``lax.scan``/while-loop bodies are counted once, not x trip-count.**
  For the RNN zoo models, count on a clone with ``unroll >= seq_len``
  (models/ef.py ``unroll`` attribute) via ``lowered_flops`` — lowering the
  unrolled graph is cheap (no backend compile) and pre-optimization HLO
  FLOPs are exactly operation-count math.
"""

from __future__ import annotations

from typing import Optional

import jax

_TALLY: Optional[list] = None


def record_custom_flops(n: float) -> None:
    """Called by Pallas-kernel wrappers at trace time with the kernel's
    useful FLOP count for the given shapes."""
    if _TALLY is not None:
        _TALLY.append(float(n))


class tally_custom_flops:
    """Context manager collecting custom-call FLOPs recorded during tracing.

    with tally_custom_flops() as t:
        lowered = jax.jit(fn).lower(*args)   # tracing happens here
    total = lowered.cost_analysis()["flops"] + t.total
    """

    def __enter__(self):
        global _TALLY
        self._prev = _TALLY
        _TALLY = []
        self._records = _TALLY
        return self

    def __exit__(self, *exc):
        global _TALLY
        _TALLY = self._prev
        return False

    @property
    def total(self) -> float:
        return float(sum(self._records))


def _cost_dict(cost) -> dict:
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    if cost is None:
        return {"flops": -1.0, "bytes_accessed": -1.0}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


def flops_of(fn, *args) -> dict:
    """Compile ``fn(*args)`` and return post-optimization XLA cost
    {'flops', 'bytes_accessed', 'custom_flops'} (custom_flops = Pallas
    kernels' useful FLOPs, recorded during trace)."""
    with tally_custom_flops() as t:
        lowered = jax.jit(fn).lower(*args)
    cost = _cost_dict(lowered.compile().cost_analysis())
    cost["custom_flops"] = t.total
    return cost


def lowered_flops(fn, *args) -> dict:
    """Like flops_of but on the *unoptimized* lowered HLO — no backend
    compile, so cheap even for fully-unrolled recurrences; FLOPs equal
    plain operation-count math.

    Some PJRT backends (the remote-TPU tunnel) return None from
    pre-compile cost analysis; FLOP counts are backend-independent, so
    fall back to lowering the same function for the host CPU.
    """
    with tally_custom_flops() as t:
        lowered = jax.jit(fn).lower(*args)
    cost = _cost_dict(lowered.cost_analysis())
    if cost["flops"] < 0:
        # TPU Pallas custom-calls cannot lower for CPU: force the XLA
        # formulations for this count-only lowering (their HLO FLOPs are
        # the operation count the tally would otherwise have reported).
        from kmunet_tpu.ops import sample, scan

        cpu = jax.devices("cpu")[0]
        old_g, old_s = sample.USE_PALLAS_GATHER, scan.USE_PALLAS_SCAN
        sample.USE_PALLAS_GATHER, scan.USE_PALLAS_SCAN = False, False
        try:
            with jax.default_device(cpu):
                with tally_custom_flops() as t:
                    lowered = jax.jit(fn).lower(*args)
        finally:
            sample.USE_PALLAS_GATHER, scan.USE_PALLAS_SCAN = old_g, old_s
        cost = _cost_dict(lowered.cost_analysis())
    cost["custom_flops"] = t.total
    return cost
