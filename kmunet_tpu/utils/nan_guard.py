"""NaN guard — the reference's forward-hook NaN detector, JAX-style.

The reference registers a hook raising on NaN in any module output
(`train_shanghai.py:287-294`, nan_hook). Under jit we can't hook modules,
but we can (a) checkify whole functions, or (b) intercept every flax module
output via ``nn.intercept_methods`` when running un-jitted for debugging.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def assert_finite(tree, where: str = ""):
    """Host-side check on a pytree of arrays; raises ValueError on NaN/Inf."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            name = "/".join(str(p) for p in path)
            raise ValueError(f"non-finite values in {where}{name}")


def nan_hook_interceptor(next_fun, args, kwargs, context):
    """flax interceptor: raise (via debug callback) on NaN in any module
    output. Use:

        with nn.intercept_methods(nan_hook_interceptor):
            model.apply(variables, x)
    """
    out = next_fun(*args, **kwargs)

    def check(leaf):
        if isinstance(leaf, jnp.ndarray) and jnp.issubdtype(leaf.dtype, jnp.floating):
            has_nan = jnp.isnan(leaf).any()
            jax.debug.callback(
                _raise_if, has_nan, f"{context.module.name}.{context.method_name}"
            )
        return leaf

    jax.tree.map(check, out)
    return out


def _raise_if(flag, where):
    if bool(flag):
        raise ValueError(f"NaN detected in {where}")


def guard(fn: Callable) -> Callable:
    """Wrap a jitted step function so non-finite losses abort with context."""

    def wrapped(*args, **kwargs):
        out = fn(*args, **kwargs)
        metrics = out[1] if isinstance(out, tuple) and isinstance(out[1], dict) else None
        if metrics and "loss" in metrics:
            jax.debug.callback(_raise_if, jnp.isnan(metrics["loss"]), "train loss")
        return out

    return wrapped
