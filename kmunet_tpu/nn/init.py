"""Initializers replicating the reference's (PyTorch) weight distributions.

Training-from-scratch parity depends on matching init *distributions*, not
bitwise values. PyTorch's defaults that matter here:

- ``nn.Conv2d`` / ``nn.Linear`` default: kaiming_uniform(a=sqrt(5)) on the
  weight — i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — and the same bound for
  the bias.
- ``kaiming_normal_(mode='fan_out')`` where the reference calls it explicitly
  (KM_UNetV3_SH.py:64-69).
"""

from __future__ import annotations

import numpy as np
import jax


def _fan_in_out(shape):
    """Fans for an HWIO conv kernel or (in, out) dense kernel."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_uniform_torch(scale: float = 1.0):
    """PyTorch default layer init: U(-b, b), b = scale/sqrt(fan_in)."""

    def init(key, shape, dtype=jax.numpy.float32):
        fan_in, _ = _fan_in_out(shape)
        bound = scale / np.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_normal_fanout():
    """kaiming_normal_(mode='fan_out', nonlinearity='leaky_relu' default)."""

    def init(key, shape, dtype=jax.numpy.float32):
        _, fan_out = _fan_in_out(shape)
        std = np.sqrt(2.0 / max(fan_out, 1))
        return std * jax.random.normal(key, shape, dtype)

    return init


def bias_uniform_torch():
    """PyTorch default bias init: U(-1/sqrt(fan_in), ...) with the *layer's*
    fan_in. Flax passes the bias shape, so callers must wrap with the kernel
    fan_in; for simplicity we expose a factory taking fan_in explicitly."""

    def factory(fan_in: int):
        def init(key, shape, dtype=jax.numpy.float32):
            bound = 1.0 / np.sqrt(max(fan_in, 1))
            return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

        return init

    return factory


def normal_init(std: float = 1.0, mean: float = 0.0):
    def init(key, shape, dtype=jax.numpy.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init
