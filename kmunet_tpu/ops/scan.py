"""Selective SSM scan — the TPU replacement for mamba_ssm's CUDA kernel.

The recurrence (Mamba / S6):

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t * x_t
    y_t = C_t . h_t + D * x_t

is a first-order linear recurrence, solved in log-depth with
``jax.lax.associative_scan`` over (decay, increment) pairs — mathematically
identical to the sequential CUDA scan in `mamba_ssm` (used by
`/root/reference/models/Mamba_UNet.py:51-52`). State is carried in fp32 (the
reference forces fp32 into Mamba, Mamba_UNet.py:25-26); a Pallas chunked
variant can replace this for long L (kernels/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def selective_scan(
    x: jnp.ndarray,      # (B, L, D)   input sequence (post-conv, pre-gate)
    dt: jnp.ndarray,     # (B, L, D)   positive step sizes (softplus'd)
    A: jnp.ndarray,      # (D, N)      negative-real state matrix
    Bmat: jnp.ndarray,   # (B, L, N)   input projection (input-dependent)
    Cmat: jnp.ndarray,   # (B, L, N)   output projection (input-dependent)
    D: jnp.ndarray,      # (D,)        skip weights
) -> jnp.ndarray:
    """Returns y: (B, L, D)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    decay = jnp.exp(dtf[..., None] * A.astype(jnp.float32))           # (B,L,D,N)
    inc = (dtf * xf)[..., None] * Bmat.astype(jnp.float32)[:, :, None, :]  # (B,L,D,N)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (decay, inc), axis=1)
    y = jnp.einsum("bldn,bln->bld", h, Cmat.astype(jnp.float32))
    y = y + xf * D.astype(jnp.float32)
    return y.astype(dtype)
