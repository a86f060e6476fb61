"""Mamba (S6) block, replicating ``mamba_ssm.Mamba`` semantics on TPU.

The reference's Mamba-UNet imports the pip ``mamba_ssm`` package whose
selective scan + causal conv1d are CUDA kernels
(`/root/reference/models/Mamba_UNet.py:4,14-19`; SURVEY.md §2.4). This module
is a from-scratch flax implementation of the same math:

    in_proj -> (x, z);  x -> causal depthwise conv1d(d_conv) -> silu
    x_proj(x) -> (dt_raw, B, C);  dt = softplus(dt_proj(dt_raw))
    A = -exp(A_log)  (init A = rows of 1..d_state);  D = 1
    y = selective_scan(x, dt, A, B, C, D) * silu(z) -> out_proj

Initialization follows mamba_ssm: dt_proj.weight ~ U(+-dt_rank^-0.5) *
dt_scale, dt_proj.bias = softplus^-1(dt) with dt ~ LogUniform(1e-3, 0.1).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.scan import selective_scan


def _a_log_init(d_inner: int, d_state: int):
    def init(key, shape, dtype=jnp.float32):
        A = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32), (d_inner, 1))
        return jnp.log(A).astype(dtype)

    return init


def _dt_bias_init(dt_min: float = 1e-3, dt_max: float = 0.1):
    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, 1e-4, None)
        # inverse softplus
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


class MambaBlock(nn.Module):
    """``seq_mesh``: when set (a jax.sharding.Mesh), the selective scan runs
    sequence-parallel via ``selective_scan_sharded`` — L sharded over
    ``seq_axis`` with ppermute carry exchange, batch over ``batch_axis``
    (SURVEY.md §5 long-context plan, active in-model)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    seq_mesh: object = None
    seq_axis: str = "spatial"
    batch_axis: str = "data"

    @nn.compact
    def __call__(self, x):
        """x: (B, L, D) -> (B, L, D)."""
        B, L, D = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)

        xz = nn.Dense(2 * d_inner, use_bias=False,
                      kernel_init=kaiming_uniform_torch(), name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        # Causal depthwise conv1d over L (kernel d_conv, bias, groups=d_inner)
        # == the `causal_conv1d` CUDA dep folded into XLA (SURVEY.md §2.4).
        conv_k = self.param(
            "conv1d_kernel", kaiming_uniform_torch(), (self.d_conv, 1, d_inner)
        )
        conv_b = self.param("conv1d_bias", nn.initializers.zeros, (d_inner,))
        xpad = jnp.pad(xs, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xc = jax.lax.conv_general_dilated(
            xpad, conv_k, (1,), "VALID",
            dimension_numbers=("NLC", "LIO", "NLC"), feature_group_count=d_inner,
        ) + conv_b
        xc = jax.nn.silu(xc)

        proj = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False,
                        kernel_init=kaiming_uniform_torch(), name="x_proj")(xc)
        dt_raw, Bm, Cm = jnp.split(proj, [dt_rank, dt_rank + self.d_state], axis=-1)

        dt_kernel = self.param(
            "dt_proj_kernel",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, minval=-(dt_rank**-0.5), maxval=dt_rank**-0.5
            ),
            (dt_rank, d_inner),
        )
        dt_bias = self.param("dt_proj_bias", _dt_bias_init(), (d_inner,))
        dt = jax.nn.softplus(dt_raw @ dt_kernel + dt_bias)

        A_log = self.param("A_log", _a_log_init(d_inner, self.d_state),
                           (d_inner, self.d_state))
        Dp = self.param("D", nn.initializers.ones, (d_inner,))
        A = -jnp.exp(A_log)

        if self.seq_mesh is not None:
            from kmunet_tpu.ops.scan import selective_scan_sharded

            y = selective_scan_sharded(
                xc, dt, A, Bm, Cm, Dp, self.seq_mesh, axis=self.seq_axis,
                batch_axis=self.batch_axis)
        else:
            y = selective_scan(xc, dt, A, Bm, Cm, Dp)
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False,
                        kernel_init=kaiming_uniform_torch(), name="out_proj")(y)
