"""EfficientViM HSM-SSD token mixer (hidden-state-mixer state-space duality).

Re-derivation of `/root/reference/vim_block_init/efficient_vim_init.py:14-97`.
The mixer compresses L = H*W spatial tokens into ``state_dim`` hidden states
with a softmax-weighted contraction, runs a gated MLP on the compressed
states, and scatters back:

    BCdt = DWConv3x3(1x1Conv(x))            # (L, 3N) per batch
    A    = softmax_L(dt + A_param)          # attention over tokens
    h    = x^T (A*B)                        # (N, C)  token->state compress
    h    = OutProj(h * silu(z) + h * D)     # gated MLP on N states
    y    = (h^T C)                          # (L, C)  state->token scatter

Everything is matmuls + a softmax — it maps directly onto the MXU, which is
why the XLA formulation here *is* the fast path (the reference's "SSD" needs
no sequential scan). Spatial sharding note: the h-contraction reduces over L,
so an H-sharded layout needs only a psum over the L shards (SURVEY.md §5).

Layouts are NHWC / (B, L, C) tokens; the reference is channel-first.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.nn.layers import ChannelLayerNorm, ConvBNAct, FFN


def _uniform_range(lo, hi):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi)

    return init


class HSMSSD(nn.Module):
    """Hidden-state-mixer SSD over (B, L, C) tokens; L must be a square."""

    d_model: int
    ssd_expand: int = 1
    state_dim: int = 64
    a_init_range: tuple[float, float] = (1.0, 16.0)

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        N = self.state_dim
        d_inner = int(self.ssd_expand * self.d_model)
        side = int(math.isqrt(L))
        if side * side != L:
            raise ValueError(f"HSMSSD assumes a square token grid, got L={L}")

        dense = lambda f, name: nn.Dense(  # noqa: E731  (1x1 conv == dense over C)
            f, use_bias=False, kernel_init=kaiming_uniform_torch(), name=name
        )

        # BCdt = DWConv3x3(1x1Conv(x)). Both are linear and bias-free, so they
        # compose exactly into ONE 3x3 conv with the rank-1 kernel
        # k[i,j,c,n] = proj[c,n] * dw[i,j,n] — one MXU pass instead of a 1x1
        # matmul + a VPU depthwise, and the (B, L, 3N) intermediate (12x wider
        # than x at stage 1) is never materialized in HBM.
        proj_k = self.param("BCdt_proj_kernel", kaiming_uniform_torch(), (C, 3 * N))
        dw_k = self.param("dw_kernel", kaiming_uniform_torch(), (3, 3, 1, 3 * N))
        comp = (proj_k[None, None] * dw_k).astype(x.dtype)  # (3,3,C,3N)
        bcdt = jax.lax.conv_general_dilated(
            x.reshape(B, side, side, C), comp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bcdt = bcdt.reshape(B, L, 3 * N)
        Bm, Cm, dt = jnp.split(bcdt, 3, axis=-1)  # each (B, L, N)

        A_param = self.param("A", _uniform_range(*self.a_init_range), (N,))
        # softmax_L(dt+A) is needed only inside the compress contraction, and
        # h is linear in it:  h = x^T(softmax(s)*B) = [x^T(exp(s-m)*B)] / d,
        # d[n] = sum_L exp(s-m): normalize AFTER the tiny (B, N, C) compress
        # instead of materializing the normalized (B, L, N) attention tensor.
        # Measured in-model effect on v5e: neutral (XLA already fused the
        # softmax chain to its effective-bandwidth roofline — BASELINE.md
        # round-2 ablation); kept because it states the fused-kernel identity
        # (kernels/ssd_mix_pallas.py) in the XLA path and feeds exp(s-m)*B
        # straight into the einsum operand.
        s = dt + A_param[None, None, :]
        m = jnp.max(s, axis=1, keepdims=True)                    # (B, 1, N)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=1)                               # (B, N)
        h = jnp.einsum("blc,bln->bnc", x, e * Bm) / denom[..., None]

        hz = dense(2 * d_inner, "hz_proj")(h)
        h_, z = jnp.split(hz, 2, axis=-1)
        D = self.param("D", nn.initializers.ones, (1,))
        h_ = dense(self.d_model, "out_proj")(h_ * jax.nn.silu(z) + h_ * D)

        y = jnp.einsum("bnc,bln->blc", h_, Cm)  # (B, L, C) scatter
        return y.reshape(B, side, side, self.d_model), h_


class EfficientViMBlock(nn.Module):
    """DWConv -> HSM-SSD -> DWConv -> FFN ladder with sigmoid LayerScale.

    Reference: efficient_vim_init.py:64-97. Each stage is blended as
    ``(1-a)*x + a*f(x)`` with per-channel a = sigmoid(alpha), alpha init 1e-4
    (so blocks start ~identity).
    """

    dim: int
    mlp_ratio: float = 4.0
    ssd_expand: int = 1
    state_dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        alpha = self.param("alpha", nn.initializers.constant(1e-4), (4, C))
        a = jax.nn.sigmoid(alpha)[:, None, None, :]  # (4,1,1,C)

        dw1 = ConvBNAct(C, (3, 3), groups=C, bn_weight_init=0.0, act=None, name="dwconv1")
        x = (1 - a[0]) * x + a[0] * dw1(x, train)

        x_prev = x
        tokens = ChannelLayerNorm(name="norm")(x.reshape(B, H * W, C))
        y, _h = HSMSSD(
            d_model=C, ssd_expand=self.ssd_expand, state_dim=self.state_dim, name="mixer"
        )(tokens)
        x = (1 - a[1]) * x_prev + a[1] * y

        dw2 = ConvBNAct(C, (3, 3), groups=C, bn_weight_init=0.0, act=None, name="dwconv2")
        x = (1 - a[2]) * x + a[2] * dw2(x, train)

        x = (1 - a[3]) * x + a[3] * FFN(int(C * self.mlp_ratio), name="ffn")(x, train)
        return x
