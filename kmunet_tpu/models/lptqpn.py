"""LPTQPN baseline: Restormer-style transposed-attention U-Net.

Re-derivation of `/root/reference/models/lptqpn.py:199-316` (NHWC):
channel-wise "Multi-Head Squared Attention" with **sigmoid** (not softmax)
attention, gated-DConv FFN, sigmoid-LayerNorm (the bias-free LN is wrapped in
a sigmoid — lptqpn.py:36, an unusual but load-bearing choice), pixel-shuffle
up/down resizing, last-input-frame residual and a learnable-Swish head.

The channel-transposed attention (C x C gram over L) is pure matmuls -> MXU.
The ConvectionDiffusionLoss in the reference is dead code (references the
nonexistent ``F.mse``, lptqpn.py:193) and is not ported.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.nn.resample import pixel_shuffle, pixel_unshuffle


def _conv(f, k, bias, name=None, groups=1):
    return nn.Conv(
        f, (k, k), padding="SAME", use_bias=bias, feature_group_count=groups,
        kernel_init=kaiming_uniform_torch(), name=name,
    )


class SigmoidLayerNorm(nn.Module):
    """Bias-free channel LayerNorm followed by sigmoid (lptqpn.py:20-46)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mu = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
        w = self.param("weight", nn.initializers.ones, (c,))
        return jax.nn.sigmoid((x - mu) * jax.lax.rsqrt(var + 1e-5) * w)


class SquaredAttention(nn.Module):
    """Channel-transposed multi-head attention with sigmoid scores
    (lptqpn.py:73-105)."""

    num_heads: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hd = self.num_heads
        ch = C // hd
        qkv = _conv(3 * C, 1, self.bias, name="qkv")(x)
        qkv = _conv(3 * C, 3, self.bias, name="qkv_dwconv", groups=3 * C)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, H, W, C) -> (B, hd, ch, L)
            return t.reshape(B, H * W, hd, ch).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        temp = self.param("temperature", nn.initializers.ones, (hd, 1, 1))
        attn = jax.nn.sigmoid(jnp.einsum("bhcl,bhdl->bhcd", q, k) * temp)
        out = jnp.einsum("bhcd,bhdl->bhcl", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(B, H, W, C)
        return _conv(C, 1, self.bias, name="project_out")(out)


class GDFN(nn.Module):
    """Gated-DConv feed-forward (lptqpn.py:50-68)."""

    expansion: float = 2.66
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        hidden = int(C * self.expansion)
        y = _conv(2 * hidden, 1, self.bias, name="project_in")(x)
        y = _conv(2 * hidden, 3, self.bias, name="dwconv", groups=2 * hidden)(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        y = nn.gelu(y1, approximate=False) * jax.nn.sigmoid(y2)
        return _conv(C, 1, self.bias, name="project_out")(y)


class TransformerBlock(nn.Module):
    num_heads: int
    expansion: float = 2.66
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = x + SquaredAttention(self.num_heads, self.bias, name="attn")(
            SigmoidLayerNorm(name="norm1")(x)
        )
        x = x + GDFN(self.expansion, self.bias, name="ffn")(
            SigmoidLayerNorm(name="norm2")(x)
        )
        return x


class LPTQPN(nn.Module):
    out_frames: int = 20
    dim: int = 20
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 2
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim

        def blocks(y, dim_i, n, h, name):
            for i in range(n):
                y = TransformerBlock(h, self.expansion, self.bias,
                                     name=f"{name}_{i}")(y)
            return y

        def down(y, f, name):  # conv(f/2) + pixel_unshuffle(2) -> 2f channels
            y = _conv(f // 2, 3, False, name=name)(y)
            return pixel_unshuffle(y, 2)

        def up(y, f, name):  # conv(2f) + pixel_shuffle(2) -> f/2 channels
            y = _conv(2 * f, 3, False, name=name)(y)
            return pixel_shuffle(y, 2)

        e1 = blocks(_conv(d, 3, False, name="patch_embed")(x),
                    d, self.num_blocks[0], self.heads[0], "enc1")
        e2 = blocks(down(e1, d, "down1"), 2 * d, self.num_blocks[1], self.heads[1], "enc2")
        e3 = blocks(down(e2, 2 * d, "down2"), 4 * d, self.num_blocks[2], self.heads[2], "enc3")
        central = blocks(down(e3, 4 * d, "down3"), 8 * d, self.num_blocks[3],
                         self.heads[3], "central")

        y = up(central, 8 * d, "up3")
        y = jnp.concatenate([y, e3], axis=-1)
        y = _conv(4 * d, 1, self.bias, name="reduce3")(y)
        y = blocks(y, 4 * d, self.num_blocks[2], self.heads[2], "dec3")

        y = up(y, 4 * d, "up2")
        y = jnp.concatenate([y, e2], axis=-1)
        y = _conv(2 * d, 1, self.bias, name="reduce2")(y)
        y = blocks(y, 2 * d, self.num_blocks[1], self.heads[1], "dec2")

        y = up(y, 2 * d, "up1")
        y = jnp.concatenate([y, e1], axis=-1)  # 2d channels, no reduce
        y = blocks(y, 2 * d, self.num_blocks[0], self.heads[0], "dec1")
        y = blocks(y, 2 * d, self.num_refinement_blocks, self.heads[0], "refine")

        y = _conv(self.out_frames, 3, self.bias, name="output")(y)
        y = y + x[..., -1:]  # last input frame residual (lptqpn.py:296)
        y = _conv(self.out_frames, 3, True, name="last_conv")(y)
        beta = self.param("swish_beta", nn.initializers.ones, ())
        return y * jax.nn.sigmoid(beta * y)
