"""Attention / normalization blocks used by KM_UNetV3.

Re-derivations from `/root/reference/KM_UNetV3_SH.py`:
ChannelAttention (:314-332), LocalContrastAttention (:336-368),
MultiScaleFusion (:287-311), TripleNorm (:266-284), DirectionAttention
(:215-263). NHWC layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch


def _dense(f, name=None):
    return nn.Dense(f, kernel_init=kaiming_uniform_torch(), name=name)


class ChannelAttention(nn.Module):
    """SE-style gate: GAP -> Linear/SiLU/Linear/sigmoid -> scale (ref :314-332)."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = _dense(c // self.reduction)(y)
        y = jax.nn.silu(y)
        y = jax.nn.sigmoid(_dense(c)(y))
        return x * y[:, None, None, :]


class LocalContrastAttention(nn.Module):
    """Grouped-channel-reduced SE with x*(1-g)+g blend (ref :336-368).

    The channel average is reduced by averaging each consecutive group of
    ``reduction_ratio`` channels before the MLP; the gate blends the input
    toward 1.0 rather than scaling it.
    """

    reduction_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        avg = jnp.mean(x, axis=(1, 2))  # (B, C)
        avg_reduced = avg.reshape(B, C // self.reduction_ratio, self.reduction_ratio).mean(-1)
        g = _dense(64)(avg_reduced)
        g = nn.relu(g)
        g = jax.nn.sigmoid(_dense(C)(g))
        g = g[:, None, None, :]
        return x * (1.0 - g) + g


class TripleNorm(nn.Module):
    """Mean of H-, W- and C-axis norms (ref :266-284).

    The reference's "height" and "width" norms are both GroupNorm(1) —
    permuting H/W does not change full-(C,H,W) statistics — but each carries
    its own affine parameters, so both are kept. The channel norm is a
    LayerNorm over C.
    """

    @nn.compact
    def __call__(self, x):
        # epsilon=1e-5 matches the torch norm default (flax uses 1e-6).
        h_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm_h")(x)
        w_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm_w")(x)
        c_norm = nn.LayerNorm(epsilon=1e-5, name="norm_c")(x)
        return (h_norm + w_norm + c_norm) / 3.0


class MultiScaleFusion(nn.Module):
    """3/5/7-kernel branch fusion + channel attention (ref :287-311).

    ``channels`` lists the per-branch input channel counts; every branch
    projects to channels[-1].
    """

    channels: tuple[int, ...]
    reduction: int = 4

    @nn.compact
    def __call__(self, features):
        out_c = self.channels[-1]
        resized = []
        for i, (feat, s) in enumerate(zip(features, (3, 5, 7))):
            y = nn.Conv(
                out_c, (s, s), padding=s // 2,
                kernel_init=kaiming_uniform_torch(), name=f"branch{i}",
            )(feat)
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5)(y)  # torch eps
            resized.append(jax.nn.silu(y))
        fused = jnp.concatenate(resized, axis=-1)
        fused = nn.Conv(out_c, (1, 1), kernel_init=kaiming_uniform_torch())(fused)
        fused = nn.Conv(
            out_c, (3, 3), padding="SAME", kernel_init=kaiming_uniform_torch()
        )(fused)
        return ChannelAttention(self.reduction)(fused)


class DirectionAttention(nn.Module):
    """Direction-gated local attention: sigmoid(q*k)*v with a pooled channel
    gate (ref :215-263).

    Note: all three pooling modes reduce to a global channel mean before the
    gate MLP (height pools W then means H, etc.) — computed as written.
    """

    mode: str = "height"

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pooled = jnp.mean(x, axis=(1, 2))  # every mode ends at (B, C)

        w = _dense(C // 4)(pooled)
        w = nn.gelu(w, approximate=False)
        w = jax.nn.sigmoid(_dense(C)(w))

        qkv = nn.Conv(3 * C, (1, 1), kernel_init=kaiming_uniform_torch(), name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jax.nn.sigmoid(q * k) * v
        attn = nn.Conv(
            C, (3, 3), padding="SAME", feature_group_count=C,
            kernel_init=kaiming_uniform_torch(), name="conv",
        )(attn)
        return attn * w[:, None, None, :]
