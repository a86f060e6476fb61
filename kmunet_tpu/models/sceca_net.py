"""SCECA-Net baseline: UNet with SCConv feature-reconstruction + ECA.

Re-derivation of `/root/reference/models/SCECA_Net.py:243-322` (NHWC):
SRU spatial reconstruction via GroupNorm-gamma thresholded masks (doubles
channels), CRU split group/pointwise conv + SE, ECA 1D-conv channel
attention with log2-adaptive kernel, DenseLayer bottleneck (growth 32 x4,
dropout 0.5), 4-level UNet with align-corners bilinear ups.

SRU quirk kept: the hard (sigmoid(w) > 0.5) masks are non-differentiable
step functions — gradient flows only through the x factor, as in torch.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.sample import resize_bilinear


def _conv(f, k, bias=True, groups=1, name=None):
    return nn.Conv(
        f, (k, k), padding="SAME", use_bias=bias, feature_group_count=groups,
        kernel_init=kaiming_uniform_torch(), name=name,
    )


class SRU(nn.Module):
    """Spatial reconstruction: gamma-weighted binary channel masks (x2 ch)."""

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x_norm = nn.GroupNorm(num_groups=min(32, C), name="gn")(x)
        gamma = self.param("gamma", nn.initializers.ones, (C,))
        weights = gamma / jnp.sum(gamma)
        ws = jax.nn.sigmoid(weights)
        W1 = (ws > 0.5).astype(x.dtype)
        W2 = (ws <= 0.5).astype(x.dtype)
        del x_norm  # the reference computes but does not use the normed map
        return jnp.concatenate([x * W1, x * W2], axis=-1)


class CRU(nn.Module):
    """Channel reconstruction: split group/point convs + SE gate."""

    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        upper = C // 2
        x = _conv(C, 1, bias=False, name="compress")(x)
        xu, xl = x[..., :upper], x[..., upper:]
        y1 = _conv(upper, 3, bias=False, groups=upper, name="gwc")(xu) + _conv(
            upper, 1, bias=False, name="pwc1"
        )(xu)
        y2 = _conv(C - upper, 1, bias=False, name="pwc2")(xl) + xl
        y = jnp.concatenate([y1, y2], axis=-1)
        s = jnp.mean(y, axis=(1, 2))
        s = nn.relu(nn.Dense(C // self.reduction, use_bias=False,
                             kernel_init=kaiming_uniform_torch(), name="fc1")(s))
        a = jax.nn.sigmoid(nn.Dense(C, use_bias=False,
                                    kernel_init=kaiming_uniform_torch(), name="fc2")(s))
        return y * a[:, None, None, :]


class ECA(nn.Module):
    """Efficient channel attention with adaptive 1D kernel."""

    gamma: int = 2
    b: int = 1

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        t = int(abs((math.log2(C) + self.b) / self.gamma))
        k = t if t % 2 else t + 1
        y = jnp.mean(x, axis=(1, 2))[..., None]  # (B, C, 1)
        kern = self.param("conv_kernel", kaiming_uniform_torch(), (k, 1, 1))
        y = jax.lax.conv_general_dilated(
            y, kern, (1,), [(k // 2, k // 2)],
            dimension_numbers=("NLC", "LIO", "NLC"),
        )[..., 0]
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class SCECA(nn.Module):
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = SRU(name="sru")(x)          # 2C
        y = CRU(name="cru")(y)          # 2C
        y = ECA(name="eca")(y)
        return _conv(C, 1, bias=False, name="channel_adjust")(y)


class DenseLayer(nn.Module):
    growth_rate: int = 32
    num_layers: int = 4
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        feats = [x]
        for i in range(self.num_layers):
            cat = jnp.concatenate(feats, axis=-1)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5)(cat)
            y = _conv(self.growth_rate, 3, bias=False, name=f"dense{i}")(nn.relu(y))
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
            feats.append(y)
        final = jnp.concatenate(feats, axis=-1)
        return _conv(C, 1, bias=False, name="transition")(final)


class DoubleConv(nn.Module):
    features: int
    mid: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid or self.features
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)  # noqa: E731
        x = nn.relu(bn()(_conv(mid, 3, bias=False)(x)))
        return nn.relu(bn()(_conv(self.features, 3, bias=False)(x)))


class SCECANet(nn.Module):
    out_channels: int = 20
    features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = list(self.features)
        skips = []
        for i, f in enumerate(feats):
            x = DoubleConv(f, name=f"enc{i}")(x, train)
            xs = SCECA(name=f"sceca{i}")(x)
            skips.append(xs)
            x = nn.max_pool(xs, (2, 2), strides=(2, 2)) if i < len(feats) - 1 else xs

        x = DenseLayer(name="dense")(x, train)

        skips.reverse()
        for i, f in enumerate(feats[-2::-1]):
            B, H, W, _ = x.shape
            x = resize_bilinear(x, (2 * H, 2 * W), align_corners=True)
            skip = skips[i + 1]
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear(x, skip.shape[1:3], align_corners=True)
            x = jnp.concatenate([skip, x], axis=-1)
            x = DoubleConv(f, name=f"dec{i}")(x, train)

        return nn.Conv(self.out_channels, (1, 1),
                       kernel_init=kaiming_uniform_torch(), name="output")(x)
