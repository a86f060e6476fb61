"""Basic NHWC building blocks mirroring the reference's vim utils + misc.

Re-designed counterparts of `/root/reference/vim_block_init/vim_utils_init.py`
(LayerNorm1D/2D, ConvLayer1D/2D, FFN, Stem, PatchMerging) plus DropPath and
SqueezeExcite (the reference pulls those from timm). All tensors are NHWC;
"channel" norms therefore act on the last axis.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis of NHWC / NLC tensors.

    Equivalent to the reference's LayerNorm2D / LayerNorm1D
    (vim_utils_init.py:6-59): per-position mean/var over channels
    (biased variance), learned per-channel affine.
    """

    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            w = self.param("scale", nn.initializers.ones, (c,))
            b = self.param("bias", nn.initializers.zeros, (c,))
            y = y * w + b
        return y


class ConvBNAct(nn.Module):
    """Conv2d (bias-free) + optional BatchNorm + optional activation.

    TPU-native analogue of ConvLayer2D/ConvLayer1D (vim_utils_init.py:62-119);
    1x1 "Conv1d over channels" in the reference becomes the same NHWC conv
    here. ``bn_weight_init=0`` zero-inits the BN scale so residual branches
    start as identity (the reference's trick).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str | tuple = "SAME"
    groups: int = 1
    use_bn: bool = True
    bn_weight_init: float = 1.0
    act: Optional[Callable] = nn.relu
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kaiming_uniform_torch(),
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                scale_init=nn.initializers.constant(self.bn_weight_init),
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class Conv1x1(nn.Module):
    """Plain 1x1 conv with torch-default init (bias optional)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (1, 1),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or kaiming_uniform_torch(),
        )(x)


class FFN(nn.Module):
    """1x1 conv MLP: expand (BN+ReLU) then project (BN scale 0).

    Reference: vim_utils_init.py:122-130.
    """

    hidden: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = ConvBNAct(self.hidden, (1, 1))(x, train)
        x = ConvBNAct(c, (1, 1), act=None, bn_weight_init=0.0)(x, train)
        return x


class DropPath(nn.Module):
    """Stochastic depth over the batch axis (timm DropPath equivalent)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SqueezeExcite(nn.Module):
    """timm-style SE block (used by PatchMerging, vim_utils_init.py:154)."""

    rd_ratio: float = 0.25

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        rd = max(1, int(c * self.rd_ratio))
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(rd, (1, 1), kernel_init=kaiming_uniform_torch())(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), kernel_init=kaiming_uniform_torch())(s)
        return x * jax.nn.sigmoid(s)


class Stem(nn.Module):
    """16x downsampling conv stem (vim_utils_init.py:133-144)."""

    dim: int = 96

    @nn.compact
    def __call__(self, x, train: bool = False):
        for d, act in [
            (self.dim // 8, nn.relu),
            (self.dim // 4, nn.relu),
            (self.dim // 2, nn.relu),
            (self.dim, None),
        ]:
            x = ConvBNAct(d, (3, 3), strides=(2, 2), act=act)(x, train)
        return x


class PatchMerging(nn.Module):
    """SE-augmented downsampling merge (vim_utils_init.py:147-165)."""

    out_dim: int
    ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_dim = x.shape[-1]
        hidden = int(self.out_dim * self.ratio)
        x = x + ConvBNAct(in_dim, (3, 3), groups=in_dim, act=None)(x, train)
        y = ConvBNAct(hidden, (1, 1))(x, train)
        y = ConvBNAct(hidden, (3, 3), strides=(2, 2), groups=hidden)(y, train)
        y = SqueezeExcite()(y)
        y = ConvBNAct(self.out_dim, (1, 1), act=None)(y, train)
        y = y + ConvBNAct(self.out_dim, (3, 3), groups=self.out_dim, act=None)(y, train)
        return y
