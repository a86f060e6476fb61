"""SmaAt-UNet baseline: depthwise-separable UNet with CBAM skip attention.

Re-derivation of `/root/reference/models/SmAt_Unet.py:299-358` (NHWC):
depthwise-separable double convs (kernels_per_layer=2), CBAM (channel +
spatial attention) on every skip, 4 down / 4 up with bilinear
(align_corners=True) upsampling, 1x1 output head. Input is the 5-frame stack
as channels; output is ``n_classes`` forecast frames as channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.sample import resize_bilinear


class DepthwiseSeparableConv(nn.Module):
    features: int
    kernels_per_layer: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(
            c * self.kernels_per_layer, (3, 3), padding="SAME",
            feature_group_count=c, kernel_init=kaiming_uniform_torch(),
            name="depthwise",
        )(x)
        return nn.Conv(
            self.features, (1, 1), kernel_init=kaiming_uniform_torch(),
            name="pointwise",
        )(x)


class DoubleConvDS(nn.Module):
    features: int
    mid_features: int | None = None
    kernels_per_layer: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_features or self.features
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)  # noqa: E731
        x = DepthwiseSeparableConv(mid, self.kernels_per_layer)(x)
        x = nn.relu(bn()(x))
        x = DepthwiseSeparableConv(self.features, self.kernels_per_layer)(x)
        return nn.relu(bn()(x))


class CBAM(nn.Module):
    reduction_ratio: int = 16
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        # Channel attention: shared MLP over avg- and max-pooled descriptors.
        mlp = nn.Sequential([
            nn.Dense(c // self.reduction_ratio, kernel_init=kaiming_uniform_torch()),
            nn.relu,
            nn.Dense(c, kernel_init=kaiming_uniform_torch()),
        ])
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        gate = jax.nn.sigmoid(mlp(avg) + mlp(mx))
        x = x * gate[:, None, None, :]
        # Spatial attention over [mean_c, max_c].
        s = jnp.concatenate(
            [jnp.mean(x, -1, keepdims=True), jnp.max(x, -1, keepdims=True)], -1
        )
        s = nn.Conv(
            1, (self.kernel_size, self.kernel_size), padding="SAME", use_bias=False,
            kernel_init=kaiming_uniform_torch(),
        )(s)
        s = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(s)
        return x * jax.nn.sigmoid(s)


class SmaAt_UNet(nn.Module):
    n_classes: int = 20
    kernels_per_layer: int = 2
    reduction_ratio: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        kpl = self.kernels_per_layer
        rr = self.reduction_ratio

        def down(x, c):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return DoubleConvDS(c, kernels_per_layer=kpl)(x, train)

        def up(x1, x2, c):
            B, H, W, _ = x1.shape
            x1 = resize_bilinear(x1, (2 * H, 2 * W), align_corners=True)
            x = jnp.concatenate([x2, x1], axis=-1)
            return DoubleConvDS(c, mid_features=x.shape[-1] // 2, kernels_per_layer=kpl)(x, train)

        x1 = DoubleConvDS(64, kernels_per_layer=kpl)(x, train)
        a1 = CBAM(rr)(x1, train)
        x2 = down(x1, 128)
        a2 = CBAM(rr)(x2, train)
        x3 = down(x2, 256)
        a3 = CBAM(rr)(x3, train)
        x4 = down(x3, 512)
        a4 = CBAM(rr)(x4, train)
        x5 = down(x4, 512)  # 1024 // factor(2)
        a5 = CBAM(rr)(x5, train)

        y = up(a5, a4, 256)
        y = up(y, a3, 128)
        y = up(y, a2, 64)
        y = up(y, a1, 64)
        return nn.Conv(
            self.n_classes, (1, 1), kernel_init=kaiming_uniform_torch(), name="outc"
        )(y)
