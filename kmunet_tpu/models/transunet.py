"""TransUNet baseline: R50+ViT-B/16 hybrid encoder with a cup decoder.

Re-derivation of `/root/reference/models/TransUnet.py` (NHWC):
- Weight-standardized convs (StdConv2d, :28-36) in a pre-activation
  ResNetV2 stem (blocks 3/4/9, width 64, :123-175);
- patch embeddings + zero-init position embeddings, 12 pre-LN transformer
  layers (12 heads, MLP 3072, dropout 0.1) (:372-489,552-570);
- DecoderCup: conv_more to 512 then 4 up-blocks with skip concat
  (skips [512,256,64,0] for n_skip=3) and UpsamplingBilinear2d
  (align_corners=True) (:651-693);
- 3x3 segmentation head (:643-649).

Reference quirks kept: the root maxpool uses padding 0, giving 63^2 at 256^2
input; the stored skip is zero-padded back to 64^2 while the main path stays
63^2 (:160-170).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.ops.sample import resize_bilinear


class WSConv(nn.Module):
    """Weight-standardized conv (StdConv2d): kernel normalized over (H,W,I)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str | Sequence = "SAME"
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        C = x.shape[-1]
        w = self.param("kernel", kaiming_uniform_torch(), (kh, kw, C, self.features))
        m = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        v = jnp.mean(jnp.square(w - m), axis=(0, 1, 2), keepdims=True)
        w = (w - m) * jax.lax.rsqrt(v + 1e-5)
        y = jax.lax.conv_general_dilated(
            x, w, self.strides,
            self.padding if isinstance(self.padding, str) else list(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class PreActBottleneck(nn.Module):
    cout: int
    cmid: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        gn = lambda g, name: nn.GroupNorm(num_groups=g, epsilon=1e-6, name=name)  # noqa: E731
        if self.stride != 1 or cin != self.cout:
            residual = WSConv(self.cout, (1, 1), (self.stride, self.stride),
                              name="downsample")(x)
            residual = nn.GroupNorm(num_groups=self.cout, name="gn_proj")(residual)
        else:
            residual = x
        y = nn.relu(gn(32, "gn1")(WSConv(self.cmid, (1, 1), name="conv1")(x)))
        y = nn.relu(gn(32, "gn2")(
            WSConv(self.cmid, (3, 3), (self.stride, self.stride), name="conv2")(y)
        ))
        y = gn(32, "gn3")(WSConv(self.cout, (1, 1), name="conv3")(y))
        return nn.relu(residual + y)


class ResNetV2(nn.Module):
    block_units: Sequence[int] = (3, 4, 9)
    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        in_size = x.shape[1]
        x = WSConv(w, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="root_conv")(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="root_gn")(x))
        features = [x]
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        specs = [(w * 4, w, 1), (w * 8, w * 2, 2), (w * 16, w * 4, 2)]
        for bi, (cout, cmid, stride) in enumerate(specs):
            for ui in range(self.block_units[bi]):
                x = PreActBottleneck(
                    cout=cout, cmid=cmid, stride=stride if ui == 0 else 1,
                    name=f"block{bi + 1}_unit{ui + 1}",
                )(x)
            if bi < len(specs) - 1:
                right = in_size // 4 // (bi + 1)
                if x.shape[1] != right:
                    pad = right - x.shape[1]
                    feat = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
                else:
                    feat = x
                features.append(feat)
        return x, features[::-1]


class ViTBlock(nn.Module):
    hidden: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        h = nn.LayerNorm(epsilon=1e-6, name="attention_norm")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.hidden,
            kernel_init=nn.initializers.xavier_uniform(), name="attn",
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x)
        h = nn.Dense(self.mlp_dim, kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.normal(1e-6), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        h = nn.Dense(self.hidden, kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.normal(1e-6), name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        return x + h


class Conv2dReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    kernel_init=kaiming_uniform_torch())(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class TransUNet(nn.Module):
    """R50-ViT-B/16 (get_r50_b16_config_*, TransUnet.py:217-271)."""

    num_classes: int = 20
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    decoder_channels: Sequence[int] = (256, 128, 64, 16)
    n_skip: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, Cin = x.shape
        if Cin == 1:
            x = jnp.tile(x, (1, 1, 1, 3))

        feat, skips = ResNetV2(name="hybrid_model")(x)
        y = nn.Conv(self.hidden, (1, 1), kernel_init=kaiming_uniform_torch(),
                    name="patch_embeddings")(feat)
        hh, ww = y.shape[1:3]
        tokens = y.reshape(B, hh * ww, self.hidden)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, hh * ww, self.hidden))
        tokens = nn.Dropout(self.dropout, deterministic=not train)(tokens + pos)

        for i in range(self.layers):
            tokens = ViTBlock(self.hidden, self.heads, self.mlp_dim, self.dropout,
                              name=f"block{i}")(tokens, train)
        tokens = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(tokens)

        y = tokens.reshape(B, hh, ww, self.hidden)
        y = Conv2dReLU(512, name="conv_more")(y, train)

        skip_ch = list(self.decoder_channels)
        for i, out_c in enumerate(self.decoder_channels):
            Bh, Hh, Wh, _ = y.shape
            y = resize_bilinear(y, (2 * Hh, 2 * Wh), align_corners=True)
            if i < self.n_skip and i < len(skips):
                y = jnp.concatenate([y, skips[i]], axis=-1)
            y = Conv2dReLU(out_c, name=f"dec{i}_conv1")(y, train)
            y = Conv2dReLU(out_c, name=f"dec{i}_conv2")(y, train)

        return nn.Conv(self.num_classes, (3, 3), padding="SAME",
                       kernel_init=kaiming_uniform_torch(), name="segmentation_head")(y)
