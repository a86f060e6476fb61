"""EfficientViM image classifier (reference component C6).

Re-derivation of `/root/reference/vim_block_init/efficient_vim_init.py:100-296`:
16x conv Stem -> 3 EfficientViM stages with SE PatchMerging downsamples ->
multi-stage hidden-state fusion head (per-stage LayerNorm + pooled hidden
state -> linear head, softmax-weighted sum + final spatial head). M1-M4
variants.

The reference's stage forward is broken as vendored (it unpacks
``x, h = blk(x)`` but the block returns one tensor — SURVEY.md C6); here the
stage uses the block's mixer hidden state properly: each block returns its
HSM-SSD hidden state and the stage forwards the last one, which is what the
fusion head needs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.layers import ChannelLayerNorm, ConvBNAct, FFN, PatchMerging, Stem
from kmunet_tpu.nn.ssd import HSMSSD


class _BlockWithState(nn.Module):
    """EfficientViMBlock variant that also returns the mixer hidden state."""

    dim: int
    mlp_ratio: float = 4.0
    ssd_expand: int = 1
    state_dim: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        alpha = self.param("alpha", nn.initializers.constant(1e-4), (4, C))
        a = jax.nn.sigmoid(alpha)[:, None, None, :]

        dw1 = ConvBNAct(C, (3, 3), groups=C, bn_weight_init=0.0, act=None, name="dwconv1")
        x = (1 - a[0]) * x + a[0] * dw1(x, train)

        x_prev = x
        tokens = ChannelLayerNorm(name="norm")(x.reshape(B, H * W, C))
        y, h = HSMSSD(d_model=C, ssd_expand=self.ssd_expand,
                      state_dim=self.state_dim, name="mixer")(tokens)
        x = (1 - a[1]) * x_prev + a[1] * y

        dw2 = ConvBNAct(C, (3, 3), groups=C, bn_weight_init=0.0, act=None, name="dwconv2")
        x = (1 - a[2]) * x + a[2] * dw2(x, train)
        x = (1 - a[3]) * x + a[3] * FFN(int(C * self.mlp_ratio), name="ffn")(x, train)
        return x, h


class EfficientViM(nn.Module):
    """Classifier with optional distillation head.

    ``distillation=True`` adds a second softmax-weighted 4-head ladder
    (``weights_dist``/``heads_dist``, efficient_vim_init.py:158-166,
    226-243): training returns ``(z, z_dist)`` for the DeiT-style teacher
    loss; inference returns their mean.
    """

    num_classes: int = 1000
    embed_dim: Sequence[int] = (128, 256, 512)
    depths: Sequence[int] = (2, 2, 2)
    mlp_ratio: float = 4.0
    ssd_expand: int = 1
    state_dim: Sequence[int] = (49, 25, 9)
    distillation: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dense = lambda name: nn.Dense(  # noqa: E731
            self.num_classes, kernel_init=nn.initializers.truncated_normal(0.02),
            name=name,
        )
        x = Stem(dim=self.embed_dim[0], name="patch_embed")(x, train)

        w = jax.nn.softmax(self.param("weights", nn.initializers.ones, (4,)))
        z = jnp.zeros((x.shape[0], self.num_classes))
        if self.distillation:
            w_dist = jax.nn.softmax(
                self.param("weights_dist", nn.initializers.ones, (4,)))
            z_dist = jnp.zeros((x.shape[0], self.num_classes))

        for i, depth in enumerate(self.depths):
            h = None
            for d in range(depth):
                x, h = _BlockWithState(
                    dim=self.embed_dim[i], mlp_ratio=self.mlp_ratio,
                    ssd_expand=self.ssd_expand, state_dim=self.state_dim[i],
                    name=f"stage{i}_blk{d}",
                )(x, train)
            hn = ChannelLayerNorm(name=f"norm{i}")(h)  # (B, N, C)
            hp = jnp.mean(hn, axis=1)
            z = z + w[i] * dense(f"head{i}")(hp)
            if self.distillation:
                z_dist = z_dist + w_dist[i] * dense(f"head{i}_dist")(hp)
            if i < len(self.depths) - 1:
                x = PatchMerging(out_dim=self.embed_dim[i + 1], name=f"merge{i}")(x, train)

        xn = ChannelLayerNorm(name="norm3")(x)
        xp = jnp.mean(xn, axis=(1, 2))
        z = z + w[3] * dense("head3")(xp)
        if self.distillation:
            z_dist = z_dist + w_dist[3] * dense("head3_dist")(xp)
            if train:
                return z, z_dist
            self.sow("intermediates", "logits_pair", (z, z_dist))
            return (z + z_dist) / 2  # efficient_vim_init.py:241-242
        return z


def EfficientViM_M1(**kw):
    return EfficientViM(embed_dim=(128, 192, 320), depths=(2, 2, 2),
                        state_dim=(49, 25, 9), **kw)


def EfficientViM_M2(**kw):
    return EfficientViM(embed_dim=(128, 256, 512), depths=(2, 2, 2),
                        state_dim=(49, 25, 9), **kw)


def EfficientViM_M3(**kw):
    return EfficientViM(embed_dim=(224, 320, 512), depths=(2, 2, 2),
                        state_dim=(49, 25, 9), **kw)


def EfficientViM_M4(**kw):
    return EfficientViM(embed_dim=(224, 320, 512), depths=(3, 4, 2),
                        state_dim=(64, 32, 16), **kw)
