"""Swin-UNet baseline: shifted-window transformer U-Net.

Re-derivation of `/root/reference/models/Swim_Unet.py` with the
swin_tiny_patch4_window7_224_lite.yaml config the reference loads at import
(window 8, embed 96, depths [2,2,2,2], heads [3,6,12,24], patch 4,
in_chans 5, img 256 — yaml:1-12 + Swim_Unet.py:51,87): windowed W-MSA/SW-MSA
with relative position bias, PatchMerging downsamples, PatchExpand
upsamples with linear skip fusion (concat_back_dim), final 4x patch expand
and a bias-free 1x1 head.

Notes: the reference's decoder uses the *encoder* depths reversed (the
DECODER_DEPTHS config value is read but the constructor indexes ``depths``,
Swim_Unet.py:933); the dead MoEFFNGating block (:255-270) is not ported.
Window masks and relative-position indices are computed statically at trace
time, so everything under jit is fixed-shape einsums on the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.nn.layers import DropPath


def window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def window_reverse(windows, w, H, W):
    B = windows.shape[0] // ((H // w) * (W // w))
    x = windows.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # (w*w, w*w)


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows; (nW, w*w, w*w) additive."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = img.reshape(1, H // w, w, W // w, w, 1).transpose(0, 1, 3, 2, 4, 5)
    mw = mw.reshape(-1, w * w)
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        Bw, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = hd**-0.5
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias,
                       kernel_init=nn.initializers.truncated_normal(0.02),
                       name="qkv")(x)
        qkv = qkv.reshape(Bw, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.reshape(Bw, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(C, kernel_init=nn.initializers.truncated_normal(0.02),
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        w = min(self.window, H, W)
        shift = self.shift if w < min(H, W) else 0

        shortcut = x
        y = nn.LayerNorm(name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(H, W, w, shift))
        else:
            mask = None
        wins = window_partition(y, w)
        wins = WindowAttention(C, w, self.num_heads, name="attn")(wins, mask)
        y = window_reverse(wins, w, H, W)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))

        dp = DropPath(self.drop_path)
        x = shortcut + dp(y, deterministic=not train)

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio),
                     kernel_init=nn.initializers.truncated_normal(0.02), name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, kernel_init=nn.initializers.truncated_normal(0.02),
                     name="fc2")(y)
        return x + dp(y, deterministic=not train)


class PatchMerging(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, H // 2, W // 2, 4 * C)
        # torch order: cat([x0, x1, x2, x3]) with x0=x[0::2,0::2], x1=x[1::2,0::2]...
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(2 * C, use_bias=False,
                        kernel_init=nn.initializers.truncated_normal(0.02),
                        name="reduction")(x)


class PatchExpand(nn.Module):
    """Linear C->2C then 2x2 pixel shuffle to C/2 (Swim_Unet.py:599-622)."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.Dense(2 * C, use_bias=False,
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     name="expand")(x)
        x = x.reshape(B, H, W, 2, 2, C // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C // 2)
        return nn.LayerNorm(name="norm")(x)


class FinalPatchExpandX4(nn.Module):
    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = nn.Dense(16 * C, use_bias=False,
                     kernel_init=nn.initializers.truncated_normal(0.02),
                     name="expand")(x)
        x = x.reshape(B, H, W, 4, 4, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 4 * H, 4 * W, C)
        return nn.LayerNorm(name="norm")(x)


class SwinUNet(nn.Module):
    num_classes: int = 20
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, Cin = x.shape
        if Cin == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        p = self.patch_size
        n_layers = len(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()

        # patch embed: conv k=p s=p + LN
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    kernel_init=kaiming_uniform_torch(), name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm")(x)

        skips = []
        for i in range(n_layers):
            dim = self.embed_dim * 2**i
            skips.append(x)
            for d in range(self.depths[i]):
                x = SwinBlock(
                    dim, self.num_heads[i], self.window,
                    shift=0 if d % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dpr[sum(self.depths[:i]) + d],
                    name=f"enc{i}_blk{d}",
                )(x, train)
            if i < n_layers - 1:
                x = PatchMerging(name=f"merge{i}")(x)

        x = nn.LayerNorm(name="norm")(x)

        # decoder
        for i in range(n_layers):
            li = n_layers - 1 - i  # encoder level being restored
            if i == 0:
                x = PatchExpand(name="up0")(x)
            else:
                # cat with x_downsample[3 - inx] (Swim_Unet.py:996) == skips[li]
                x = jnp.concatenate([x, skips[li]], axis=-1)
                dim = self.embed_dim * 2**li
                x = nn.Dense(dim, use_bias=True,
                             kernel_init=nn.initializers.truncated_normal(0.02),
                             name=f"concat_back_dim{i}")(x)
                for d in range(self.depths[li]):
                    x = SwinBlock(
                        dim, self.num_heads[li], self.window,
                        shift=0 if d % 2 == 0 else self.window // 2,
                        mlp_ratio=self.mlp_ratio,
                        drop_path=dpr[sum(self.depths[:li]) + d],
                        name=f"dec{i}_blk{d}",
                    )(x, train)
                if i < n_layers - 1:
                    x = PatchExpand(name=f"up{i}")(x)

        x = nn.LayerNorm(name="norm_up")(x)
        x = FinalPatchExpandX4(name="final_expand")(x)
        return nn.Conv(self.num_classes, (1, 1), use_bias=False,
                       kernel_init=kaiming_uniform_torch(), name="output")(x)
