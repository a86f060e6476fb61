"""KM_UNetV3 — the flagship hybrid KAN / HSM-SSD / wavelet nowcasting U-Net.

TPU-native re-design of `/root/reference/KM_UNetV3_SH.py:371-517` (Shanghai
variant) and `KM_UNetV3_LAPS.py` (LAPS variant). Inputs are NHWC stacks of
input radar frames (frames as channels, KM_UNetV3_SH.py:375); outputs are
sigmoid maps with ``num_classes`` forecast frames as channels.

Spatial ladder at 256^2: 256 -> 128 -> 64 -> 32 (IWP x3), bridge (DAGEM, SH
only), then 32 -> 64 -> 128 -> 256 (DySample x3 for SH; align_corners
bilinear for LAPS).

Faithfully-kept reference quirks (SURVEY.md §7 "hard parts" #2):
- ``EnhancedViMBlock``'s ``state_dim`` argument is accepted but the inner
  EfficientViM blocks hardcode state_dim=64 (KM_UNetV3_SH.py:166).
- dec2/dec3 DySample is constructed with embed_dims[2] channels but the
  tensor entering it has 2*embed_dims[1] == embed_dims[2] channels — same
  number, so it works; we size from the actual input.
- Skip attention uses [e1, e2, e2] (e2 twice — KM_UNetV3_SH.py:495).
- Output head: GroupNorm(1, num_classes) then sigmoid (:449-450).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.attention import (
    DirectionAttention,
    LocalContrastAttention,
    MultiScaleFusion,
    TripleNorm,
)
from kmunet_tpu.nn.dagem import DAGEM
from kmunet_tpu.nn.init import kaiming_normal_fanout, kaiming_uniform_torch
from kmunet_tpu.nn.kan import KANConv2d
from kmunet_tpu.nn.layers import DropPath
from kmunet_tpu.nn.resample import DySample
from kmunet_tpu.nn.ssd import EfficientViMBlock
from kmunet_tpu.nn.wavelet import IntelligentWaveletPooling
from kmunet_tpu.ops.sample import resize_bilinear


class StableHybridKANConv(nn.Module):
    """GroupNorm pre-norm -> KANConv2d -> residual -> ReLU.

    Reference: KM_UNetV3_SH.py:21-94 (the multi-branch KAN attention there is
    commented out / dead; only the plain KANConv path executes).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        # epsilon=1e-5 matches torch GroupNorm (flax defaults to 1e-6).
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="pre_norm")(x)
        if in_c != self.features:
            identity = nn.Conv(
                self.features, (1, 1), kernel_init=kaiming_normal_fanout(),
                name="residual",
            )(x)
        else:
            identity = x
        fused = KANConv2d(
            features=self.features, kernel_size=3, padding=1, name="kanconv"
        )(x)
        return nn.relu(identity + fused)


class DirectionViM(nn.Module):
    """Direction projection -> EfficientViM block -> direction attention.

    Reference: KM_UNetV3_SH.py:154-212. ``state_dim`` is accepted for API
    parity but the EfficientViM block hardcodes 64, as the reference does.
    """

    mode: str = "height"
    state_dim: int = 64  # kept: reference ignores the passed value (:166)

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        ks = {"height": (3, 1), "width": (1, 3), "channel": (1, 1)}[self.mode]
        x = nn.Conv(
            C, ks, padding="SAME", kernel_init=kaiming_uniform_torch(), name="proj"
        )(x)
        x = EfficientViMBlock(
            dim=C, mlp_ratio=4, ssd_expand=1, state_dim=64, name="vit_mamba"
        )(x, train)
        return DirectionAttention(self.mode, name="attn")(x)


class EnhancedViMBlock(nn.Module):
    """Three directional ViM branches + softmax gate + FFN residual.

    Reference: KM_UNetV3_SH.py:97-151.

    ``impl`` selects how the three DirectionViM branches are evaluated
    (identical math and parameter distributions in all cases):

    - ``'separate'`` (default): three independent DirectionViM submodules.
      Measured FASTER than 'fused' on the real v5e at the full-model level
      (183.3 vs 206.3 ms @ B128 128^2 bf16, 2026-08-19): XLA lowers the
      grouped/feature_group_count convs of the stacked chain worse than
      three plain convs it can fuse independently.
    - ``'fused'``: ONE channel-stacked (B, H, W, 3C) chain
      (nn/fused_vim.py) — per-branch convs become grouped/block-diagonal
      convs and per-branch denses become stacked einsums. Kept because the
      lane-packing argument holds on paper and other toolchain versions may
      lower it better; `fuse_direction_params` / `unfuse_direction_params`
      (nn/fused_vim.py) migrate checkpoints between the two layouts in both
      directions, so checkpoints saved while 'fused' was briefly the default
      restore fine after unfuse.
    - ``'vmap'``: nn.vmap over a stacked (3, B, ...) axis. Measured on v5e
      it is *slower* than 'separate' (13.4 vs 11.0 ms at B8 128^2 C16: XLA
      lowers per-item-kernel batched convs poorly); kept for reference.
    """

    expansion: int = 4
    state_dim: int = 64
    drop_path: float = 0.1
    impl: str = "separate"
    packing: str = "grouped"  # 'fused' impl: 'grouped' | 'blockdiag' convs

    @nn.compact
    def __call__(self, x, train: bool = False):
        from kmunet_tpu.nn.fused_vim import FusedDirectionViM

        C = x.shape[-1]
        identity = x
        if self.impl == "fused":
            feats = FusedDirectionViM(
                state_dim=self.state_dim, packing=self.packing, name="directions"
            )(x, train)  # (B, H, W, 3, C)
            h_feat, w_feat, c_feat = feats[..., 0, :], feats[..., 1, :], feats[..., 2, :]
        elif self.impl == "vmap":
            h_in = nn.Conv(C, (3, 1), padding="SAME",
                           kernel_init=kaiming_uniform_torch(), name="height_proj")(x)
            w_in = nn.Conv(C, (1, 3), padding="SAME",
                           kernel_init=kaiming_uniform_torch(), name="width_proj")(x)
            c_in = nn.Conv(C, (1, 1),
                           kernel_init=kaiming_uniform_torch(), name="channel_proj")(x)
            stacked = jnp.stack([h_in, w_in, c_in])  # (3, B, H, W, C)

            VBlock = nn.vmap(
                EfficientViMBlock,
                in_axes=(0, None), out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )
            y = VBlock(dim=C, mlp_ratio=4, ssd_expand=1, state_dim=64,
                       name="vit_mamba3")(stacked, train)

            VAttn = nn.vmap(
                DirectionAttention,
                in_axes=0, out_axes=0,
                variable_axes={"params": 0},
                split_rngs={"params": True},
            )
            feats = VAttn(mode="height", name="attn3")(y)
            h_feat, w_feat, c_feat = feats[0], feats[1], feats[2]
        else:
            h_feat = DirectionViM("height", self.state_dim, name="height_block")(x, train)
            w_feat = DirectionViM("width", self.state_dim, name="width_block")(x, train)
            c_feat = DirectionViM("channel", self.state_dim, name="channel_block")(x, train)

        gate_in = jnp.mean(jnp.concatenate([h_feat, w_feat, c_feat], -1), (1, 2))
        g = nn.Dense(C // 4, kernel_init=kaiming_uniform_torch())(gate_in)
        g = nn.gelu(g, approximate=False)
        g = nn.Dense(3, kernel_init=kaiming_uniform_torch())(g)
        g = jax.nn.softmax(g, axis=-1)[:, None, None, :]

        fused = g[..., 0:1] * h_feat + g[..., 1:2] * w_feat + g[..., 2:3] * c_feat
        dp = DropPath(self.drop_path)
        x = identity + dp(fused, deterministic=not train)

        y = TripleNorm(name="norm")(x)
        y = nn.Conv(C * self.expansion, (1, 1), kernel_init=kaiming_uniform_torch())(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(C, (1, 1), kernel_init=kaiming_uniform_torch())(y)
        return x + dp(y, deterministic=not train)


class KM_UNetV3(nn.Module):
    """The flagship model. ``variant='sh'`` (DAGEM bridge + DySample ups) or
    ``'laps'`` (no bridge, align-corners bilinear ups) — KM_UNetV3_LAPS.py."""

    num_classes: int = 20
    embed_dims: Sequence[int] = (16, 32, 64)
    variant: str = "sh"
    # Round-5 quality-ablation knobs (reference defaults; the scoreboard
    # root-cause sweep flips them one at a time — BASELINE.md round 5):
    drop_path: float = 0.1     # EnhancedViMBlock stochastic depth (ref :127)
    head_norm: bool = True     # GroupNorm(1) before the sigmoid head (:449)

    def _up2(self, x, name):
        if self.variant == "sh":
            return DySample(scale=2, style="lp", groups=4, name=name)(x)
        B, H, W, _ = x.shape
        return resize_bilinear(x, (2 * H, 2 * W), align_corners=True)

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.variant in ("sh", "laps")
        d0, d1_, d2_ = self.embed_dims

        x = nn.Conv(
            16, (3, 3), padding="SAME", kernel_init=kaiming_uniform_torch(),
            name="conv_f",
        )(x)

        # Encoder: StableHybridKANConv -> EnhancedViMBlock -> IWP, then LCA.
        def enc(x, c, i):
            x = StableHybridKANConv(c, name=f"enc{i}_kan")(x)
            x = EnhancedViMBlock(state_dim=16, drop_path=self.drop_path,
                                 name=f"enc{i}_vim")(x, train)
            x = IntelligentWaveletPooling(name=f"enc{i}_iwp")(x)
            return LocalContrastAttention(name=f"lca{i}")(x)

        e1 = enc(x, d0, 1)
        e2 = enc(e1, d1_, 2)
        e3 = enc(e2, d2_, 3)

        bridge = DAGEM(name="bridge")(e3, train) if self.variant == "sh" else e3

        # Decoder stage 1.
        d = self._up2(bridge, "dec1_up")
        d = StableHybridKANConv(d1_, name="dec1_kan")(d)

        def skip_attn(d, name):
            size = d.shape[1:3]
            feats = [
                resize_bilinear(e1, size, align_corners=True),
                resize_bilinear(e2, size, align_corners=True),
                resize_bilinear(e2, size, align_corners=True),  # e2 twice (:495)
            ]
            return MultiScaleFusion(channels=(d0, d1_, d1_), name=name)(feats)

        d = jnp.concatenate([d, skip_attn(d, "attention1")], axis=-1)

        # Decoder stage 2.
        d = self._up2(d, "dec2_up")
        d = nn.Conv(
            d1_, (3, 3), padding="SAME", kernel_init=kaiming_uniform_torch(),
            name="dec2_conv",
        )(d)
        d = EnhancedViMBlock(state_dim=16, drop_path=self.drop_path,
                             name="dec2_vim")(d, train)

        d = jnp.concatenate([d, skip_attn(d, "attention2")], axis=-1)

        # Decoder stage 3 + output head.
        d = self._up2(d, "dec3_up")
        d = nn.Conv(
            d0, (3, 3), padding="SAME", kernel_init=kaiming_uniform_torch(),
            name="dec3_conv",
        )(d)
        d = EnhancedViMBlock(drop_path=self.drop_path, name="dec3_vim")(d, train)
        d = nn.Conv(
            self.num_classes, (3, 3), padding="SAME",
            kernel_init=kaiming_uniform_torch(), name="head",
        )(d)
        if self.head_norm:
            d = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="output_norm")(d)
        return jax.nn.sigmoid(d)


def KM_UNetV3_SH(num_classes: int = 20, embed_dims=(16, 32, 64)) -> KM_UNetV3:
    """Shanghai variant (train_shanghai.py:333 uses num_classes=20)."""
    return KM_UNetV3(num_classes=num_classes, embed_dims=tuple(embed_dims), variant="sh")


def KM_UNetV3_LAPS(num_classes: int = 3, embed_dims=(16, 32, 64)) -> KM_UNetV3:
    """LAPS/NC variant (train_LAPS.py:381 uses num_classes=3)."""
    return KM_UNetV3(num_classes=num_classes, embed_dims=tuple(embed_dims), variant="laps")
