"""Mamba-UNet baseline: UNet with selective-scan SSM deep stages.

Re-derivation of `/root/reference/models/Mamba_UNet.py:195-344` (NHWC):
conv encoders 1-3 + DMFM (dual-view Mamba) encoders 4-6, a multi-scale
spatio-temporal attention bridge over 5 skip scales, ConvTranspose
upsampling decoders, 4 refinement DMFMs, last-input-frame residual and a
learnable-beta Swish output.

DMFM runs the *same* Mamba block on two token views — identity order and a
channel-group-shuffled copy (group=8, Mamba_UNet.py:41-47) — and the same
LayerNorm on both (the reference shares ``self.norm`` across its three uses).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch
from kmunet_tpu.nn.mamba import MambaBlock


def _conv(f, k, name=None, padding="SAME", dilation=1):
    return nn.Conv(
        f, (k, k) if isinstance(k, int) else k, padding=padding,
        kernel_dilation=(dilation, dilation), kernel_init=kaiming_uniform_torch(),
        name=name,
    )


class DMFMLayer(nn.Module):
    """Dual-view Mamba feature mixer (Mamba_UNet.py:8-58).

    ``seq_mesh`` (optional jax.sharding.Mesh) activates the sequence-parallel
    selective scan inside the MambaBlock (L = H*W tokens sharded over the
    mesh's spatial axis; row-major flatten keeps H-sharding == L-sharding).
    """

    output_dim: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    group: int = 8
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        L = H * W
        norm = nn.LayerNorm(name="norm")
        mamba = MambaBlock(
            d_model=C, d_state=self.d_state, d_conv=self.d_conv,
            expand=self.expand, seq_mesh=self.seq_mesh, name="mamba",
        )

        x1 = norm(x.reshape(B, L, C))

        # channel-group shuffle: view (B, group, C/g, H, W) -> transpose(1,2)
        cpg = C // self.group
        x2 = x.reshape(B, H, W, self.group, cpg)
        x2 = x2.transpose(0, 1, 2, 4, 3).reshape(B, L, C)
        x2 = norm(x2)

        s1 = self.param("skip_scale1", nn.initializers.ones, (1,))
        s2 = self.param("skip_scale2", nn.initializers.ones, (1,))
        m1 = mamba(x1) + x1 * s1
        m2 = mamba(x2) + x2 * s2
        y = norm(m1 + m2)
        y = nn.Dense(self.output_dim, kernel_init=kaiming_uniform_torch(),
                     name="proj")(y)
        return y.reshape(B, H, W, self.output_dim)


class SpatialAttBridge(nn.Module):
    """Shared dilated-conv spatial attention (Mamba_UNet.py:105-120)."""

    @nn.compact
    def __call__(self, ts):
        conv = _conv(1, 7, name="shared_conv2d", padding=9, dilation=3)
        outs = []
        for t in ts:
            s = jnp.concatenate(
                [jnp.mean(t, -1, keepdims=True), jnp.max(t, -1, keepdims=True)], -1
            )
            outs.append(jax.nn.sigmoid(conv(s)))
        return outs


class ChannelAttBridge(nn.Module):
    """1D-conv + per-scale linear channel attention (Mamba_UNet.py:61-102)."""

    c_list: Sequence[int]

    @nn.compact
    def __call__(self, ts):
        gap = jnp.concatenate([jnp.mean(t, axis=(1, 2)) for t in ts], axis=-1)
        # conv1d(1,1,k3) over the channel axis
        k = self.param("get_all_att_kernel", kaiming_uniform_torch(), (3, 1, 1))
        att = jax.lax.conv_general_dilated(
            gap[..., None], k, (1,), [(1, 1)],
            dimension_numbers=("NLC", "LIO", "NLC"),
        )[..., 0]
        outs = []
        for i, t in enumerate(ts):
            a = nn.Dense(self.c_list[i], kernel_init=kaiming_uniform_torch(),
                         name=f"att{i + 1}")(att)
            outs.append(jax.nn.sigmoid(a)[:, None, None, :])
        return outs


class MultiScaleSTAMBridge(nn.Module):
    """Triple-kernel spatial attention + channel attention over 5 skips
    (Mamba_UNet.py:123-192)."""

    c_list: Sequence[int]

    @nn.compact
    def __call__(self, ts):
        n = len(ts)
        a1 = self.param("alpha1", nn.initializers.ones, ())
        a2 = self.param("alpha2", nn.initializers.ones, ())
        a3 = self.param("alpha3", nn.initializers.ones, ())

        b33 = [_conv(self.c_list[i], (3, 3), name=f"conv1_1_{i+1}")(ts[i]) for i in range(n)]
        b13 = [_conv(self.c_list[i], (1, 3), name=f"conv1_3_{i+1}")(ts[i]) for i in range(n)]
        b31 = [_conv(self.c_list[i], (3, 1), name=f"conv3_1_{i+1}")(ts[i]) for i in range(n)]

        s1 = SpatialAttBridge(name="satt")(b33)
        s2 = SpatialAttBridge(name="satt2")(b13)
        s3 = SpatialAttBridge(name="satt3")(b31)

        r_ = [a1 * s1[i] * b33[i] + a2 * s2[i] * b13[i] + a3 * s3[i] * b31[i] for i in range(n)]
        t_new = [r_[i] + ts[i] for i in range(n)]

        catt = ChannelAttBridge(self.c_list, name="catt")(t_new)
        t_new = [catt[i] * t_new[i] for i in range(n)]
        return [t_new[i] + r_[i] for i in range(n)]


class Mamba_UNet(nn.Module):
    predicted_frames: int = 3
    c_list: Sequence[int] = (8, 16, 24, 32, 48, 64)
    bridge: bool = True
    # Optional jax.sharding.Mesh: runs every DMFM selective scan
    # sequence-parallel (ppermute carries over the mesh's spatial axis).
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, input_frames) -> (B, H, W, predicted_frames)."""
        c = list(self.c_list)

        def enc_conv(y, f, i):
            y = _conv(f, 3, name=f"encoder{i}")(y)
            y = nn.GroupNorm(num_groups=4, name=f"ebn{i}")(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            return nn.gelu(y, approximate=False)

        def enc_dmfm(y, f, i):
            y = DMFMLayer(output_dim=f, seq_mesh=self.seq_mesh, name=f"encoder{i}")(y)
            y = nn.GroupNorm(num_groups=4, name=f"ebn{i}")(y)
            if i < 6:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            return nn.gelu(y, approximate=False)

        out = enc_conv(x, c[0], 1); t1 = out
        out = enc_conv(out, c[1], 2); t2 = out
        out = enc_conv(out, c[2], 3); t3 = out
        out = enc_dmfm(out, c[3], 4); t4 = out
        out = enc_dmfm(out, c[4], 5); t5 = out

        if self.bridge:
            t1, t2, t3, t4, t5 = MultiScaleSTAMBridge(c[:5], name="scab")(
                [t1, t2, t3, t4, t5]
            )

        out = enc_dmfm(out, c[5], 6)

        up = lambda y, f, name: nn.ConvTranspose(  # noqa: E731
            f, (2, 2), strides=(2, 2), transpose_kernel=True,
            kernel_init=kaiming_uniform_torch(), name=name,
        )(y)

        def dec_dmfm(y, f, i):
            y = DMFMLayer(output_dim=f, seq_mesh=self.seq_mesh, name=f"decoder{i}")(y)
            return nn.GroupNorm(num_groups=4, name=f"dbn{i}")(y)

        out5 = nn.gelu(dec_dmfm(out, c[4], 1), approximate=False) + t5
        out4 = nn.gelu(up(dec_dmfm(out5, c[3], 2), c[3], "contr1"), approximate=False) + t4
        out3 = nn.gelu(up(dec_dmfm(out4, c[2], 3), c[2], "contr2"), approximate=False) + t3

        y = _conv(c[1], 3, name="decoder4")(out3)
        y = nn.GroupNorm(num_groups=4, name="dbn4")(y)
        out2 = nn.gelu(up(y, c[1], "contr3"), approximate=False) + t2

        y = _conv(c[0], 3, name="decoder5")(out2)
        y = nn.GroupNorm(num_groups=4, name="dbn5")(y)
        out1 = nn.gelu(up(y, c[0], "contr4"), approximate=False) + t1

        y = nn.Conv(c[0], (1, 1), kernel_init=kaiming_uniform_torch(), name="final")(out1)
        y = nn.GroupNorm(num_groups=4, name="dbn6")(y)
        out0 = nn.gelu(up(y, c[0], "contr5"), approximate=False)

        y = DMFMLayer(output_dim=c[1], seq_mesh=self.seq_mesh, name="refine1")(out0)
        y = DMFMLayer(output_dim=c[2], seq_mesh=self.seq_mesh, name="refine2")(y)
        y = DMFMLayer(output_dim=c[1], seq_mesh=self.seq_mesh, name="refine3")(y)
        y = DMFMLayer(output_dim=c[0], seq_mesh=self.seq_mesh, name="refine4")(y)
        y = nn.GroupNorm(num_groups=4, name="dbn7")(y)
        out0 = nn.gelu(y, approximate=False)

        out0 = _conv(self.predicted_frames, 3, name="S1")(out0)
        out0 = out0 + x[..., -1:]  # last input frame residual
        out0 = _conv(self.predicted_frames, 3, name="S")(out0)
        beta = self.param("beta", nn.initializers.ones, ())
        return out0 * jax.nn.sigmoid(beta * out0)
