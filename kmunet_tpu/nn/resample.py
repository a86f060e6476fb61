"""Learned resampling: DySample upsampler and deformable convolution.

Both reduce to the shared bilinear gather in ops/sample.py — the TPU-native
replacement for the reference's native CUDA ops (`F.grid_sample` in
DySample_md.py:60, `torchvision.ops.DeformConv2d` in DAGEM_md.py:46).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from kmunet_tpu.nn.init import kaiming_uniform_torch, normal_init
from kmunet_tpu.ops.sample import (
    bilinear_gather,
    bilinear_gather_grouped,
    dysample_window_upsample,
    grid_sample_bilinear,
)

# DySample dispatch: True = dense (2r+1)²-window formulation (shifted
# multiply-adds, no gather — exact while |subpixel init + learned offset|
# < r; measured trained maxima 0.52/1.11/0.61 px per decoder instance, see
# ops/sample.py::dysample_window_upsample). False = the exact
# arbitrary-offset gather path (grouped Pallas kernel / XLA fallback) —
# what golden-parity tests pin against torch grid_sample.
DYSAMPLE_WINDOW: bool = True
DYSAMPLE_WINDOW_RADIUS: int = 2


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch channel semantics: (B,H,W,C*r^2)->(B,rH,rW,C)."""
    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(B, H * r, W * r, C)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, r, r
    return x.reshape(B, H, W, C * r * r)


class DySample(nn.Module):
    """Content-aware upsampling via learned sampling offsets.

    Re-derivation of `/root/reference/DySample_md.py:20-81` ('lp' and 'pl'
    styles, optional dyscope gate). A 1x1 conv (weights ~N(0, 1e-3), zero
    bias) predicts per-group, per-subpixel (x, y) offsets; offsets*0.25 plus
    the static sub-pixel grid give sampling coords, gathered bilinearly with
    border clamping (align_corners=False semantics).
    """

    scale: int = 2
    style: str = "lp"
    groups: int = 4
    dyscope: bool = False
    # None -> module-level DYSAMPLE_WINDOW default; True/False to force the
    # dense-window / exact gather path per instance.
    window: bool | None = None

    @nn.compact
    def __call__(self, x):
        assert self.style in ("lp", "pl")
        B, H, W, C = x.shape
        s, g = self.scale, self.groups
        assert C >= g and C % g == 0

        if self.style == "pl":
            assert C >= s * s and C % (s * s) == 0
            x_ = pixel_shuffle(x, s)
            raw = nn.Conv(
                2 * g, (1, 1), kernel_init=normal_init(std=1e-3),
                bias_init=nn.initializers.zeros, name="offset",
            )(x_)
            if self.dyscope:
                scope = nn.Conv(
                    2 * g, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.zeros, name="scope",
                )(x_)
                raw = raw * jax.nn.sigmoid(scope) * 0.5
            else:
                raw = raw * 0.25
            # (B, sH, sW, 2g) -unshuffle-> (B, H, W, g*2*s*s); our conv channel
            # layout is (g, [x,y]) so unshuffled layout is (g, 2, di, dj).
            off = pixel_unshuffle(raw, s).reshape(B, H, W, g, 2, s, s)
            off = off.transpose(0, 1, 2, 5, 6, 3, 4)  # (B,H,W,s,s,g,2)
            offx = off[..., 0]
            offy = off[..., 1]
        else:
            raw = nn.Conv(
                2 * g * s * s, (1, 1), kernel_init=normal_init(std=1e-3),
                bias_init=nn.initializers.zeros, name="offset",
            )(x)
            if self.dyscope:
                scope = nn.Conv(
                    2 * g * s * s, (1, 1), use_bias=False,
                    kernel_init=nn.initializers.zeros, name="scope",
                )(x)
                raw = raw * jax.nn.sigmoid(scope) * 0.5
            else:
                raw = raw * 0.25
            # channel layout (ours): (g, s, s, 2) with last = (x_off, y_off)
            off = raw.reshape(B, H, W, g, s, s, 2)
            off = off.transpose(0, 1, 2, 4, 5, 3, 6)  # (B,H,W,s,s,g,2)
            offx = off[..., 0]
            offy = off[..., 1]

        # Static sub-pixel init positions (DySample_md.py:45-47):
        # subpixel (di, dj) samples at (j + 0.5 + (dj-(s-1)/2)/s,
        #                               i + 0.5 + (di-(s-1)/2)/s).
        sub = (jnp.arange(s, dtype=x.dtype) - (s - 1) / 2.0) / s
        init_x = sub[None, :]  # varies with dj
        init_y = sub[:, None]  # varies with di
        jj = jnp.arange(W, dtype=x.dtype)[None, :, None, None, None]
        ii = jnp.arange(H, dtype=x.dtype)[:, None, None, None, None]
        px = jj + 0.5 + init_x[None, None, :, :, None] + offx  # (B,H,W,s,s,g)
        py = ii + 0.5 + init_y[None, None, :, :, None] + offy

        # The reference normalizes to grid space (2*(coord)/size - 1) and
        # grid_sample(align_corners=False) maps straight back to pixel space
        # px - 0.5 — we skip the exact-inverse round trip.
        window = DYSAMPLE_WINDOW if self.window is None else self.window
        if window:
            # Dense 3×3-window formulation: sample coord − cell index =
            # sub-pixel init + learned offset, handed over as fractional
            # offsets (see dysample_window_upsample docstring for the
            # exactness domain + deviation semantics).
            ex = init_x[None, None, :, :, None] + offx  # (B,H,W,s,s,g)
            ey = init_y[None, None, :, :, None] + offy
            return dysample_window_upsample(x, ex, ey,
                                            radius=DYSAMPLE_WINDOW_RADIUS)
        # Exact arbitrary-offset path: all groups in ONE grouped gather (no
        # group->batch folding, no channel regroup transposes; see
        # ops/sample.py::bilinear_gather_grouped).
        # (B,H,W,s,s,g) -> (B, g, sH, sW): out pixel (s*i+di, s*j+dj).
        xs = (px - 0.5).transpose(0, 5, 1, 3, 2, 4).reshape(B, g, s * H, s * W)
        ys = (py - 0.5).transpose(0, 5, 1, 3, 2, 4).reshape(B, g, s * H, s * W)
        return bilinear_gather_grouped(x, xs, ys, padding_mode="border")


class DeformConv2d(nn.Module):
    """torchvision-semantics deformable 3x3 conv (NHWC, zero padding).

    For each kernel tap k the input is bilinearly sampled at
    ``p0 + p_k + offset_k`` (out-of-range reads 0), then all taps contract
    with the kernel as one (1,1,K*K*C,out) matmul on the MXU.
    Offset layout matches torchvision: channels (k, [dy, dx]) row-major taps.
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, offset):
        B, H, W, C = x.shape
        k = self.kernel_size
        p = self.padding
        assert offset.shape[-1] == 2 * k * k

        kernel = self.param(
            "kernel", kaiming_uniform_torch(), (k, k, C, self.features)
        )
        taps = []
        ii = jnp.arange(H, dtype=x.dtype)[None, :, None]
        jj = jnp.arange(W, dtype=x.dtype)[None, None, :]
        for kh in range(k):
            for kw in range(k):
                t = kh * k + kw
                dy = offset[..., 2 * t]
                dx = offset[..., 2 * t + 1]
                sy = ii + (kh - p) + dy
                sx = jj + (kw - p) + dx
                taps.append(bilinear_gather(x, sx, sy, padding_mode="zeros"))
        gathered = jnp.concatenate(taps, axis=-1)  # (B,H,W,k*k*C)
        w = kernel.transpose(0, 1, 2, 3).reshape(k * k * C, self.features)
        y = jnp.einsum("bhwf,fo->bhwo", gathered, w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
