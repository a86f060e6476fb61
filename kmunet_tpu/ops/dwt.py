"""2D Haar discrete wavelet transform as strided depthwise convs.

The reference builds banded synthesis-filter matrices in numpy on every
forward and runs four dense matmuls with a hand-written autograd backward
(`/root/reference/WPL/iwp.py:9-113`). For the Haar wavelet on square,
even-sized inputs (the only case KM-UNet exercises: 256 -> 128 -> 64 -> 32),
that computation is exactly a 2x2 stride-2 separable filter bank:

    LL[i,j] = (x[2i,2j] + x[2i,2j+1] + x[2i+1,2j] + x[2i+1,2j+1]) / 2
    LH = low along H, high along W;  HL = high/low;  HH = high/high
    low  = (a + b) / sqrt(2),  high = (a - b) / sqrt(2)

(filters are pywt's haar rec_lo = [1/sqrt2, 1/sqrt2], rec_hi = [1/sqrt2,
-1/sqrt2]; the reference's L = Low0 @ x applies along H first, then the
*_1 matrices along W, and concatenates [LH, HL, HH] — iwp.py:20-26,126.)

On TPU we express it as a single stride-2 conv with 4 fixed 2x2 kernels per
channel — XLA fuses it and autodiff gives the exact transpose backward the
reference hand-writes.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476


def _haar_filters(dtype) -> jnp.ndarray:
    """(2, 2, 1, 4) filter bank producing (LL, LH, HL, HH) per channel."""
    lo = jnp.array([_INV_SQRT2, _INV_SQRT2], dtype=dtype)
    hi = jnp.array([_INV_SQRT2, -_INV_SQRT2], dtype=dtype)
    # outer(row_filter_H, col_filter_W)
    ll = lo[:, None] * lo[None, :]
    lh = lo[:, None] * hi[None, :]
    hl = hi[:, None] * lo[None, :]
    hh = hi[:, None] * hi[None, :]
    return jnp.stack([ll, lh, hl, hh], axis=-1)[:, :, None, :]  # (2,2,1,4)


def haar_dwt2d(
    x: jnp.ndarray, quirk_edge_zero: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-level 2D Haar DWT of an NHWC tensor with even H and W.

    Returns (LL, LH, HL, HH), each ``(B, H//2, W//2, C)``.

    ``quirk_edge_zero`` replicates a load-bearing off-by-one in the
    reference's banded-matrix build (`WPL/iwp.py:79`): the high-pass matrix
    row loop runs ``range(L1 - L - 1)``, leaving its LAST row all-zero, so
    the reference's high-pass output along each axis is zero at the final
    band — LH's last column, HL's last row, and both for HH (verified
    against the reference DWT_2D itself,
    tests/test_reference_parity_flagship.py). Pass False for the clean
    orthonormal filter bank (energy-preserving).
    """
    B, H, W, C = x.shape
    if H % 2 or W % 2:
        raise ValueError(f"haar_dwt2d needs even spatial dims, got {(H, W)}")
    filt = _haar_filters(x.dtype)  # (2,2,1,4)
    # Depthwise conv: feature_group_count=C, kernel (2,2,1,4C) -> out (B,H/2,W/2,4C)
    kernel = jnp.tile(filt, (1, 1, 1, C))  # (2,2,1,4*C) grouped as C blocks of 4
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
        precision=lax.Precision.HIGHEST,
    )
    y = y.reshape(B, H // 2, W // 2, C, 4)
    LL, LH, HL, HH = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    if quirk_edge_zero:
        # Multiplicative masks (not .at[].set) so the op stays one fused
        # elementwise epilogue after the conv under XLA.
        col = (jnp.arange(W // 2) < W // 2 - 1).astype(x.dtype)[None, None, :, None]
        row = (jnp.arange(H // 2) < H // 2 - 1).astype(x.dtype)[None, :, None, None]
        LH = LH * col
        HL = HL * row
        HH = HH * row * col
    return LL, LH, HL, HH
