"""On-device SSIM (Gaussian-window, valid-region) in pure jnp.

Replaces two reference SSIM paths with one implementation:

1. The evaluation metric (`/root/reference/metrics.py:132-152`): cv2.filter2D
   with an 11x11 Gaussian (sigma 1.5) then a ``[5:-5, 5:-5]`` crop. cv2's
   default reflect-101 border never influences that cropped interior, so the
   crop is exactly a VALID convolution — which is what we compute.
2. The torchmetrics SSIM inside HybridLoss (`train_shanghai.py:302,321-323`):
   also an 11x11/1.5 Gaussian whose map is cropped back by the pad amount
   before the mean — again the valid interior.

The separable Gaussian is applied as two small convs (XLA fuses them); for a
(B, T, H, W) batch the whole metric stays on device.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def gaussian_kernel_1d(size: int = 11, sigma: float = 1.5, dtype=jnp.float32) -> jnp.ndarray:
    """cv2.getGaussianKernel-compatible normalized 1D Gaussian."""
    half = (size - 1) / 2.0
    x = jnp.arange(size, dtype=dtype) - half
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def _filter_valid(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable VALID Gaussian filtering of ``(N, H, W)`` images."""
    n = k1d.shape[0]
    x = img[..., None]  # (N, H, W, 1)
    kh = k1d.reshape(n, 1, 1, 1).astype(img.dtype)
    kw = k1d.reshape(1, n, 1, 1).astype(img.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    hp = lax.Precision.HIGHEST
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn, precision=hp)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID", dimension_numbers=dn, precision=hp)
    return x[..., 0]


def ssim_valid(
    pred: jnp.ndarray,
    true: jnp.ndarray,
    data_range: float,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over the valid (un-padded) interior, per leading-batch image.

    Args:
      pred, true: ``(..., H, W)``; leading dims are flattened into a batch.
      data_range: dynamic range of the inputs (90.0 for the rescaled radar
        frames in the reference metric; 1.0 inside HybridLoss).

    Returns:
      ``(...,)`` per-image mean SSIM over the valid region.
    """
    lead = pred.shape[:-2]
    H, W = pred.shape[-2:]
    p = pred.reshape((-1, H, W)).astype(jnp.float32)
    t = true.reshape((-1, H, W)).astype(jnp.float32)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    k1d = gaussian_kernel_1d(kernel_size, sigma)

    mu1 = _filter_valid(p, k1d)
    mu2 = _filter_valid(t, k1d)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter_valid(p * p, k1d) - mu1_sq
    sigma2_sq = _filter_valid(t * t, k1d) - mu2_sq
    sigma12 = _filter_valid(p * t, k1d) - mu1_mu2

    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map, axis=(-2, -1)).reshape(lead)


def ssim_torchmetrics(pred: jnp.ndarray, true: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Scalar SSIM over a (B, C, H, W)-or-(B, H, W, C) batch, torchmetrics-style.

    torchmetrics' StructuralSimilarityIndexMeasure (HybridLoss,
    train_shanghai.py:302) averages the per-channel valid-region SSIM map over
    the whole batch; channels are independent images here (forecast frames).
    """
    if pred.ndim == 3:
        pred, true = pred[None], true[None]
    # Accept NCHW or NHWC; SSIM is per-2D-slice so only the trailing two
    # spatial dims matter — callers pass (B, T, H, W).
    per_img = ssim_valid(pred, true, data_range=data_range)
    return jnp.mean(per_img)
