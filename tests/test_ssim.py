"""SSIM parity vs the reference cv2 implementation (metrics.py:132-152)."""

import numpy as np
import pytest
import jax.numpy as jnp

from kmunet_tpu.ops import ssim_valid

cv2 = pytest.importorskip("cv2")


def reference_cal_ssim(pred, true, value_scale):
    # numpy/cv2 oracle with the exact constants of metrics.py:132-152
    C1 = (0.01 * value_scale) ** 2
    C2 = (0.03 * value_scale) ** 2
    img1 = pred.astype(np.float64)
    img2 = true.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def test_ssim_matches_cv2_reference(rng):
    scale = 90.0
    pred = (rng.random((3, 48, 48)) * scale).astype(np.float32)
    true = np.clip(pred + rng.normal(scale=5.0, size=pred.shape), 0, scale).astype(np.float32)
    got = np.asarray(ssim_valid(jnp.asarray(pred), jnp.asarray(true), data_range=scale))
    want = np.array([reference_cal_ssim(pred[i], true[i], scale) for i in range(3)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ssim_identity_is_one(rng):
    x = (rng.random((2, 32, 32)) * 90).astype(np.float32)
    s = np.asarray(ssim_valid(jnp.asarray(x), jnp.asarray(x), data_range=90.0))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)
