"""Loss parity vs numpy/torch re-derivations of the reference formulas."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kmunet_tpu.losses import (
    hybrid_loss,
    rainfall_loss,
    en_rainfall_loss,
    rain_loss,
    weighted_mse_mae,
)
from kmunet_tpu.ops.ssim import ssim_valid

torch = pytest.importorskip("torch")


def test_rainfall_loss_matches_oracle(rng):
    pred = rng.random((2, 3, 16, 16)).astype(np.float32)
    target = rng.random((2, 3, 16, 16)).astype(np.float32)
    got = float(rainfall_loss(jnp.asarray(pred), jnp.asarray(target)))

    # numpy oracle of models/loss.py:16-27
    w0, omega_t, alpha = 0.57, 0.57, 0.25
    err = np.abs(pred - target)
    ge = pred >= target
    heavy = target >= 0.7
    base = np.sum(ge * (1 - w0) * err) + np.sum(~ge * w0 * err)
    wi = alpha * np.exp(target)
    quant = np.sum(ge * heavy * (1 - omega_t) * wi * err) + np.sum(
        ~ge * heavy * omega_t * wi * err
    )
    want = base / pred.size + quant / pred.size
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_en_rainfall_adds_fn_penalty(rng):
    pred = rng.random((2, 3, 8, 8)).astype(np.float32) * 0.5  # underpredict
    target = np.clip(pred + 0.5, 0, 1).astype(np.float32)  # heavy targets
    a = float(rainfall_loss(jnp.asarray(pred), jnp.asarray(target)))
    b = float(en_rainfall_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert b > 0 and a > 0


def test_rain_loss(rng):
    p = rng.random((4, 8)).astype(np.float32)
    t = rng.random((4, 8)).astype(np.float32)
    got = float(rain_loss(jnp.asarray(p), jnp.asarray(t)))
    want = np.mean((p - t) ** 2) + np.mean(np.abs(p - t))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_mse_mae_matches_torch_oracle(rng):
    """Oracle re-derives models/loss.py:73-100 in torch."""
    B, S, C, H, W = 2, 4, 1, 8, 8
    pred = rng.random((B, S, C, H, W)).astype(np.float32)
    target = rng.random((B, S, C, H, W)).astype(np.float32)
    thresholds = [0.3, 0.5, 0.7, 0.8, 0.9]
    lam = 0.1
    got = float(
        weighted_mse_mae(
            jnp.asarray(pred), jnp.asarray(target), lam=lam, thresholds=thresholds
        )
    )

    inp = torch.from_numpy(pred).transpose(0, 1)
    tgt = torch.from_numpy(target).transpose(0, 1)
    balancing = (1, 1, 2, 5, 10, 30)
    weights = torch.ones_like(inp) * balancing[0]
    for i, thr in enumerate(thresholds):
        weights = weights + (balancing[i + 1] - balancing[i]) * (tgt >= thr).float()
    mse = torch.sum(weights * (inp - tgt) ** 2, (2, 3, 4))
    mae = torch.sum(weights * torch.abs(inp - tgt), (2, 3, 4))
    w = torch.arange(1.0, 1.0 + S * lam, lam)
    mse = (w * mse.permute(1, 0)).permute(1, 0)
    mae = (w * mae.permute(1, 0)).permute(1, 0)
    want = float(0.00005 * (torch.mean(mse) + torch.mean(mae)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_hybrid_loss_formula(rng):
    pred = rng.random((2, 4, 32, 32)).astype(np.float32)
    target = rng.random((2, 4, 32, 32)).astype(np.float32)
    got = float(hybrid_loss(jnp.asarray(pred), jnp.asarray(target)))

    mse = np.mean((pred - target) ** 2)
    weighted = np.mean((pred - target) ** 2 * np.exp(2 * target))
    tn = (target - target.min()) / (target.max() - target.min() + 1e-8)
    pn = (pred - pred.min()) / (pred.max() - pred.min() + 1e-8)
    ssim = float(np.mean(np.asarray(ssim_valid(jnp.asarray(pn), jnp.asarray(tn), 1.0))))
    want = 0.7 * (0.55 * mse + 0.45 * weighted) + 0.3 * (1 - ssim)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_hybrid_loss_grad_finite(rng):
    pred = jnp.asarray(rng.random((1, 2, 16, 16)).astype(np.float32))
    target = jnp.asarray(rng.random((1, 2, 16, 16)).astype(np.float32))
    g = jax.grad(lambda p: hybrid_loss(p, target))(pred)
    assert np.isfinite(np.asarray(g)).all()
