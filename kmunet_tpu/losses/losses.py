"""Nowcasting losses, re-derived in pure jnp (all on-device / jit-able).

Sources:
- hybrid_loss:      /root/reference/train_shanghai.py:298-326 (HybridLoss)
- rainfall_loss:    /root/reference/models/loss.py:11-27 (RainfallLoss)
- en_rainfall_loss: /root/reference/models/loss.py:30-57 (enRainfallLoss)
- rain_loss:        /root/reference/models/loss.py:61-69 (RAINlOSS)
- weighted_mse_mae: /root/reference/models/loss.py:73-100 (Weighted_mse_mae)

Functional (not Modules): losses carry no state, so they jit/grad cleanly and
compose with optax.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from kmunet_tpu.ops.ssim import ssim_valid


def hybrid_loss(pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.7) -> jnp.ndarray:
    """KM-UNet's training loss: weighted MSE mix + SSIM on min-max-normalized
    maps. pred/target: (B, T, H, W) or (B, H, W, T) — SSIM treats the two
    trailing axes as the image, so pass (B, T, H, W)."""
    mse = jnp.mean((pred - target) ** 2)

    weight_map = jnp.exp(target * 2.0)  # emphasize heavy rainfall
    weighted = jnp.mean((pred - target) ** 2 * weight_map)

    # Dynamic min-max normalization (stop-grad in the reference via .detach()
    # on min/max; replicate by not letting bounds carry gradient).
    t_min, t_max = jax.lax.stop_gradient(target.min()), jax.lax.stop_gradient(target.max())
    p_min, p_max = jax.lax.stop_gradient(pred.min()), jax.lax.stop_gradient(pred.max())
    t_norm = (target - t_min) / (t_max - t_min + 1e-8)
    p_norm = (pred - p_min) / (p_max - p_min + 1e-8)
    ssim = jnp.mean(ssim_valid(p_norm, t_norm, data_range=1.0))
    ssim_loss = 1.0 - ssim

    return alpha * (0.55 * mse + 0.45 * weighted) + (1.0 - alpha) * ssim_loss


def rainfall_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    omega_t: float = 0.57,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Dynamic quantile weighted L1 with exp emphasis above 0.7."""
    w0 = 0.57
    err = jnp.abs(pred - target)
    ge = (pred >= target).astype(pred.dtype)
    lt = 1.0 - ge
    heavy = (target >= 0.7).astype(pred.dtype)
    wi = alpha * jnp.exp(target)
    base = jnp.sum(ge * (1 - w0) * err) + jnp.sum(lt * w0 * err)
    quant = jnp.sum(ge * heavy * (1 - omega_t) * wi * err) + jnp.sum(
        lt * heavy * omega_t * wi * err
    )
    n = pred.size
    return base / n + quant / n


def en_rainfall_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    omega_t: float = 0.57,
    alpha: float = 0.25,
    gamma: float = 0.1,
) -> jnp.ndarray:
    """rainfall_loss + exponential under-prediction (FN) penalty."""
    err = jnp.abs(pred - target)
    ge = (pred >= target).astype(pred.dtype)
    lt = 1.0 - ge
    heavy = (target >= 0.7).astype(pred.dtype)
    wi = alpha * jnp.exp(target)
    base = jnp.sum(ge * (1 - omega_t) * err) + jnp.sum(lt * omega_t * err)
    quant = jnp.sum(ge * heavy * (1 - omega_t) * wi * err) + jnp.sum(
        lt * heavy * omega_t * wi * err
    )
    fn_penalty = jnp.sum(heavy * lt * gamma * (jnp.exp(alpha * (target - pred)) - 1.0))
    return (base + quant + fn_penalty) / pred.size


def rain_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE + MAE."""
    return jnp.mean((pred - target) ** 2) + jnp.mean(jnp.abs(pred - target))


def weighted_mse_mae(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mse_weight: float = 1.0,
    mae_weight: float = 1.0,
    global_scale: float = 0.00005,
    lam: Optional[float] = None,
    thresholds: Sequence[float] = (),
) -> jnp.ndarray:
    """Rainfall-threshold-banded weights (1,1,2,5,10,30) + per-timestep ramp.

    pred/target: (B, S, C, H, W) — the reference transposes to (S, B, ...)
    first; reductions below are over (C, H, W) per (S, B).
    """
    inp = jnp.swapaxes(pred, 0, 1)
    tgt = jnp.swapaxes(target, 0, 1)
    balancing = (1.0, 1.0, 2.0, 5.0, 10.0, 30.0)
    weights = jnp.full_like(inp, balancing[0])
    for i, thr in enumerate(thresholds):
        weights = weights + (balancing[i + 1] - balancing[i]) * (tgt >= thr).astype(
            inp.dtype
        )
    mse = jnp.sum(weights * (inp - tgt) ** 2, axis=(2, 3, 4))  # (S, B)
    mae = jnp.sum(weights * jnp.abs(inp - tgt), axis=(2, 3, 4))
    if lam is not None:
        S = mse.shape[0]
        w = 1.0 + lam * jnp.arange(S, dtype=mse.dtype)
        mse = mse * w[:, None]
        mae = mae * w[:, None]
    return global_scale * (mse_weight * jnp.mean(mse) + mae_weight * jnp.mean(mae))
