"""Streaming nowcast metrics, computed on device.

Re-derivation of the reference ``SimplifiedEvaluator``
(`/root/reference/metrics.py:14-312`): per-frame contingency counts
(TP/FN/FP/TN) at each rainfall threshold after x``value_scale`` integer
rescaling, plus MAE/MSE/RMSE/PSNR and Gaussian-window SSIM. Aggregation in
``done()`` matches metrics.py:220-288 exactly:

    CSI = TP/(TP+FP+FN)      POD = TP/(TP+FN)     FAR = FP/(TP+FP)
    HSS = 2(TP*TN - FP*FN) / (FP^2 + FN^2 + 2 TP*TN + (FP+FN)(TP+TN))
    RMSE = mean_t sqrt(mean_samples MSE_t)

Differences from the reference (by design):
- The per-batch computation is one jitted TPU call (the reference runs a
  python triple loop over thresholds x batch x frames on host numpy —
  metrics.py:68-101).
- The uint16 cast in ``float2int`` (metrics.py:45-47) truncates; we replicate
  with floor() so thresholding is bit-identical.
- LPIPS is optional: the reference downloads pretrained AlexNet weights,
  which this environment cannot; pass ``lpips_fn`` to enable, else NaN.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kmunet_tpu.ops.ssim import ssim_valid


@functools.partial(jax.jit, static_argnames=("thresholds", "value_scale"))
def batch_metrics(
    true: jnp.ndarray,
    pred: jnp.ndarray,
    thresholds: tuple[int, ...],
    value_scale: float,
):
    """Per-frame metrics for a (B, T, H, W) batch, all on device.

    Returns dict with 'cont' (n_thr, B, T, 4) int32 [TP, FN, FP, TN] and
    (B, T) float arrays 'mae', 'mse', 'rmse', 'psnr', 'ssim'.
    """
    pred = jnp.clip(pred, 0.0, 1.0)
    true = jnp.clip(true, 0.0, 1.0)

    # float2int truncation semantics (metrics.py:45-47).
    p_int = jnp.floor(pred * value_scale)
    t_int = jnp.floor(true * value_scale)

    conts = []
    for thr in thresholds:
        ob = t_int >= thr
        sb = p_int >= thr
        TP = jnp.sum(ob & sb, axis=(-2, -1))
        FN = jnp.sum(ob & ~sb, axis=(-2, -1))
        FP = jnp.sum(~ob & sb, axis=(-2, -1))
        TN = jnp.sum(~ob & ~sb, axis=(-2, -1))
        conts.append(jnp.stack([TP, FN, FP, TN], axis=-1))
    cont = jnp.stack(conts, axis=0).astype(jnp.int32)

    ps = pred * value_scale
    ts = true * value_scale
    mae = jnp.mean(jnp.abs(ps - ts), axis=(-2, -1))
    mse = jnp.mean((ps - ts) ** 2, axis=(-2, -1))
    rmse = jnp.sqrt(mse)
    psnr = 20.0 * jnp.log10(value_scale / jnp.sqrt(mse))
    ssim = ssim_valid(ps, ts, data_range=value_scale)

    return {"cont": cont, "mae": mae, "mse": mse, "rmse": rmse, "psnr": psnr, "ssim": ssim}


class Evaluator:
    """Streaming evaluator with the reference's API shape
    (evaluate/done/reset, metrics.py:49,220,290)."""

    def __init__(
        self,
        seq_len: int,
        value_scale: float,
        thresholds: Sequence[int] = (20, 30, 35, 40),
        lpips_fn: Optional[Callable] = None,
    ):
        self.seq_len = seq_len
        self.value_scale = float(value_scale)
        self.thresholds = tuple(thresholds)
        self.lpips_fn = lpips_fn
        self.reset()

    def reset(self):
        self._cont = np.zeros((len(self.thresholds), 4), np.int64)
        self._cont_t = np.zeros((len(self.thresholds), self.seq_len, 4), np.int64)
        self._mse: list[np.ndarray] = []
        self._ssim: list[np.ndarray] = []
        self._mae: list[np.ndarray] = []
        self._psnr: list[np.ndarray] = []
        self._lpips: list[np.ndarray] = []
        self.total = 0

    def evaluate(self, true_batch, pred_batch):
        true = jnp.asarray(true_batch)
        pred = jnp.asarray(pred_batch)
        out = batch_metrics(true, pred, self.thresholds, self.value_scale)
        cont = np.asarray(out["cont"])  # (n_thr, B, T, 4)
        self._cont += cont.sum(axis=(1, 2)).astype(np.int64)
        self._cont_t += cont.sum(axis=1).astype(np.int64)
        self._mse.append(np.asarray(out["mse"]))
        self._ssim.append(np.asarray(out["ssim"]))
        self._mae.append(np.asarray(out["mae"]))
        self._psnr.append(np.asarray(out["psnr"]))
        if self.lpips_fn is not None:
            self._lpips.append(np.asarray(self.lpips_fn(pred, true)))
        self.total += true.shape[0]

    def done(self) -> dict:
        threshold_metrics = {}
        all_far = []
        # Degenerate denominators yield NaN, matching the reference's
        # np.seterr(divide/invalid='ignore') behavior (metrics.py:7).
        with np.errstate(divide="ignore", invalid="ignore"):
            for i, thr in enumerate(self.thresholds):
                TP, FN, FP, TN = (np.float64(v) for v in self._cont[i])
                CSI = float(TP / (TP + FP + FN))
                POD = float(TP / (TP + FN))
                HSS = float(
                    (2 * (TP * TN - FP * FN))
                    / (FP**2 + FN**2 + 2 * TP * TN + (FP + FN) * (TP + TN))
                )
                FAR = float(FP / (TP + FP))
                all_far.append(FAR)
                threshold_metrics[thr] = {"CSI": CSI, "POD": POD, "HSS": HSS}

        mse = np.concatenate(self._mse, axis=0)  # (N, T)
        rmse = float(np.mean(np.sqrt(np.mean(mse, axis=0))))
        ssim = float(np.mean(np.concatenate(self._ssim, axis=0)))
        lpips = float(np.mean(np.concatenate(self._lpips))) if self._lpips else float("nan")

        return {
            "threshold_metrics": threshold_metrics,
            "FAR": float(np.mean(all_far)),
            "RMSE": rmse,
            "SSIM": ssim,
            "LPIPS": lpips,
            # Explicit status instead of a silently-NaN metric: the reference
            # always reports real LPIPS because it downloads AlexNet weights
            # (metrics.py:37-39); this environment has no egress, so the value
            # is only real when --data.lpips_weights points at a converted npz.
            "LPIPS_status": (
                "ok" if self.lpips_fn is not None
                else "needs weights (--data.lpips_weights=<npz>, see metrics/lpips.py)"
            ),
        }

    def per_horizon(self) -> dict:
        """Per-forecast-frame breakdown (not part of the reference surface;
        added for the round-5 late-horizon-collapse root-cause): CSI / POD /
        FAR per output frame t at each threshold, plus per-t RMSE and SSIM."""
        out: dict = {"thresholds": {}}
        with np.errstate(divide="ignore", invalid="ignore"):
            for i, thr in enumerate(self.thresholds):
                TP, FN, FP, TN = (self._cont_t[i, :, j].astype(np.float64)
                                  for j in range(4))
                out["thresholds"][thr] = {
                    "CSI": (TP / (TP + FP + FN)).tolist(),
                    "POD": (TP / (TP + FN)).tolist(),
                    "FAR": (FP / (TP + FP)).tolist(),
                }
        if self._mse:
            mse = np.concatenate(self._mse, axis=0)      # (N, T)
            out["RMSE"] = np.sqrt(mse.mean(axis=0)).tolist()
        if self._ssim:
            out["SSIM"] = np.concatenate(self._ssim, axis=0).mean(axis=0).tolist()
        return out
