"""Flattened "scatter" evaluation — the second metrics path of the reference.

Re-derivation of `/root/reference/train_LAPS.py:274-331` (same code in every
`models/train_NC_*` script and models/engine.py:83-166): flatten all preds
and ground truths, binarize per threshold, and compute
accuracy / HSS / POD / specificity / F1 / CSI / FAR from the confusion
matrix, plus global RMSE; optionally append rows to a CSV.

Reference quirks kept:
- HSS uses the (TP*TN - FN*FP) / ((TP+FN)(FN+TN) + (TP+FP)(FP+TN)) form
  WITHOUT the factor of 2 (train_LAPS.py:288-290) — different from
  SimplifiedEvaluator's HSS.
- The reference computes skimage SSIM on the *flattened 1-D* vectors
  (train_LAPS.py:303), which makes SSIM a 1-D windowed statistic over the
  scan order. That is degenerate but is the published behavior; we replicate
  it with an 11-wide 1-D uniform-free gaussian... no — skimage's default on
  1-D uses a 7-wide uniform window with its standard constants, which is
  what we implement.
"""

from __future__ import annotations

import csv
import os
from typing import Optional, Sequence

import numpy as np


def _ssim_1d(x: np.ndarray, y: np.ndarray, data_range: float = 1.0, win: int = 7) -> float:
    """skimage structural_similarity on 1-D signals: 7-wide uniform window,
    C1=(0.01 R)^2, C2=(0.03 R)^2, sample covariance normalization (ddof=1
    correction factor as skimage uses crop + cov_norm = n/(n-1))."""
    n = win
    pad = n // 2
    kernel = np.ones(n) / n

    def filt(a):
        return np.convolve(a, kernel, mode="valid")

    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    cov_norm = n / (n - 1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
    del pad
    return float(s.mean())


def scatter_evaluate(
    gts: np.ndarray,
    preds: np.ndarray,
    thresholds: Sequence[float] = (0.1, 0.3, 0.5, 0.7, 0.8),
    csv_path: Optional[str] = None,
    ssim_max_elems: int = 2_000_000,
) -> dict:
    """Returns {threshold: {SSIM, FAR, CSI, HSS, POD, specificity, accuracy,
    F1, RMSE}}. gts/preds: any-shape arrays of normalized values."""
    gts = np.asarray(gts, np.float64).reshape(-1)
    preds = np.asarray(preds, np.float64).reshape(-1)
    rmse = float(np.sqrt(np.mean((gts - preds) ** 2)))
    # Flat 1-D SSIM (reference behavior); subsample very long vectors.
    if gts.size > ssim_max_elems:
        idx = slice(0, ssim_max_elems)
        ssim_val = _ssim_1d(gts[idx], preds[idx])
    else:
        ssim_val = _ssim_1d(gts, preds)

    results = {}
    for thr in thresholds:
        yp = preds >= thr
        yt = gts >= thr
        TP = float(np.sum(yt & yp))
        TN = float(np.sum(~yt & ~yp))
        FP = float(np.sum(~yt & yp))
        FN = float(np.sum(yt & ~yp))
        total = TP + TN + FP + FN
        accuracy = (TN + TP) / total if total else 0.0
        denom = (TP + FN) * (FN + TN) + (TP + FP) * (FP + TN)
        HSS = (TP * TN - FN * FP) / denom if denom else 0.0
        POD = TP / (TP + FN) if TP + FN else 0.0
        specificity = TN / (TN + FP) if TN + FP else 0.0
        F1 = 2 * TP / (2 * TP + FP + FN) if 2 * TP + FP + FN else 0.0
        CSI = TP / (TP + FP + FN) if TP + FP + FN else 0.0
        FAR = FP / (TP + FP) if TP + FP else 0.0
        row = {
            "SSIM": ssim_val, "FAR": FAR, "CSI": CSI, "HSS": HSS, "POD": POD,
            "specificity": specificity, "accuracy": accuracy, "F1": F1,
            "RMSE": rmse,
        }
        results[thr] = row
        if csv_path:
            new = not os.path.exists(csv_path) or os.path.getsize(csv_path) == 0
            with open(csv_path, "a", newline="") as f:
                w = csv.writer(f)
                if new:
                    w.writerow(["Threshold", "SSIM", "FAR", "CSI", "HSS", "POD", "RMSE"])
                w.writerow([thr] + [round(row[k], 4) for k in
                                    ("SSIM", "FAR", "CSI", "HSS", "POD", "RMSE")])
    return results
