"""Scatter-eval parity vs sklearn/skimage-style oracles (train_LAPS.py:274-331)."""

import numpy as np
import pytest

from kmunet_tpu.metrics.scatter_eval import scatter_evaluate, _ssim_1d


def test_confusion_metrics_match_manual(rng):
    gts = rng.random(5000).astype(np.float32)
    preds = np.clip(gts + rng.normal(scale=0.2, size=5000), 0, 1).astype(np.float32)
    out = scatter_evaluate(gts, preds, thresholds=[0.5])
    m = out[0.5]

    yt = (gts >= 0.5).astype(int)
    yp = (preds >= 0.5).astype(int)
    TP = np.sum((yt == 1) & (yp == 1))
    TN = np.sum((yt == 0) & (yp == 0))
    FP = np.sum((yt == 0) & (yp == 1))
    FN = np.sum((yt == 1) & (yp == 0))
    assert m["accuracy"] == pytest.approx((TP + TN) / 5000)
    assert m["POD"] == pytest.approx(TP / (TP + FN))
    assert m["CSI"] == pytest.approx(TP / (TP + FP + FN))
    assert m["FAR"] == pytest.approx(FP / (TP + FP))
    # reference HSS form WITHOUT factor 2 (train_LAPS.py:288-290)
    want_hss = (TP * TN - FN * FP) / ((TP + FN) * (FN + TN) + (TP + FP) * (FP + TN))
    assert m["HSS"] == pytest.approx(want_hss)
    assert m["RMSE"] == pytest.approx(np.sqrt(np.mean((gts - preds) ** 2)), rel=1e-6)


def test_ssim_1d_matches_skimage_if_available(rng):
    skimage = pytest.importorskip("skimage.metrics")
    x = rng.random(500).astype(np.float64)
    y = np.clip(x + rng.normal(scale=0.1, size=500), 0, 1)
    got = _ssim_1d(x, y, data_range=1.0)
    want = skimage.structural_similarity(x, y, data_range=1.0)
    assert got == pytest.approx(want, abs=1e-6)


def test_csv_written(tmp_path, rng):
    p = str(tmp_path / "m.csv")
    scatter_evaluate(rng.random(100), rng.random(100), thresholds=[0.3, 0.5], csv_path=p)
    lines = open(p).read().strip().splitlines()
    assert lines[0].startswith("Threshold") and len(lines) == 3
