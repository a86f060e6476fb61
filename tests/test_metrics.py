"""Evaluator parity vs a numpy re-derivation of SimplifiedEvaluator
(metrics.py:45-152, 220-288), including the uint16-truncation quirk."""

import numpy as np
import jax.numpy as jnp

from kmunet_tpu.metrics import Evaluator


def reference_done(true, pred, thresholds, scale):
    """numpy oracle of the evaluate+done pipeline (no SSIM/LPIPS)."""
    pred = pred.clip(0, 1)
    true = true.clip(0, 1)
    p_int = (pred * scale).astype(np.uint16)
    t_int = (true * scale).astype(np.uint16)
    out = {}
    fars = []
    for thr in thresholds:
        ob = (t_int >= thr).astype(int)
        sb = (p_int >= thr).astype(int)
        TP = float(np.sum((ob == 1) & (sb == 1)))
        FN = float(np.sum((ob == 1) & (sb == 0)))
        FP = float(np.sum((ob == 0) & (sb == 1)))
        TN = float(np.sum((ob == 0) & (sb == 0)))
        CSI = TP / (TP + FP + FN)
        POD = TP / (TP + FN)
        HSS = (2 * (TP * TN - FP * FN)) / (
            FP**2 + FN**2 + 2 * TP * TN + (FP + FN) * (TP + TN)
        )
        fars.append(FP / (TP + FP))
        out[thr] = {"CSI": CSI, "POD": POD, "HSS": HSS}
    mse = ((pred * scale - true * scale) ** 2).mean(axis=(-2, -1))  # (B, T)
    rmse = float(np.mean(np.sqrt(np.mean(mse, axis=0))))
    return out, float(np.mean(fars)), rmse


def test_evaluator_matches_reference_oracle(rng):
    B, T, H, W = 3, 6, 32, 32
    # biased so thresholds 20-40 of 90 get hits
    true = (rng.random((B, T, H, W)) ** 0.5).astype(np.float32)
    pred = np.clip(true + rng.normal(scale=0.15, size=true.shape), 0, 1).astype(np.float32)
    thresholds = (20, 30, 35, 40)

    ev = Evaluator(seq_len=T, value_scale=90, thresholds=thresholds)
    # stream two batches to exercise accumulation
    ev.evaluate(true[:2], pred[:2])
    ev.evaluate(true[2:], pred[2:])
    got = ev.done()

    want_thr, want_far, want_rmse = reference_done(true, pred, thresholds, 90)
    for thr in thresholds:
        for k in ("CSI", "POD", "HSS"):
            np.testing.assert_allclose(
                got["threshold_metrics"][thr][k], want_thr[thr][k], atol=1e-6
            )
    np.testing.assert_allclose(got["FAR"], want_far, atol=1e-6)
    np.testing.assert_allclose(got["RMSE"], want_rmse, rtol=1e-5)
    assert 0 <= got["SSIM"] <= 1
    assert np.isnan(got["LPIPS"])  # lpips disabled without weights


def test_evaluator_perfect_prediction(rng):
    x = (rng.random((2, 4, 24, 24)) ** 0.5).astype(np.float32)
    ev = Evaluator(seq_len=4, value_scale=90)
    ev.evaluate(x, x)
    r = ev.done()
    for thr, m in r["threshold_metrics"].items():
        assert m["CSI"] == 1.0 and m["POD"] == 1.0 and m["HSS"] == 1.0
    assert r["RMSE"] < 1e-4 and abs(r["SSIM"] - 1.0) < 1e-5 and r["FAR"] == 0.0
