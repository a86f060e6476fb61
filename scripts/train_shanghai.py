#!/usr/bin/env python
"""train_shanghai.py-equivalent entry point (reference surface parity).

Runs the reference recipe (train_shanghai.py:329-447): KM_UNetV3 SH variant,
5-in/20-out at 256^2, AdamW lr 1e-3 wd 0.05, per-epoch cosine (T_max 200,
eta_min 5e-4), 120 epochs, HybridLoss alpha 0.7, best-val checkpointing,
CSI/POD/HSS/FAR/RMSE/SSIM test evaluation.

    python scripts/train_shanghai.py --data.path=/path/shanghai.h5 \
        [--train.epochs=...] [--mesh.data=...] [any --a.b=c override]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmunet_tpu.configs import parse_overrides, shanghai_km_unet
from kmunet_tpu.train.engine import train_and_evaluate


def main():
    cfg = shanghai_km_unet()
    cfg.train.ckpt_dir = "outputs/checkpoints/shanghai"
    cfg.train.out_dir = "outputs/shanghai"  # first-10-batch vis PNG strips
    parse_overrides(cfg, sys.argv[1:])
    if cfg.data.path is None and cfg.data.name == "shanghai":
        print("no --data.path given; falling back to synthetic data")
        cfg.data.name = "synthetic"
    csv_dir = cfg.train.out_dir or "outputs"
    results = train_and_evaluate(
        cfg, log_csv=os.path.join(csv_dir, "shanghai_epochs.csv"))
    print({k: v for k, v in results.items() if k != "history"})


if __name__ == "__main__":
    main()
