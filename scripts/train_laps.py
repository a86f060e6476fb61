#!/usr/bin/env python
"""train_LAPS.py-equivalent entry point (reference surface parity).

Reference recipe (train_LAPS.py): KM_UNetV3 LAPS variant (no DAGEM bridge,
bilinear ups), 5-in/3-out sliding 8-frame windows, thresholds
0.1/0.3/0.5/0.7/0.8 on normalized values, scatter-eval metrics CSV.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmunet_tpu.configs import laps_km_unet, parse_overrides
from kmunet_tpu.train.engine import train_and_evaluate


def main():
    cfg = laps_km_unet()
    cfg.train.ckpt_dir = "outputs/checkpoints/laps"
    cfg.train.out_dir = "outputs/laps"  # vis PNGs + scatter_metrics.csv
    parse_overrides(cfg, sys.argv[1:])
    if cfg.data.path is None and cfg.data.name == "laps":
        print("no --data.path given; falling back to synthetic data")
        cfg.data.name = "synthetic"
    results = train_and_evaluate(cfg, log_csv="outputs/laps_epochs.csv")
    print({k: v for k, v in results.items() if k != "history"})


if __name__ == "__main__":
    main()
