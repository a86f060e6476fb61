#!/usr/bin/env python
"""Standalone checkpoint evaluation (reference surface parity).

The reference reloads the saved best model and runs test() — streaming
CSI/POD/HSS/FAR/RMSE/SSIM/LPIPS evaluation plus prediction/gt/input PNG
strips (train_shanghai.py:437-441, 218-283). This is that flow without the
training run in front of it:

    python scripts/evaluate.py --ckpt=outputs/checkpoints/shanghai \
        [--which=latest] [--config=shanghai|laps|synthetic] \
        [--data.path=/path/shanghai.h5] [any --a.b=c override]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmunet_tpu.configs import laps_km_unet, parse_overrides, shanghai_km_unet
from kmunet_tpu.train.engine import evaluate_checkpoint


def main():
    ckpt_dir = None
    which = "best"
    config_name = "shanghai"
    rest = []
    for a in sys.argv[1:]:
        if a.startswith("--ckpt="):
            ckpt_dir = a.split("=", 1)[1]
        elif a.startswith("--which="):
            which = a.split("=", 1)[1]
        elif a.startswith("--config="):
            config_name = a.split("=", 1)[1]
        else:
            rest.append(a)
    if not ckpt_dir:
        sys.exit("usage: evaluate.py --ckpt=<checkpoint dir> [--which=best|latest]")
    if which not in ("best", "latest"):
        sys.exit(f"--which={which}: expected 'best' or 'latest'")

    cfg = laps_km_unet() if config_name == "laps" else shanghai_km_unet()
    if config_name == "synthetic":
        cfg.data.name = "synthetic"
    cfg.train.out_dir = cfg.train.out_dir or "outputs/evaluate"
    parse_overrides(cfg, rest)
    if cfg.data.path is None and cfg.data.name == "shanghai":
        print("no --data.path given; falling back to synthetic data")
        cfg.data.name = "synthetic"
    results = evaluate_checkpoint(cfg, ckpt_dir, which=which)
    print(results)


if __name__ == "__main__":
    main()
