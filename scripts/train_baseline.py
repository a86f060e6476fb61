#!/usr/bin/env python
"""One parameterized baseline trainer replacing the reference's 14 cloned
scripts (models/train_NC_* and models/train_*_pic_res*, SURVEY.md D8).

Recipes (from the scripts and the vestigial models/train_utils.py factory):
    --model.name=convlstm|trajgru|smaat_unet|mamba_unet|lptqpn|sceca_net|
                 transunet|swin_unet
    --recipe=nc   LAPS data, 5-in/3-out, Adam 1e-3 (RainfallLoss)
    --recipe=pic  Shanghai 256^2, 5-in/20-out, SimplifiedEvaluator metrics
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmunet_tpu.configs import laps_km_unet, parse_overrides, shanghai_km_unet
from kmunet_tpu.train.engine import train_and_evaluate

RECIPE_LOSS = {
    "convlstm": "weighted_mse_mae",
    "trajgru": "weighted_mse_mae",
    "mamba_unet": "rainfall",
    "swin_unet": "rain",
}


def main():
    argv = list(sys.argv[1:])
    recipe = "pic"
    rest = []
    for a in argv:
        if a.startswith("--recipe="):
            recipe = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = shanghai_km_unet() if recipe == "pic" else laps_km_unet()
    cfg.model.name = "smaat_unet"
    parse_overrides(cfg, rest)
    cfg.model.num_classes = cfg.data.out_frames
    cfg.train.loss = RECIPE_LOSS.get(cfg.model.name, "mse")
    if cfg.model.name in ("mamba_unet",):
        cfg.train.optimizer = "adam"
    if cfg.model.name == "swin_unet":
        cfg.train.optimizer = "sgd"
        cfg.train.lr = 1e-2
    if cfg.data.path is None:
        print("no --data.path given; falling back to synthetic data")
        cfg.data.name = "synthetic"
    results = train_and_evaluate(cfg)
    print({k: v for k, v in results.items() if k != "history"})


if __name__ == "__main__":
    main()
