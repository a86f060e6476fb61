#!/usr/bin/env python
"""One parameterized baseline trainer replacing the reference's 15 cloned
scripts (7x models/train_NC_*.py + 8x models/train_*_pic_res*.py,
SURVEY.md D8).

The per-(model, dataset) optimizer/loss/schedule recipes are the audited
table in kmunet_tpu/train/recipes.py (every reference script's settings,
with file:line sources). Usage:

    python scripts/train_baseline.py --model.name=smaat_unet --recipe=nc
    python scripts/train_baseline.py --model.name=convlstm --recipe=pic \
        --data.path=/path/to/shanghai.h5

    --recipe=nc   LAPS data, 5-in/3-out, thresholds 0.1..0.8, scatter eval
    --recipe=pic  Shanghai 256^2, 5-in/20-out, SimplifiedEvaluator metrics

CLI overrides are applied AFTER the recipe, so e.g. --train.lr=1e-4 or
--train.epochs=2 still win for ad-hoc runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmunet_tpu.configs import laps_km_unet, parse_overrides, shanghai_km_unet
from kmunet_tpu.train.engine import train_and_evaluate
from kmunet_tpu.train.recipes import apply_recipe


def main():
    argv = list(sys.argv[1:])
    recipe = "pic"
    model = "smaat_unet"
    rest = []
    for a in argv:
        if a.startswith("--recipe="):
            recipe = a.split("=", 1)[1]
        elif a.startswith("--model.name="):
            model = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = shanghai_km_unet() if recipe == "pic" else laps_km_unet()
    apply_recipe(cfg, model, recipe)
    parse_overrides(cfg, rest)
    cfg.model.num_classes = cfg.data.out_frames
    if cfg.data.path is None:
        print("no --data.path given; falling back to synthetic data")
        cfg.data.name = "synthetic"
    results = train_and_evaluate(cfg)
    print({k: v for k, v in results.items() if k != "history"})


if __name__ == "__main__":
    main()
