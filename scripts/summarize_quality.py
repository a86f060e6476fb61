#!/usr/bin/env python
"""Build the relative-quality markdown table from quality-table run artifacts.

Reads ``outputs/quality_table/<model>/results.json`` (written by the engine
after each run of scripts/run_quality_table.sh) and prints the CSI/HSS
side-by-side table for BASELINE.md — the measured analogue of the reference
repo's train_*_pic_result comparison intent.

    python scripts/summarize_quality.py [root=outputs/quality_table]
"""

import json
import os
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "outputs/quality_table"
    rows = []
    for model in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        p = os.path.join(root, model, "results.json")
        if not os.path.exists(p):
            print(f"(skipping {model}: no results.json)", file=sys.stderr)
            continue
        rows.append((model, json.load(open(p))))
    if not rows:
        sys.exit(f"no results under {root}")

    thresholds = sorted({t for _, r in rows for t in r["threshold_metrics"]},
                        key=float)
    hdr = ["model"] + [f"CSI@{t}" for t in thresholds] + [f"HSS@{t}" for t in thresholds] \
        + ["FAR", "RMSE", "SSIM", "val loss"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    # results.json serializes non-finite metrics as strings ("nan") — the
    # evaluator deliberately yields NaN CSI/HSS at degenerate thresholds.
    fmt = lambda v: f"{v:.3f}" if isinstance(v, (int, float)) else str(v)  # noqa: E731
    for model, r in rows:
        tm = r["threshold_metrics"]
        cells = [model]
        cells += [fmt(tm[t]["CSI"]) if t in tm else "—" for t in thresholds]
        cells += [fmt(tm[t]["HSS"]) if t in tm else "—" for t in thresholds]
        cells += [fmt(r.get("FAR")), fmt(r.get("RMSE")), fmt(r.get("SSIM")),
                  fmt(r.get("final_val_loss"))]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
