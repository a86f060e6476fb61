#!/bin/bash
# Relative-quality table (VERDICT r2 item 6): train SmaAt-UNet and ConvLSTM
# on the IDENTICAL synthetic-storm corpus + recipe as the round-2 KM_UNetV3
# run (BASELINE.md "Sustained training run"), so the only variable is the
# model. Recipe = the reference KM-UNet recipe (AdamW lr 1e-3 wd 0.05,
# per-epoch cosine, HybridLoss alpha 0.7, train_shanghai.py:342,396-401) at
# 128^2 bf16, batch 32, 80 epochs, seeded synthetic corpus 512/128/128
# (data/synthetic.py — deterministic per index, so all three runs see
# byte-identical data). Eval = the same streaming SimplifiedEvaluator at
# thresholds [20, 30, 35, 40].
#
# Mirrors the reference's train_*_pic_result comparison intent
# (models/train_SmAt_unet_pic_resul.py:339) — it trains each zoo model on
# the same corpus as KM-UNet and compares CSI/HSS.
#
# Runs on the single real TPU chip; ~1 h/model wall. Results land in
# outputs/quality_table/<model>/ and one JSON line per model on stdout.
set -e
cd "$(dirname "$0")/.."

COMMON="--data.img_size=128 --data.batch_size=32 --data.synthetic_length=512
  --train.epochs=80 --train.cosine_t_max=80 --train.compute_dtype=bfloat16
  --train.vis_batches=1 --data.device_cache=true"

# km_unet is re-run under the same device-cached epoch runner so all rows
# share the exact same shuffle stream (the round-2 BASELINE.md run used the
# host-loader RNG; relative comparison wants one stream).
for MODEL in km_unet_v3 smaat_unet convlstm; do
  echo "=== $MODEL ==="
  python scripts/train_shanghai.py --model.name=$MODEL $COMMON \
    --train.ckpt_dir=outputs/quality_table/$MODEL/ckpt \
    --train.out_dir=outputs/quality_table/$MODEL \
    2>&1 | tail -20
done
