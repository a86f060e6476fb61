#!/usr/bin/env python
"""Backend-health control for the round-5 train-step hang: ConvLSTM EF
train step at B8 (no Pallas kernels anywhere in its graph). If this runs
N iterations cleanly while the flagship step hangs after step 1, the hang
is in the flagship graph; if this also hangs, the backend/tunnel is sick.

Usage: python scripts/diag_control_convlstm.py [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from kmunet_tpu.configs import shanghai_km_unet
from kmunet_tpu.train.engine import (
    build_loss, build_model, build_optimizer, init_state, make_train_step,
)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = shanghai_km_unet()
    cfg.model.name = "convlstm"
    cfg.data.img_size = 128
    cfg.data.batch_size = 8
    cfg.data.out_frames = 20
    cfg.train.compute_dtype = "bfloat16"
    model = build_model(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, build_loss(cfg), tx, cfg)
    batch = jax.random.uniform(
        jax.random.PRNGKey(1), (8, cfg.data.seq_len, 128, 128))
    rng = jax.random.PRNGKey(2)
    print("compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])
    print(f"compiled+step1 {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    for k in range(iters):
        t0 = time.perf_counter()
        state, m = step(state, batch, rng)
        _ = float(m["loss"])
        print(json.dumps({"iter": k, "ms": round(
            (time.perf_counter() - t0) * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
