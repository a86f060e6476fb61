"""Benchmark: nowcast frames/sec/chip for KM_UNetV3 at 128x128, 5-in/20-out.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is the
first recorded run of this harness: bench.py appends its measurement history
to BENCH_HISTORY.jsonl and reports vs_baseline relative to the first entry.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl")

IMG = 128
BATCH = 8
OUT_FRAMES = 20
WARMUP = 3
ITERS = 20


def measure() -> float:
    from kmunet_tpu.models import KM_UNetV3_SH

    model = KM_UNetV3_SH(num_classes=OUT_FRAMES)
    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, IMG, IMG, 5))
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 5)))

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    y = fwd(variables, x)
    y.block_until_ready()
    for _ in range(WARMUP):
        fwd(variables, x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = fwd(variables, x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS

    n_chips = max(jax.device_count(), 1)
    frames_per_sec = BATCH * OUT_FRAMES / dt
    return frames_per_sec / n_chips


def main():
    fps = measure()
    baseline = None
    if os.path.exists(HISTORY):
        with open(HISTORY) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("metric") == "nowcast_fps_per_chip_128px":
                    baseline = rec["value"]
                    break
    record = {
        "metric": "nowcast_fps_per_chip_128px",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline, 3) if baseline else 1.0,
    }
    with open(HISTORY, "a") as f:
        f.write(json.dumps({**record, "ts": time.time()}) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
