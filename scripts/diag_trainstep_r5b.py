#!/usr/bin/env python
"""Round-5 train-step A/B: DySample window path vs exact gather paths.

Isolates the round-4/5 train-step mystery: the full flagship train step at
B16 dies with an opaque `INVALID_ARGUMENT: TPU backend error` when the
Pallas bilinear backward is active inside the full step (fwd-only and
grad-through-model phases pass), while the round-4 driver bench measured
the same step at 786 ms hours earlier. Modes:

  window      DYSAMPLE_WINDOW=True  (dense 3x3-window formulation, round 5)
  pallas_bwd  window off, Pallas transposed-kernel backward (round-4 default)
  xla_bwd     window off, XLA scatter-add VJP (round-3 path)

Each mode runs in a fresh interpreter (os.fork-free: subprocess) so a
backend crash in one mode cannot poison the next.

Usage: python scripts/diag_trainstep_r5b.py [B] [iters]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, "@ROOT@")
import jax, jax.numpy as jnp
mode = "@MODE@"
B = @B@
iters = @ITERS@

from kmunet_tpu.nn import resample
from kmunet_tpu.kernels import bilinear_pallas
# window: dense DySample + default backward for remaining gathers (DAGEM)
# window_xbwd: dense DySample + XLA scatter-add VJP everywhere
# pallas_bwd / xla_bwd: exact gather DySample + pallas / XLA backward
resample.DYSAMPLE_WINDOW = mode.startswith("window")
if mode != "window":
    bilinear_pallas.USE_PALLAS_BACKWARD = None if mode == "pallas_bwd" else False

from kmunet_tpu.configs import shanghai_km_unet
from kmunet_tpu.train.engine import (build_loss, build_model, build_optimizer,
                                     init_state, make_train_step)
cfg = shanghai_km_unet()
cfg.data.img_size = 128
cfg.data.batch_size = B
cfg.data.out_frames = 20
model = build_model(cfg)
tx = build_optimizer(cfg, steps_per_epoch=100)
print(f"[{mode}] init...", file=sys.stderr, flush=True)
state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
step = make_train_step(model, build_loss(cfg), tx, cfg)
batch = jax.random.uniform(jax.random.PRNGKey(1), (B, cfg.data.seq_len, 128, 128))
rng = jax.random.PRNGKey(2)
print(f"[{mode}] compiling train step...", file=sys.stderr, flush=True)
t0 = time.perf_counter()
state, m = step(state, batch, rng)
jax.block_until_ready(m["loss"])
print(f"[{mode}] compiled+step1 in {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)
# absorb the axon second-execution penalty (measured 119.5s on the B8
# ConvLSTM step, round 5) before timing
t0 = time.perf_counter()
state, m = step(state, batch, rng)
jax.block_until_ready(m["loss"])
print(f"[{mode}] exec2 (penalty) {time.perf_counter()-t0:.1f}s",
      file=sys.stderr, flush=True)
t0 = time.perf_counter()
for k in range(iters):
    tk = time.perf_counter()
    state, m = step(state, batch, rng)
    _ = float(m["loss"])  # block every iter: isolates per-exec hangs and
    # keeps the async queue depth at 1 (readback adds ~one tunnel RTT/iter)
    print(f"[{mode}] iter {k}: {(time.perf_counter()-tk)*1e3:.1f} ms",
          file=sys.stderr, flush=True)
dt = (time.perf_counter() - t0) / iters
print(json.dumps({"mode": mode, "batch": B,
                  "train_step_ms": round(dt * 1e3, 1),
                  "train_fps_per_chip": round(B * 20 / dt, 1)}), flush=True)
"""


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 16
    iters = int(args[1]) if len(args) > 1 else 10
    modes = [a for a in sys.argv[1:] if a.startswith("--modes=")]
    modes = modes[0].split("=", 1)[1].split(",") if modes else [
        "window", "pallas_bwd", "xla_bwd"]
    for mode in modes:
        code = (CHILD.replace("@ROOT@", ROOT).replace("@MODE@", mode)
                .replace("@B@", str(B)).replace("@ITERS@", str(iters)))
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired as e:
            err = e.stderr if isinstance(e.stderr, str) else (
                e.stderr.decode() if e.stderr else "")
            err = err[-500:]
            print(json.dumps({"mode": mode, "batch": B,
                              "error": "timeout1800", "progress": err}),
                  flush=True)
            continue
        out = r.stdout.strip().splitlines()
        if r.returncode == 0 and out:
            print(out[-1], flush=True)
        else:
            err = (r.stderr or "").strip().splitlines()
            print(json.dumps({"mode": mode, "batch": B, "error":
                              err[-1][-300:] if err else f"rc={r.returncode}"}),
                  flush=True)


if __name__ == "__main__":
    main()
