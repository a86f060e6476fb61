#!/usr/bin/env python
"""Round-5 train-step regression localizer (VERDICT r4 #1).

The driver's final round-4 bench measured the flagship train step at 786 ms
@B16 where the previous measurement (same config) was 320.1 ms; the only
intervening change was the Pallas bilinear *backward* kernel landing as the
default VJP, never measured on silicon. This script decomposes the step:

  phase A: fwd (bf16 apply)                    -- chained, 10 iters
  phase B: grad through model only (sum-sq)    -- isolates model backward
  phase C: value_and_grad of hybrid loss       -- adds loss (SSIM convs)
  phase D: full train step (loss+grad+AdamW)   -- adds optimizer
each measured twice: Pallas bilinear backward (round-4 default) vs the XLA
scatter-add VJP (round-3 path), plus the three isolated DySample-module
backward shapes. Output: one JSON line per measurement.

Usage: python scripts/diag_trainstep_r5.py [B ...]   (default: 16 32)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bf16_tree(t):
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)


def measure_full(B: int, img: int = 128, iters: int = 10) -> dict:
    """Phases A-D at batch B, one dict of ms values per backward mode."""
    import time

    from kmunet_tpu.configs import shanghai_km_unet
    from kmunet_tpu.kernels import bilinear_pallas
    from kmunet_tpu.train.engine import (
        build_loss, build_model, build_optimizer, init_state, make_train_step,
        _make_train_body)
    from kmunet_tpu.utils.profiler import chained_time_ms

    cfg = shanghai_km_unet()
    cfg.data.img_size = img
    cfg.data.batch_size = B
    cfg.data.out_frames = 20
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, tx, cfg)
    batch = jax.random.uniform(
        jax.random.PRNGKey(1), (B, cfg.data.seq_len, img, img))
    rng = jax.random.PRNGKey(2)

    xin = jax.random.uniform(jax.random.PRNGKey(3), (B, img, img, 5),
                             jnp.bfloat16)
    v16 = bf16_tree({"params": state.params,
                     "batch_stats": state.batch_stats})

    out = {}
    for mode, flag in (("pallas_bwd", None), ("xla_bwd", False)):
        bilinear_pallas.USE_PALLAS_BACKWARD = flag

        # A: forward only
        out[f"fwd_ms[{mode}]"] = round(chained_time_ms(
            lambda vv, a: model.apply(vv, a), v16, xin, iters=iters), 1)

        # B: grad through the model only (no hybrid loss, no opt)
        def sumsq(vv, a):
            return jnp.sum(model.apply(vv, a).astype(jnp.float32) ** 2)

        g = jax.grad(sumsq, argnums=0)
        out[f"grad_model_ms[{mode}]"] = round(chained_time_ms(
            lambda vv, a: g(vv, a), v16, xin, iters=iters), 1)

        # C: value_and_grad of the real loss (bf16 AMP cast, hybrid loss)
        body = _make_train_body(model, loss_fn, tx, cfg)

        # D: full train step (C + AdamW + state rebuild), state-chained
        # sequential dispatches (donated state forbids fori_loop reuse).
        st = state
        st, m = step(st, batch, rng)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = step(st, batch, rng)
        _ = float(m["loss"])
        out[f"train_step_ms[{mode}]"] = round(
            (time.perf_counter() - t0) / iters * 1e3, 1)
    bilinear_pallas.USE_PALLAS_BACKWARD = None
    out["batch"] = B
    return out


def measure_dysample_bwd(B: int = 32, iters: int = 10) -> dict:
    # NB: B=128 at 64->128 with the XLA scatter-add VJP OOMs HBM (20.78G
    # of 15.75G, measured 2026-08-20) — the scatter-add path materializes
    # the 4-tap scatter operands; B=32 matches the train batch anyway.
    """Isolated DySample-module backward at the three decoder shapes."""
    from kmunet_tpu.kernels import bilinear_pallas
    from kmunet_tpu.nn.resample import DySample
    from kmunet_tpu.utils.profiler import chained_time_ms

    out = {"batch": B}
    key = jax.random.PRNGKey(1)
    for hw in (16, 32, 64):
        mod = DySample(scale=2, style="lp", groups=4)
        x = jax.random.uniform(key, (B, hw, hw, 64), jnp.bfloat16)
        v = bf16_tree(jax.jit(
            lambda: mod.init(jax.random.PRNGKey(0), x))())

        def loss(vv, a):
            return jnp.sum(mod.apply(vv, a).astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=0)
        for mode, flag in (("pallas_bwd", None), ("xla_bwd", False)):
            bilinear_pallas.USE_PALLAS_BACKWARD = flag
            out[f"dysample{hw}to{2*hw}_grad_ms[{mode}]"] = round(
                chained_time_ms(lambda vv, a: g(vv, a), v, x, iters=iters), 1)
    bilinear_pallas.USE_PALLAS_BACKWARD = None
    return out


def main():
    args = sys.argv[1:]
    skip_dysample = "--skip-dysample" in args
    batches = [int(a) for a in args if not a.startswith("--")] or [16, 32]
    if not skip_dysample:
        print(json.dumps({"dysample_bwd": measure_dysample_bwd()}), flush=True)
    for B in batches:
        print(json.dumps(measure_full(B)), flush=True)


if __name__ == "__main__":
    main()
