#!/usr/bin/env python
"""Round-5 combined TPU probe: (a) forward fps at bench config for the
reformulated NHWC window path; (b) the B32 in-graph train scan with the
FULL error surfaced (the bench JSON truncates it).

Usage: python scripts/diag_r5_probe.py [fwd|b32|both]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe_fwd():
    from kmunet_tpu.models import KM_UNetV3_SH

    model = KM_UNetV3_SH(num_classes=20)
    B = 128
    v = jax.jit(model.init)(jax.random.PRNGKey(0),
                            jnp.zeros((2, 128, 128, 5), jnp.float32))
    v = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if jnp.issubdtype(a.dtype, jnp.floating) else a, v)
    fn = jax.jit(lambda v, xx: jnp.sum(model.apply(v, xx).astype(jnp.float32)))
    xb = jax.random.uniform(jax.random.PRNGKey(1), (B, 128, 128, 5),
                            jnp.bfloat16)
    t0 = time.perf_counter()
    _ = float(fn(v, xb))
    print(f"fwd compile+exec1 {time.perf_counter()-t0:.1f}s", flush=True)
    for k in range(5):
        t0 = time.perf_counter()
        _ = float(fn(v, xb))
        dt = time.perf_counter() - t0
        print(f"fwd iter{k}: {dt*1e3:.1f} ms fps={B*20/dt:.0f}", flush=True)


def probe_b32(iters=10):
    from flax.core import FrozenDict, unfreeze

    from kmunet_tpu.configs import shanghai_km_unet
    from kmunet_tpu.train.engine import (
        _make_train_body, build_loss, build_model, build_optimizer, init_state,
    )

    cfg = shanghai_km_unet()
    cfg.data.img_size = 128
    cfg.data.batch_size = 32
    cfg.data.out_frames = 20
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
    if isinstance(state.batch_stats, FrozenDict):
        state = state.replace(batch_stats=unfreeze(state.batch_stats))
    body = _make_train_body(model, loss_fn, tx, cfg)
    batch = jax.random.uniform(jax.random.PRNGKey(1),
                               (32, cfg.data.seq_len, 128, 128))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_steps(state, batch, rng):
        def sbody(carry, _):
            st, r = carry
            r, sr = jax.random.split(r)
            st, m = body(st, batch, sr)
            return (st, r), m["loss"]

        (state, _), losses = jax.lax.scan(sbody, (state, jax.random.PRNGKey(2)),
                                          None, length=iters)
        return state, jnp.mean(losses)

    t0 = time.perf_counter()
    state, ml = run_steps(state, batch, jax.random.PRNGKey(2))
    print(f"b32 compile+exec1 {time.perf_counter()-t0:.1f}s loss={float(ml):.4f}",
          flush=True)
    state, ml = run_steps(state, batch, jax.random.PRNGKey(2))
    _ = float(ml)
    t0 = time.perf_counter()
    state, ml = run_steps(state, batch, jax.random.PRNGKey(2))
    _ = float(ml)
    dt = (time.perf_counter() - t0) / iters
    print(f"b32 train_step_ms={dt*1e3:.1f} fps={32*20/dt:.1f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("fwd", "both"):
        probe_fwd()
    if which in ("b32", "both"):
        probe_b32()
