#!/usr/bin/env python
"""Measure trained DySample offset magnitudes (window-path exactness domain).

The dense 3x3-window DySample formulation (ops/sample.py::
dysample_window_upsample) is exact while |subpixel init + learned offset|
< 1, i.e. learned offset < ~0.75 px for scale 2. This script loads the
round-4 trained flagship checkpoint and reports the actual max |0.25*raw|
per DySample instance over test batches, so the claim in resample.py's
docstring is a measurement, not an assumption.

Runs on CPU (forced) — safe to run alongside TPU jobs.
Usage: python scripts/measure_dysample_offsets.py [n_batches]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from kmunet_tpu.configs import shanghai_km_unet
from kmunet_tpu.train.checkpoint import CheckpointManager
from kmunet_tpu.train.engine import (
    build_datasets, build_loss, build_model, build_optimizer, init_state,
)

CKPT = "outputs/quality_table/km_unet_v3/ckpt"


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    B = 8
    cfg = shanghai_km_unet()
    cfg.data.name = "synthetic"
    cfg.data.img_size = 128
    cfg.data.batch_size = B
    cfg.data.synthetic_length = 512
    model = build_model(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=16)
    template = jax.eval_shape(
        lambda: init_state(cfg, model, tx, jax.random.PRNGKey(cfg.train.seed)))
    ckpt = CheckpointManager(CKPT)
    step, state = ckpt.restore_best(template)
    ckpt.close()
    print(f"restored step {step}", flush=True)

    _, _, test_ds = build_datasets(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def probe(batch):
        inp = batch[:, :5].transpose(0, 2, 3, 1)  # (B,H,W,5)
        _, inter = model.apply(
            variables, inp, train=False,
            capture_intermediates=lambda mdl, name: mdl.name == "offset",
        )
        return inter["intermediates"]

    maxima = {}
    for i in range(n_batches):
        batch = jnp.asarray(
            np.stack([test_ds[j] for j in range(i * B, (i + 1) * B)]))
        inter = probe(batch)

        def walk(d, pre=""):
            if isinstance(d, dict):
                for k, v in d.items():
                    walk(v, pre + "/" + k)
            else:
                for leaf in (d if isinstance(d, tuple) else (d,)):
                    off = 0.25 * np.abs(np.asarray(leaf))
                    maxima[pre] = max(maxima.get(pre, 0.0), float(off.max()))
        walk(inter)
    for k, v in sorted(maxima.items()):
        print(f"{k}: max |learned offset| = {v:.4f} px "
              f"(window-exactness bound 0.75)", flush=True)
    worst = max(maxima.values())
    print(f"WORST: {worst:.4f} px — window path "
          f"{'EXACT' if worst < 0.75 else 'SATURATING'} on this checkpoint",
          flush=True)


if __name__ == "__main__":
    main()
