#!/usr/bin/env python
"""Round-5 root-cause experiment for the late-horizon collapse (VERDICT r4 #2).

Finding so far: in the round-4 quality-table checkpoint the output head's
GroupNorm(1) affine (KM_UNetV3_SH.py:449-450 -> models/km_unet.py output_norm)
collapsed for exactly the last 6 of 20 forecast channels: scale ~0.18-0.24 /
bias ~-0.84 vs ~1.9-2.1 / ~-0.74 for channels 1-14 — so frames 15-20 emit a
near-constant sigmoid(0.2*z - 0.84) ~ 0.3 field (the observed POD=1/FAR=0.84
low-intensity blanket), while the head conv itself is healthy (per-channel
|w| 0.54-0.64 across all 20).

This script settles "escapable optimization accident vs loss/architecture
attractor" with two measurements on the trapped checkpoint:

  1. Gradient probe: per-channel d(loss)/d(output_norm.scale) averaged over
     train batches AT the trapped state. Near-zero on channels 15-20 => a
     genuine local optimum; consistently negative (pushing gamma back up)
     => mere slow recovery.
  2. Reinit-resume: reset gamma/beta of the collapsed channels to the
     healthy-channel mean, resume training (fresh AdamW, constant LR) on
     the byte-identical corpus, and track the per-channel gamma trajectory
     every epoch. Re-collapse => attractor; recovery => accident, and the
     final per-horizon eval gives the repaired scoreboard.

Usage: python scripts/exp_gamma_reinit.py [epochs] [lr]
Writes outputs/round5_horizon/gamma_reinit/{trajectory.json,results.json}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kmunet_tpu.configs import shanghai_km_unet
from kmunet_tpu.train.checkpoint import CheckpointManager
from kmunet_tpu.train.engine import (
    DataLoader,
    build_datasets,
    build_loss,
    build_model,
    build_optimizer,
    evaluate_model,
    init_state,
    make_epoch_runner,
    make_eval_step,
    make_loss_of,
    make_val_epoch,
)

CKPT = "outputs/quality_table/km_unet_v3/ckpt"
OUT = "outputs/round5_horizon/gamma_reinit"
N_HEALTHY = 14  # channels 0..13 healthy, 14..19 collapsed


def quality_cfg():
    cfg = shanghai_km_unet()
    cfg.data.name = "synthetic"  # quality-table corpus (run_quality_table.sh)
    cfg.data.img_size = 128
    cfg.data.batch_size = 32
    cfg.data.synthetic_length = 512
    cfg.train.compute_dtype = "bfloat16"
    cfg.train.ckpt_dir = ""
    cfg.train.out_dir = OUT
    cfg.train.vis_batches = 0
    return cfg


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 2e-4
    os.makedirs(OUT, exist_ok=True)
    cfg = quality_cfg()
    model = build_model(cfg)
    loss_fn = build_loss(cfg)

    # restore the trapped state (template built with the run's own optimizer
    # so the opt_state treedef matches the checkpoint)
    tx_orig = build_optimizer(cfg, steps_per_epoch=16)
    template = jax.eval_shape(
        lambda: init_state(cfg, model, tx_orig, jax.random.PRNGKey(cfg.train.seed)))
    ckpt = CheckpointManager(CKPT)
    step, state = ckpt.restore_best(template)
    ckpt.close()
    print(f"restored step {step}", flush=True)
    gamma = np.asarray(state.params["output_norm"]["scale"])
    print("gamma(trapped):", np.round(gamma, 3).tolist(), flush=True)

    train_ds, val_ds, test_ds = build_datasets(cfg)
    train_data = jnp.asarray(np.stack([train_ds[i] for i in range(len(train_ds))]))
    val_data = jnp.asarray(np.stack([val_ds[i] for i in range(len(val_ds))]))

    # --- 1. gradient probe at the trapped state -------------------------
    loss_of = make_loss_of(model, loss_fn, cfg)

    @jax.jit
    def gamma_grad(params, batch_stats, batch, rng):
        g = jax.grad(lambda p: loss_of(p, batch_stats, batch, rng)[0])(params)
        return g["output_norm"]["scale"], g["output_norm"]["bias"]

    B = cfg.data.batch_size
    gs, gb = [], []
    for i in range(4):
        batch = train_data[i * B:(i + 1) * B]
        s, b = gamma_grad(state.params, state.batch_stats, batch,
                          jax.random.PRNGKey(100 + i))
        gs.append(np.asarray(s)); gb.append(np.asarray(b))
    gs, gb = np.mean(gs, 0), np.mean(gb, 0)
    print("d(loss)/d(gamma):", np.round(gs, 5).tolist(), flush=True)
    print("d(loss)/d(beta): ", np.round(gb, 5).tolist(), flush=True)
    probe = {
        "gamma_trapped": gamma.tolist(),
        "dloss_dgamma": gs.tolist(),
        "dloss_dbeta": gb.tolist(),
        "grad_ratio_collapsed_vs_healthy":
            float(np.abs(gs[N_HEALTHY:]).mean() / np.abs(gs[:N_HEALTHY]).mean()),
    }
    if epochs == 0:  # probe-only mode (CPU smoke / quick look)
        with open(f"{OUT}/trajectory.json", "w") as f:
            json.dump({"probe": probe, "lr": lr, "epochs": []}, f, indent=1)
        print("probe-only: done", flush=True)
        return

    # --- 2. reinit-resume -----------------------------------------------
    params = jax.tree.map(lambda x: x, state.params)  # shallow copy tree
    on = dict(params["output_norm"])
    scale = np.asarray(on["scale"]).copy()
    bias = np.asarray(on["bias"]).copy()
    scale[N_HEALTHY:] = scale[:N_HEALTHY].mean()
    bias[N_HEALTHY:] = bias[:N_HEALTHY].mean()
    on["scale"] = jnp.asarray(scale)
    on["bias"] = jnp.asarray(bias)
    params = {**params, "output_norm": on}

    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, weight_decay=cfg.train.weight_decay)
    new_state = init_state(cfg, model, tx, jax.random.PRNGKey(0)).replace(
        params=params, batch_stats=state.batch_stats)

    n_tr = len(train_ds) // B
    n_va = len(val_ds) // B
    run_epoch = make_epoch_runner(model, loss_fn, tx, cfg, n_tr)
    run_val = make_val_epoch(model, loss_fn, cfg, n_va)

    rng = jax.random.PRNGKey(7)
    traj = {"probe": probe, "lr": lr, "epochs": []}
    for ep in range(epochs):
        rng, erng = jax.random.split(rng)
        new_state, tr_loss = run_epoch(new_state, train_data, erng)
        va_loss = run_val(new_state, val_data)
        g = np.asarray(new_state.params["output_norm"]["scale"])
        row = {
            "epoch": ep,
            "train_loss": float(tr_loss),
            "val_loss": float(va_loss),
            "gamma_healthy_mean": float(g[:N_HEALTHY].mean()),
            "gamma_reinit": np.round(g[N_HEALTHY:], 4).tolist(),
        }
        traj["epochs"].append(row)
        print(json.dumps(row), flush=True)
        with open(f"{OUT}/trajectory.json", "w") as f:
            json.dump(traj, f, indent=1)

    # --- final per-horizon eval ------------------------------------------
    data_loader = DataLoader(test_ds, B, shuffle=False, seed=cfg.train.seed,
                             num_workers=0)
    eval_step = make_eval_step(model, loss_fn, cfg)
    results = evaluate_model(cfg, new_state, eval_step, data_loader)
    with open(f"{OUT}/results.json", "w") as f:
        json.dump(results, f, indent=1)
    ph = results.get("per_horizon", {})
    if ph:
        key = 30 if 30 in ph.get("thresholds", {}) else "30"
        print("CSI@30 per frame:",
              [round(v, 2) for v in ph["thresholds"][key]["CSI"]], flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
