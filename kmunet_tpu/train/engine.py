"""Training/eval engine — one parameterized engine replacing the reference's
16 cloned train scripts (SURVEY.md §2.3 D7/D8).

The train step is a single jitted function over a sharded global batch;
GSPMD inserts the gradient psums for data parallelism and any halo
exchanges for spatial sharding. BatchNorm statistics are computed over the
*global* batch automatically (jit has global semantics over sharded arrays) —
i.e. sync-BN for free, where the reference is single-device BN.

Runnable:
    python -m kmunet_tpu.train.engine --config=synthetic --max_steps=2
    python -m kmunet_tpu.train.engine --config=shanghai --data.path=... \
        --train.epochs=120
"""

from __future__ import annotations

import csv
import functools
import math
import os
import sys
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from kmunet_tpu.configs import ExperimentConfig, laps_km_unet, parse_overrides, shanghai_km_unet
from kmunet_tpu.data import DataLoader, LAPSDataset, ShanghaiDataset, SyntheticNowcastDataset, split_indices
from kmunet_tpu.losses import hybrid_loss, rain_loss, rainfall_loss, weighted_mse_mae
from kmunet_tpu.metrics import Evaluator
from kmunet_tpu.parallel import MeshSpec, batch_sharding, make_mesh, param_sharding_rules, replicated, shard_params
from kmunet_tpu.train.schedule import cosine_annealing_per_epoch


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


# --------------------------------------------------------------------------
# builders
# --------------------------------------------------------------------------

def build_model(cfg: ExperimentConfig):
    from kmunet_tpu.models import zoo

    return zoo.build(cfg.model)


def build_loss(cfg: ExperimentConfig) -> Callable:
    name = cfg.train.loss
    if name == "hybrid":
        return functools.partial(hybrid_loss, alpha=cfg.train.loss_alpha)
    if name == "rainfall":
        return rainfall_loss
    if name == "rain":
        return rain_loss
    if name == "weighted_mse_mae":
        wf = functools.partial(
            weighted_mse_mae, lam=None, thresholds=tuple(cfg.data.thresholds)
        )
        # The loss keeps the reference's 5-D (B, S, C, H, W) contract; the
        # engine's (B, T, H, W) prediction gets the same singleton channel
        # axis the reference datasets carry (Shanghai items are (25,1,S,S);
        # the NC scripts data.unsqueeze(2), train_NC_trajgru.py:39).
        return lambda p, t: wf(p[:, :, None], t[:, :, None]) if p.ndim == 4 else wf(p, t)
    if name == "mse":
        return lambda p, t: jnp.mean((p - t) ** 2)
    raise ValueError(f"unknown loss {name}")


def build_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    t = cfg.train
    if t.schedule == "cosine_epoch":
        sched = cosine_annealing_per_epoch(t.lr, t.eta_min, t.cosine_t_max, steps_per_epoch)
    elif t.schedule in ("constant", "plateau"):
        # plateau: constant base lr; the engine consults a host-side
        # PlateauScheduler between epochs and writes its scale into the
        # trailing inject_hyperparams(optax.scale) stage (ReduceLROnPlateau,
        # models/utils.py:184-189 — defined by the reference's factory,
        # unused by its scripts).
        sched = t.lr
    else:
        from kmunet_tpu.train.optimizers import make_schedule

        sched = make_schedule(t.schedule, t.lr, steps_per_epoch,
                              eta_min=t.eta_min, t_max=t.cosine_t_max,
                              milestones=tuple(t.milestones), gamma=t.gamma,
                              epochs=t.epochs)
    from kmunet_tpu.train.optimizers import make_optimizer

    stages = []
    if t.grad_clip:
        stages.append(optax.clip_by_global_norm(t.grad_clip))
    wd = t.weight_decay
    if wd and t.wd_mask_norms:
        # Apply decay only to params with ndim >= 2 (conv/dense kernels),
        # skipping norm scales/biases and conv biases: standard AdamW
        # practice, and the fix for the late-horizon output_norm gamma
        # collapse (BASELINE.md round 5). adamw keeps decoupled decay via
        # its own mask=; the other factory variants already treat wd as a
        # coupled add_decayed_weights stage, so masking that stage is the
        # same semantics they had.
        mask = lambda params: jax.tree.map(lambda p: p.ndim >= 2, params)  # noqa: E731
        if t.optimizer == "adamw":
            opt = optax.adamw(sched, weight_decay=wd, mask=mask)
        else:
            opt = optax.chain(
                optax.masked(optax.add_decayed_weights(wd), mask),
                make_optimizer(t.optimizer, sched, weight_decay=0.0,
                               momentum=t.momentum),
            )
    else:
        opt = make_optimizer(t.optimizer, sched, weight_decay=wd,
                             momentum=t.momentum)
    stages.append(opt)
    if t.schedule == "plateau":
        stages.append(optax.inject_hyperparams(optax.scale)(step_size=1.0))
    return stages[0] if len(stages) == 1 else optax.chain(*stages)


def init_state(cfg: ExperimentConfig, model, tx, rng) -> TrainState:
    d = cfg.data
    if _model_layout(cfg) == "seq":
        dummy = jnp.zeros((1, d.in_frames, d.img_size, d.img_size), jnp.float32)
    else:
        dummy = jnp.zeros((1, d.img_size, d.img_size, d.in_frames), jnp.float32)
    variables = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 1)}, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


# --------------------------------------------------------------------------
# steps
# --------------------------------------------------------------------------

def _split_batch(batch, in_frames: int, out_frames: int, layout: str = "stack"):
    """(B, seq, H, W) -> model input + (B, T, H, W) target.

    layout 'stack': frames as NHWC channels (KM-UNet & conv UNets);
    layout 'seq':   (B, S, H, W) sequence (ConvLSTM/TrajGRU EF models).
    """
    tgt = batch[:, in_frames : in_frames + out_frames]
    if layout == "seq":
        return batch[:, :in_frames], tgt
    return jnp.transpose(batch[:, :in_frames], (0, 2, 3, 1)), tgt


def _model_layout(cfg: ExperimentConfig) -> str:
    from kmunet_tpu.models.zoo import SEQUENCE_MODELS

    return "seq" if cfg.model.name in SEQUENCE_MODELS else "stack"


def _to_btHW(out, layout: str):
    """Model output -> (B, T, H, W). 'stack' models return NHWC with T as
    channels; 'seq' models already return (B, T, H, W)."""
    if layout == "stack":
        return jnp.transpose(out, (0, 3, 1, 2))
    return out


def make_loss_of(model, loss_fn, cfg: ExperimentConfig):
    """The loss computation of the train step, exposed on its own so the
    bench's phase decomposition (fwd / fwd+bwd / full step) measures exactly
    the closure the real step differentiates (VERDICT r4 #8)."""
    in_f, out_f = cfg.data.in_frames, cfg.data.out_frames
    layout = _model_layout(cfg)
    cdtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32

    def loss_of(params, batch_stats, batch, rng):
        inp, tgt = _split_batch(batch, in_f, out_f, layout)
        # AMP analogue (train_shanghai.py:172 autocast): cast params and
        # inputs to the compute dtype inside the graph; master params and
        # the gradients that flow back through the cast stay fp32.
        if cdtype != jnp.float32:
            params_c = jax.tree.map(
                lambda p: p.astype(cdtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
        else:
            params_c = params
        variables = {"params": params_c, "batch_stats": batch_stats}

        def fwd(variables, inp_c):
            return model.apply(
                variables, inp_c, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )

        if cfg.train.remat:
            # trade FLOPs for HBM: recompute activations in the backward
            # pass (jax.checkpoint); lets e.g. B64@128^2 train in 16G
            fwd = jax.checkpoint(fwd)
        out, mutated = fwd(variables, inp.astype(cdtype))
        pred = _to_btHW(out.astype(jnp.float32), layout)
        new_stats = jax.tree.map(
            lambda s: s.astype(jnp.float32), mutated["batch_stats"]
        )
        loss = loss_fn(pred, tgt)
        if cfg.train.kan_reg_weight:
            from kmunet_tpu.nn.kan import kan_regularization_loss

            loss = loss + cfg.train.kan_reg_weight * kan_regularization_loss(params)
        return loss, new_stats

    return loss_of


def _make_train_body(model, loss_fn, tx, cfg: ExperimentConfig):
    """The pure (un-jitted) train step: shared by the per-step jit
    (make_train_step) and the device-cached epoch scan (make_epoch_runner)."""
    loss_of = make_loss_of(model, loss_fn, cfg)

    def train_step(state: TrainState, batch, rng):
        (loss, new_stats), grads = jax.value_and_grad(
            lambda p: loss_of(p, state.batch_stats, batch, rng), has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def make_train_step(model, loss_fn, tx, cfg: ExperimentConfig):
    body = _make_train_body(model, loss_fn, tx, cfg)
    return jax.jit(body, donate_argnums=(0,))


def make_epoch_runner(model, loss_fn, tx, cfg: ExperimentConfig,
                      n_batches: int, batch_sh=None):
    """ONE jitted call = one full training epoch over a device-resident
    corpus ``data`` of shape (N, seq, H, W).

    Motivation: each ``train_step`` dispatch costs a host->device round trip
    (the remote-TPU tunnel adds ~25 ms latency *per dispatch*, and batch
    bytes ride the same link every step). With the corpus in HBM the epoch
    is a ``lax.scan`` over on-device-shuffled batch indices: one dispatch,
    zero per-step transfers. Shuffling uses jax PRNG folds instead of the
    host loader's numpy permutation — same distribution, different stream
    (documented semantic delta vs the loader path).
    """
    body = _make_train_body(model, loss_fn, tx, cfg)
    B = cfg.data.batch_size

    @functools.partial(jax.jit, donate_argnums=(0,))
    def _run_epoch(state: TrainState, data, rng):
        perm = jax.random.permutation(jax.random.fold_in(rng, 0), data.shape[0])
        idx = perm[: n_batches * B].reshape(n_batches, B)

        def scan_body(carry, ib):
            state, rng = carry
            batch = jnp.take(data, ib, axis=0)
            if batch_sh is not None:
                batch = jax.lax.with_sharding_constraint(batch, batch_sh)
            rng, step_rng = jax.random.split(rng)
            state, m = body(state, batch, step_rng)
            return (state, rng), m["loss"]

        (state, _), losses = jax.lax.scan(scan_body, (state, rng), idx)
        return state, jnp.mean(losses)

    def run_epoch(state: TrainState, data, rng):
        # init_state stores batch_stats as a FrozenDict; the train body emits
        # the plain-dict form flax.apply(mutable=...) returns. Normalize
        # OUTSIDE the jit boundary: a FrozenDict carry-in would give epoch 1
        # a different input treedef than its own plain-dict output, forcing
        # a full recompile of the epoch-sized scan on epoch 2.
        if isinstance(state.batch_stats, FrozenDict):
            from flax.core import unfreeze

            state = state.replace(batch_stats=unfreeze(state.batch_stats))
        return _run_epoch(state, data, rng)

    return run_epoch


def make_val_epoch(model, loss_fn, cfg: ExperimentConfig, n_batches: int,
                   batch_sh=None):
    """One jitted call = mean val loss over a device-resident corpus."""
    in_f, out_f = cfg.data.in_frames, cfg.data.out_frames
    layout = _model_layout(cfg)
    B = cfg.data.batch_size

    @jax.jit
    def run_val(state: TrainState, data):
        idx = jnp.arange(n_batches * B).reshape(n_batches, B)

        def scan_body(_, ib):
            batch = jnp.take(data, ib, axis=0)
            if batch_sh is not None:
                batch = jax.lax.with_sharding_constraint(batch, batch_sh)
            inp, tgt = _split_batch(batch, in_f, out_f, layout)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            out = model.apply(variables, inp, train=False)
            pred = _to_btHW(out.astype(jnp.float32), layout)
            return None, loss_fn(pred, tgt)

        _, losses = jax.lax.scan(scan_body, None, idx)
        return jnp.mean(losses)

    return run_val


def make_eval_step(model, loss_fn, cfg: ExperimentConfig):
    in_f, out_f = cfg.data.in_frames, cfg.data.out_frames
    layout = _model_layout(cfg)

    @jax.jit
    def eval_step(state: TrainState, batch):
        inp, tgt = _split_batch(batch, in_f, out_f, layout)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, inp, train=False)
        pred = _to_btHW(out.astype(jnp.float32), layout)
        return loss_fn(pred, tgt), pred, tgt

    return eval_step


# --------------------------------------------------------------------------
# data
# --------------------------------------------------------------------------

def build_datasets(cfg: ExperimentConfig):
    d = cfg.data
    if d.name == "synthetic":
        mk = lambda n, seed: SyntheticNowcastDataset(  # noqa: E731
            length=n, img_size=d.img_size, seq_len=d.seq_len, seed=seed
        )
        n = d.synthetic_length
        n_eval = max(n // 4, d.batch_size)
        return mk(n, 0), mk(n_eval, 1), mk(n_eval, 2)
    if d.name == "shanghai":
        base = ShanghaiDataset(d.path, d.img_size, "train")
        tr_i, va_i, te_i = split_indices(base.all_len)
        mk = lambda idx: ShanghaiDataset(d.path, d.img_size, "train", indices=idx)  # noqa: E731
        return mk(tr_i), mk(va_i), mk(te_i)
    if d.name == "laps":
        return (
            LAPSDataset(d.path, d.seq_len, "train"),
            LAPSDataset(d.path, d.seq_len, "val"),
            LAPSDataset(d.path, d.seq_len, "test"),
        )
    raise ValueError(f"unknown dataset {d.name}")


# --------------------------------------------------------------------------
# loop
# --------------------------------------------------------------------------

def _write_results_json(path: str, results: dict, cfg: ExperimentConfig) -> None:
    """results.json: test metrics + run identity, JSON-safe (numpy scalars ->
    python, int threshold keys -> strings)."""
    import json

    def safe(x):
        if isinstance(x, dict):
            return {str(k): safe(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [safe(v) for v in x]
        if isinstance(x, (np.floating, np.integer)):
            return safe(x.item())  # re-enter: numpy NaN needs the guard below
        if isinstance(x, float) and not math.isfinite(x):
            return str(x)  # JSON has no NaN/Inf
        return x

    payload = {
        "model": cfg.model.name,
        "dataset": cfg.data.name,
        "img_size": cfg.data.img_size,
        "batch_size": cfg.data.batch_size,
        "loss": cfg.train.loss,
        "optimizer": cfg.train.optimizer,
        "lr": cfg.train.lr,
        "compute_dtype": cfg.train.compute_dtype,
        **{k: safe(v) for k, v in results.items() if k != "history"},
        "final_train_loss": safe(results["history"]["train_loss"][-1])
        if results.get("history", {}).get("train_loss") else None,
        "final_val_loss": safe(results["history"]["val_loss"][-1])
        if results.get("history", {}).get("val_loss") else None,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def train_and_evaluate(
    cfg: ExperimentConfig,
    max_steps: Optional[int] = None,
    log_csv: Optional[str] = None,
) -> dict:
    mesh = make_mesh(MeshSpec(cfg.mesh.data, cfg.mesh.spatial, cfg.mesh.model))
    data_sh = batch_sharding(mesh, ndim=4)

    # NB: the Pallas bilinear kernel composes with spatial sharding via
    # custom_partitioning (kernels/bilinear_pallas.py::_partitioned_forward);
    # no escape hatch is needed when cfg.mesh.spatial > 1.

    train_ds, val_ds, test_ds = build_datasets(cfg)
    loader = lambda ds, shuffle: DataLoader(  # noqa: E731
        ds, cfg.data.batch_size, shuffle=shuffle, seed=cfg.train.seed,
        num_workers=cfg.data.num_workers, sharding=data_sh,
    )
    train_loader = loader(train_ds, True)
    val_loader = loader(val_ds, False)
    test_loader = loader(test_ds, False)
    for name, ld in [("train", train_loader), ("val", val_loader), ("test", test_loader)]:
        if len(ld) == 0:
            raise ValueError(
                f"{name} loader yields 0 batches "
                f"(dataset len {len(ld.dataset)} < global batch {cfg.data.batch_size}?)"
            )
    steps_per_epoch = max(len(train_loader), 1)

    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    tx = build_optimizer(cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(cfg.train.seed)
    state = init_state(cfg, model, tx, rng)
    state = jax.device_put(state, replicated(mesh))
    if cfg.mesh.fsdp:
        rules = param_sharding_rules(mesh, state.params, fsdp=True)
        state = state.replace(params=shard_params(state.params, rules))

    train_step = make_train_step(model, loss_fn, tx, cfg)
    eval_step = make_eval_step(model, loss_fn, cfg)

    # Device-cached epochs: corpus in HBM, one dispatch per epoch (see
    # make_epoch_runner). Falls back to the loader path under multi-process
    # JAX (the cache is a single global array) or when max_steps slices
    # epochs.
    use_device_cache = (
        cfg.data.device_cache and max_steps is None and jax.process_count() == 1
    )
    if use_device_cache:
        rep = replicated(mesh)
        train_data = jax.device_put(
            np.stack([train_ds[i] for i in range(len(train_ds))]), rep)
        val_data = jax.device_put(
            np.stack([val_ds[i] for i in range(len(val_ds))]), rep)
        # the loader-emptiness check above guarantees every split holds at
        # least one full batch, so no clamping: a clamp of 0 -> 1 would make
        # make_val_epoch index past the corpus (jnp.take clamps indices
        # inside jit, silently evaluating the last sample B times).
        n_tr_batches = len(train_ds) // cfg.data.batch_size
        n_va_batches = len(val_ds) // cfg.data.batch_size
        run_epoch = make_epoch_runner(
            model, loss_fn, tx, cfg, n_tr_batches, batch_sh=data_sh)
        run_val = make_val_epoch(
            model, loss_fn, cfg, n_va_batches, batch_sh=data_sh)

    ckpt = None
    if cfg.train.ckpt_dir:
        from kmunet_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(cfg.train.ckpt_dir)
        if cfg.train.resume:
            abstract = jax.eval_shape(lambda: state)
            step_restored, restored = ckpt.restore_latest(abstract)
            if restored is not None:
                state = jax.device_put(restored, replicated(mesh))
                print(f"resumed from checkpoint step {step_restored}")

    plateau = None
    if cfg.train.schedule == "plateau":
        from kmunet_tpu.train.optimizers import PlateauScheduler

        plateau = PlateauScheduler(factor=cfg.train.plateau_factor,
                                   patience=cfg.train.plateau_patience)
        # On resume, carry over the decayed LR scale from the restored opt
        # state — a fresh controller would silently reset it to 1.0 at the
        # end of the first resumed epoch. (best/patience are host state the
        # checkpoint doesn't hold; they re-warm within one patience window.)
        plateau.scale = float(state.opt_state[-1].hyperparams["step_size"])

    csv_rows = []
    best_val = float("inf")
    bad_epochs = 0
    global_step = int(state.step)
    t_start = time.time()
    history = {"train_loss": [], "val_loss": []}

    for epoch in range(cfg.train.epochs):
        if use_device_cache:
            # ---- train + validate: one dispatch each ----
            rng, ep_rng = jax.random.split(rng)
            state, tr_loss = run_epoch(state, train_data, ep_rng)
            val_loss = float(run_val(state, val_data))
            train_loss = float(tr_loss)
            global_step += n_tr_batches
        else:
            # ---- train ----
            # Losses stay on device until epoch end: a per-step float()
            # readback costs a ~25 ms host RTT *and* serializes the dispatch
            # pipeline.
            ep_losses = []
            for batch in train_loader:
                rng, step_rng = jax.random.split(rng)
                state, m = train_step(state, batch, step_rng)
                ep_losses.append(m["loss"])
                global_step += 1
                if max_steps and global_step >= max_steps:
                    break
            train_loss = float(jnp.mean(jnp.stack(ep_losses))) if ep_losses else 0.0

            # ---- validate ----
            v_losses = []
            for batch in val_loader:
                l, _, _ = eval_step(state, batch)
                v_losses.append(l)
            val_loss = float(jnp.mean(jnp.stack(v_losses))) if v_losses else 0.0

        if plateau is not None and math.isfinite(val_loss):
            # ReduceLROnPlateau semantics: consult the host-side controller
            # and write its scale into the trailing inject_hyperparams stage
            # (same treedef/shape, so no retrace of the jitted step).
            scale = plateau.update(val_loss)
            inj = state.opt_state[-1]
            state = state.replace(opt_state=state.opt_state[:-1] + (
                inj._replace(hyperparams={"step_size": jnp.asarray(scale, jnp.float32)}),
            ))

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        csv_rows.append({"epoch": epoch, "train_loss": train_loss, "val_loss": val_loss,
                         "time": time.time() - t_start})
        print(f"epoch {epoch}: train={train_loss:.5f} val={val_loss:.5f} "
              f"({global_step} steps, {time.time()-t_start:.0f}s)")

        if cfg.train.nan_abort and not (
            math.isfinite(train_loss) and math.isfinite(val_loss)
        ):
            # Params are dead — further epochs burn chip hours producing NaN,
            # and `NaN < best_val` is False so no checkpoint would ever save.
            print(
                f"ABORT: non-finite loss at epoch {epoch} "
                f"(train={train_loss}, val={val_loss}); stopping. "
                "Consider --train.grad_clip or a lower lr."
            )
            break

        if val_loss < best_val:
            best_val = val_loss
            bad_epochs = 0
            if ckpt is not None:
                ckpt.save(global_step, jax.device_get(state), val_loss)
        else:
            bad_epochs += 1
            if cfg.train.early_stop_patience and bad_epochs >= cfg.train.early_stop_patience:
                print(f"early stop at epoch {epoch} (patience {cfg.train.early_stop_patience})")
                break

        if max_steps and global_step >= max_steps:
            break

    results = evaluate_model(cfg, state, eval_step, test_loader)
    results["history"] = history
    results["steps"] = global_step
    if cfg.train.out_dir:
        # Structured artifact next to the vis PNGs / scatter CSV, so batch
        # runs (e.g. the quality table) are machine-parseable — the reference
        # only prints its test metrics (train_shanghai.py:273-283).
        _write_results_json(os.path.join(cfg.train.out_dir, "results.json"),
                            results, cfg)

    if log_csv and csv_rows:
        if os.path.dirname(log_csv):
            os.makedirs(os.path.dirname(log_csv), exist_ok=True)
        with open(log_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(csv_rows[0]))
            w.writeheader()
            w.writerows(csv_rows)
    if ckpt is not None:
        ckpt.wait()
        ckpt.close()
    return results


def evaluate_model(cfg: ExperimentConfig, state, eval_step, test_loader) -> dict:
    """The reference's test() (train_shanghai.py:218-283): streaming
    CSI/POD/HSS/FAR/RMSE/SSIM evaluator + optional scatter-eval path +
    prediction/gt/input PNG strips. Standalone so a trained checkpoint can
    be evaluated without re-training (the reference reloads the best
    checkpoint before test, train_shanghai.py:437-441) — see
    ``evaluate_checkpoint`` and ``scripts/evaluate.py``."""
    from kmunet_tpu.metrics.lpips import make_lpips_fn

    evaluator = Evaluator(
        seq_len=cfg.data.out_frames,
        value_scale=cfg.data.value_scale,
        thresholds=tuple(cfg.data.thresholds),
        lpips_fn=make_lpips_fn(cfg.data.lpips_weights),
    )
    out_dir = cfg.train.out_dir
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    vis_dir = os.path.join(out_dir, "vis") if out_dir else None
    scatter_gts: list = []
    scatter_preds: list = []
    t_loss, n_t = 0.0, 0
    for bi, batch in enumerate(test_loader):
        l, pred, tgt = eval_step(state, batch)
        evaluator.evaluate(tgt, pred)
        t_loss += float(l)
        n_t += 1
        if cfg.train.scatter_eval:
            # LAPS/NC second metrics path flattens ALL preds/gts
            # (train_LAPS.py:274-331); accumulate on host, clipped like the
            # reference's .clip(0, 1) readback.
            scatter_preds.append(np.asarray(pred, np.float32).clip(0, 1))
            scatter_gts.append(np.asarray(tgt, np.float32).clip(0, 1))
        if vis_dir and bi < cfg.train.vis_batches:
            # Reference dumps prediction/gt/input strips for every sample of
            # the first 10 test batches (train_shanghai.py:258-268).
            from kmunet_tpu.utils.vis import vis_res

            pred_np = np.asarray(pred, np.float32).clip(0, 1)
            tgt_np = np.asarray(tgt, np.float32).clip(0, 1)
            inp_np = np.asarray(batch[:, : cfg.data.in_frames], np.float32).clip(0, 1)
            for si in range(pred_np.shape[0]):
                vis_res(
                    pred_np[si], tgt_np[si], inp_np[si],
                    os.path.join(vis_dir, f"batch_{bi}_sample_{si}"),
                )
    results = evaluator.done() if n_t else {}
    if n_t:
        # Per-forecast-frame breakdown (round-5 late-horizon diagnostics).
        results["per_horizon"] = evaluator.per_horizon()
    if cfg.train.scatter_eval and scatter_gts:
        from kmunet_tpu.metrics.scatter_eval import scatter_evaluate

        results["scatter"] = scatter_evaluate(
            np.concatenate(scatter_gts),
            np.concatenate(scatter_preds),
            thresholds=tuple(cfg.data.thresholds),
            csv_path=os.path.join(out_dir, "scatter_metrics.csv") if out_dir else None,
        )
    results["test_loss"] = t_loss / max(n_t, 1)
    return results


def evaluate_checkpoint(cfg: ExperimentConfig, ckpt_dir: str,
                        which: str = "best") -> dict:
    """Restore a checkpoint and run ONLY the test pass.

    Mirrors the reference's standalone evaluation flow: load the saved best
    model, then test() with the streaming evaluator and visualization
    (train_shanghai.py:437-441,218-283). ``which``: 'best' (by val loss, the
    reference's semantics) or 'latest'.
    """
    from kmunet_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh(MeshSpec(cfg.mesh.data, cfg.mesh.spatial, cfg.mesh.model))
    data_sh = batch_sharding(mesh, ndim=4)
    _, _, test_ds = build_datasets(cfg)
    test_loader = DataLoader(
        test_ds, cfg.data.batch_size, shuffle=False, seed=cfg.train.seed,
        num_workers=cfg.data.num_workers, sharding=data_sh,
    )
    if len(test_loader) == 0:
        raise ValueError(
            f"test loader yields 0 batches (dataset len {len(test_ds)} < "
            f"global batch {cfg.data.batch_size}?) — metrics would be empty"
        )
    if which not in ("best", "latest"):
        raise ValueError(f"which={which!r}: expected 'best' or 'latest'")
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=1)
    template = jax.eval_shape(
        lambda: init_state(cfg, model, tx, jax.random.PRNGKey(cfg.train.seed))
    )
    ckpt = CheckpointManager(ckpt_dir)
    step, state = (ckpt.restore_best(template) if which == "best"
                   else ckpt.restore_latest(template))
    ckpt.close()
    if state is None:
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    state = jax.device_put(state, replicated(mesh))
    eval_step = make_eval_step(model, loss_fn, cfg)
    results = evaluate_model(cfg, state, eval_step, test_loader)
    results["checkpoint_step"] = int(step)
    if cfg.train.out_dir:
        _write_results_json(os.path.join(cfg.train.out_dir, "results.json"),
                            results, cfg)
    return results


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_name = "synthetic"
    max_steps = None
    rest = []
    for a in argv:
        if a.startswith("--config="):
            config_name = a.split("=", 1)[1]
        elif a.startswith("--max_steps="):
            max_steps = int(a.split("=", 1)[1])
        else:
            rest.append(a)

    if config_name == "shanghai":
        cfg = shanghai_km_unet()
    elif config_name == "laps":
        cfg = laps_km_unet()
    else:
        cfg = shanghai_km_unet()
        cfg.data.name = "synthetic"
    parse_overrides(cfg, rest)
    results = train_and_evaluate(cfg, max_steps=max_steps)
    print({k: v for k, v in results.items() if k != "history"})


if __name__ == "__main__":
    main()
