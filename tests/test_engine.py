"""End-to-end engine tests on the 8-device CPU mesh: data -> model -> loss ->
step -> eval -> metrics, plus checkpoint round-trip and LAPS config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmunet_tpu.configs import laps_km_unet, shanghai_km_unet, parse_overrides
from kmunet_tpu.train.engine import (
    build_loss,
    build_model,
    build_optimizer,
    init_state,
    make_train_step,
    train_and_evaluate,
)


def _tiny_cfg(**kw):
    cfg = shanghai_km_unet()
    cfg.data.name = "synthetic"
    cfg.data.img_size = 32
    cfg.data.batch_size = 8
    cfg.data.synthetic_length = 8
    cfg.data.seq_len = 9
    cfg.data.out_frames = 4
    cfg.model.num_classes = 4
    cfg.train.epochs = 1
    for k, v in kw.items():
        parts = k.split("__")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


@pytest.mark.heavy
def test_e2e_loss_decreases():
    """Loader-path E2E (heavy tier: ~4 min of train-step compiles on the
    1-core host). The default tier's E2E train/eval/metrics coverage is
    test_device_cache_epoch_runner below; the loader path itself stays
    default-covered by test_checkpoint_roundtrip / test_vis_and_scatter."""
    cfg = _tiny_cfg()
    cfg.train.epochs = 3
    cfg.data.synthetic_length = 16
    r = train_and_evaluate(cfg)
    h = r["history"]["train_loss"]
    assert h[-1] < h[0], h
    assert "threshold_metrics" in r and 20 in r["threshold_metrics"]


def test_epoch_runner_matches_per_step_loop():
    """make_epoch_runner (data.device_cache=true: corpus in HBM, one jitted
    lax.scan dispatch per epoch — built for the high-latency TPU tunnel) must
    be EXACTLY the per-step loader path: same permutation, same RNG splits,
    same train body => bit-identical params and losses. Uses a 2-conv stand-in
    model so the opt-level-0 CPU harness executes it in seconds (the full
    KM-UNet E2E variant lives in the heavy tier below)."""
    import flax.linen as fnn

    from kmunet_tpu.train.engine import (
        TrainState,
        make_epoch_runner,
        make_val_epoch,
    )

    class TinyNet(fnn.Module):
        out: int = 4

        @fnn.compact
        def __call__(self, x, train=True):
            x = fnn.Conv(8, (3, 3))(x)
            x = fnn.relu(x)
            return fnn.Conv(self.out, (3, 3))(x)

    cfg = _tiny_cfg()
    cfg.data.img_size = 16
    cfg.train.loss = "mse"
    cfg.train.compute_dtype = "float32"
    in_f, out_f = cfg.data.in_frames, cfg.data.out_frames
    model = TinyNet(out=out_f)

    import optax

    def loss_fn(pred, tgt):
        return jnp.mean((pred - tgt) ** 2)

    tx = optax.adamw(1e-3)
    N, B = 16, cfg.data.batch_size
    n_batches = N // B
    data = jnp.asarray(
        np.random.default_rng(0).random((N, in_f + out_f, 16, 16), np.float32))

    def fresh_state():  # per-path copies: both jits donate their state arg
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, in_f)))["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats={}, opt_state=tx.init(params))

    # --- device-cache path: one scan dispatch ---
    run_epoch = make_epoch_runner(model, loss_fn, tx, cfg, n_batches)
    rng = jax.random.PRNGKey(7)
    s_scan, loss_scan = run_epoch(fresh_state(), data, rng)

    # --- reference: per-step loop replicating the runner's RNG stream ---
    from kmunet_tpu.train.engine import make_train_step

    step = make_train_step(model, loss_fn, tx, cfg)
    perm = jax.random.permutation(jax.random.fold_in(rng, 0), N)
    idx = np.asarray(perm)[: n_batches * B].reshape(n_batches, B)
    s = fresh_state()
    r, losses = rng, []
    for ib in idx:
        r, step_rng = jax.random.split(r)
        s, m = step(s, jnp.take(data, jnp.asarray(ib), axis=0), step_rng)
        losses.append(m["loss"])

    assert np.allclose(float(loss_scan), float(np.mean(losses)), atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        s_scan.params, s.params)
    assert int(s_scan.step) == n_batches

    # --- val epoch: mean loss over the (unshuffled) corpus ---
    run_val = make_val_epoch(model, loss_fn, cfg, n_batches)
    vl = float(run_val(s_scan, data))
    assert np.isfinite(vl)


def test_device_cache_e2e(monkeypatch):
    """train_and_evaluate wiring for data.device_cache=true: corpus stacking +
    device_put, epoch/val runners, step accounting, metrics. Uses a 2-conv
    stand-in for KM-UNet (opt-level-0 CPU execution of the full model inside
    the epoch scan is >45 min on this host; KM-UNet itself is covered by the
    loader-path heavy test and the runner-parity test above)."""
    import flax.linen as fnn

    import kmunet_tpu.train.engine as engine

    class TinyNet(fnn.Module):
        out: int = 4

        @fnn.compact
        def __call__(self, x, train=True):
            x = fnn.relu(fnn.Conv(8, (3, 3))(x))
            return fnn.sigmoid(fnn.Conv(self.out, (3, 3))(x))

    cfg = _tiny_cfg()
    cfg.data.device_cache = True
    cfg.train.epochs = 3
    cfg.data.synthetic_length = 16
    cfg.train.loss = "mse"
    monkeypatch.setattr(
        engine, "build_model", lambda c: TinyNet(out=c.model.num_classes))
    r = train_and_evaluate(cfg)
    h = r["history"]["train_loss"]
    assert h[-1] < h[0], h
    assert r["steps"] == 3 * (16 // cfg.data.batch_size)
    assert "threshold_metrics" in r and 20 in r["threshold_metrics"]


def test_train_step_is_jittable_and_donates():
    # kan_reg_weight on: also exercises the opt-in spline regularizer wiring
    # (engine loss_of) in the same compile; weight=0 is every other test.
    cfg = _tiny_cfg(train__kan_reg_weight=1e-5)
    model = build_model(cfg)
    loss_fn = build_loss(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=4)
    state = init_state(cfg, model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, loss_fn, tx, cfg)
    batch = jnp.asarray(
        np.random.default_rng(0).random((8, 9, 32, 32)).astype(np.float32)
    )
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
    assert int(s2.step) == 2
    assert np.isfinite(float(m2["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    cfg.train.ckpt_dir = str(tmp_path / "ckpt")
    r = train_and_evaluate(cfg, max_steps=1)
    assert r["steps"] == 1

    # restore into a fresh abstract state
    from kmunet_tpu.train.checkpoint import CheckpointManager

    model = build_model(cfg)
    tx = build_optimizer(cfg, steps_per_epoch=1)
    abstract = jax.eval_shape(
        lambda: init_state(cfg, model, tx, jax.random.PRNGKey(0))
    )
    mgr = CheckpointManager(cfg.train.ckpt_dir)
    step, restored = mgr.restore_best(abstract)
    assert step == 1
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(restored.params))
    assert n > 1e5
    mgr.close()

    # Standalone test-only pass over the saved checkpoint (the reference's
    # reload-best-then-test flow, train_shanghai.py:437-441).
    from kmunet_tpu.train.engine import evaluate_checkpoint

    r2 = evaluate_checkpoint(cfg, cfg.train.ckpt_dir, which="best")
    assert r2["checkpoint_step"] == 1
    assert "threshold_metrics" in r2 and "test_loss" in r2
    assert np.isfinite(r2["test_loss"])


def test_laps_config_runs():
    cfg = laps_km_unet()
    cfg.data.name = "synthetic"
    cfg.data.img_size = 32
    cfg.data.seq_len = 8
    cfg.data.batch_size = 8
    cfg.data.synthetic_length = 8
    cfg.model.num_classes = 3
    cfg.data.out_frames = 3
    cfg.train.epochs = 1
    r = train_and_evaluate(cfg, max_steps=1)
    assert np.isfinite(r["test_loss"])
    # LAPS thresholds are the normalized 0.1..0.8 set (train_LAPS.py:220)
    assert 0.1 in r["threshold_metrics"]


def test_vis_and_scatter_eval_wired(tmp_path):
    """Reference test() dumps first-N PNG strips (train_shanghai.py:258-268)
    and the LAPS path appends per-threshold scatter metrics to CSV
    (train_LAPS.py:274-331) — both must fire from the engine test loop."""
    import os

    cfg = _tiny_cfg()
    cfg.train.out_dir = str(tmp_path / "out")
    cfg.train.vis_batches = 1
    cfg.train.scatter_eval = True
    cfg.data.thresholds = (0.1, 0.5)
    r = train_and_evaluate(cfg, max_steps=1)

    assert "scatter" in r and 0.1 in r["scatter"] and "HSS" in r["scatter"][0.1]
    csv_path = tmp_path / "out" / "scatter_metrics.csv"
    assert csv_path.exists() and csv_path.stat().st_size > 0
    vis_root = tmp_path / "out" / "vis" / "batch_0_sample_0"
    pngs = sorted(os.listdir(vis_root))
    assert pngs == ["gt.png", "input.png", "prediction.png"]

    # structured artifact for batch runs (quality table summarizer)
    import json

    res = json.load(open(tmp_path / "out" / "results.json"))
    assert res["model"] == cfg.model.name
    assert "0.1" in res["threshold_metrics"] and "CSI" in res["threshold_metrics"]["0.1"]
    assert res["final_val_loss"] is not None


def test_parse_overrides():
    cfg = shanghai_km_unet()
    parse_overrides(cfg, ["--train.lr=3e-4", "--data.img_size=128",
                          "--model.embed_dims=8,16,32", "--mesh.fsdp=true"])
    assert cfg.train.lr == 3e-4
    assert cfg.data.img_size == 128
    assert tuple(cfg.model.embed_dims) == (8, 16, 32)
    assert cfg.mesh.fsdp is True


def test_grad_clip_option():
    """--train.grad_clip chains a global-norm clip in front of the optimizer
    (opt-in stabilizer; the reference never clips)."""
    from kmunet_tpu.train.engine import build_optimizer

    cfg = shanghai_km_unet()
    cfg.train.schedule = "constant"  # lr(step) identical across both builds
    params = {"w": jnp.zeros((4,))}
    small = {"w": jnp.full((4,), 1e-4)}   # below the clip norm: must match
    big = {"w": jnp.full((4,), 100.0)}    # above it: must differ

    def updates_of(grad_clip, g1, g2):
        # two sequential updates: Adam's first step is magnitude-invariant
        # (m_hat/sqrt(v_hat) ~ sign(g)), but its m/v STATE is not — the
        # second update separates clipped from unclipped builds.
        cfg.train.grad_clip = grad_clip
        tx = build_optimizer(cfg, steps_per_epoch=10)
        st = tx.init(params)
        _, st = tx.update(g1, st, params)
        u, _ = tx.update(g2, st, params)
        return u["w"]

    assert not np.allclose(np.asarray(updates_of(1.0, big, small)),
                           np.asarray(updates_of(0.0, big, small)))
    # under-threshold grads are untouched: both builds agree exactly
    np.testing.assert_allclose(np.asarray(updates_of(1.0, small, small)),
                               np.asarray(updates_of(0.0, small, small)))
    assert jnp.all(jnp.isfinite(updates_of(1.0, big, big)))


def test_plateau_schedule_wiring(monkeypatch):
    """schedule='plateau' (ReduceLROnPlateau, models/utils.py:184-189):
    a host-side PlateauScheduler consulted between epochs writes its scale
    into the trailing inject_hyperparams(optax.scale) stage."""
    import flax.linen as fnn

    import kmunet_tpu.train.engine as engine

    class ConstNet(fnn.Module):
        out: int = 4

        @fnn.compact
        def __call__(self, x, train=True):
            # A bias-only head: val loss plateaus immediately once the bias
            # stops moving, which it never meaningfully does under MSE of a
            # random target -> patience trips after `patience+1` epochs.
            b = self.param("b", fnn.initializers.zeros, (self.out,))
            return jnp.broadcast_to(b, x.shape[:3] + (self.out,)) + 0.0 * x[..., :1]

    cfg = _tiny_cfg()
    cfg.train.schedule = "plateau"
    cfg.train.plateau_factor = 0.5
    cfg.train.plateau_patience = 1
    cfg.train.epochs = 5
    cfg.train.loss = "mse"
    cfg.train.lr = 0.0  # freeze params => val loss exactly constant
    cfg.data.synthetic_length = 8
    monkeypatch.setattr(
        engine, "build_model", lambda c: ConstNet(out=c.model.num_classes))

    captured = {}
    orig = engine.make_eval_step

    def capture_eval(model, loss_fn, c):
        fn = orig(model, loss_fn, c)

        def wrapped(state, batch):
            captured["state"] = state
            return fn(state, batch)

        return wrapped

    monkeypatch.setattr(engine, "make_eval_step", capture_eval)
    train_and_evaluate(cfg)
    inj = captured["state"].opt_state[-1]
    # constant val loss: epoch 0 sets best, epochs 1-2 trip patience=1 ->
    # scale 0.5, epochs 3-4 trip again -> 0.25.
    assert float(inj.hyperparams["step_size"]) == pytest.approx(0.25)


def test_seq_layout_e2e():
    """train_and_evaluate with a sequence-layout model (ConvLSTM EF): the
    (B, S, H, W) batch split, _to_btHW passthrough, eval + streaming metrics
    — the layout machinery the stack models never touch (~110 s here)."""
    cfg = _tiny_cfg()
    cfg.model.name = "convlstm"
    cfg.train.loss = "mse"
    cfg.train.vis_batches = 0
    r = train_and_evaluate(cfg, max_steps=1)
    assert np.isfinite(r["test_loss"])
    assert 20 in r["threshold_metrics"]
    assert np.isfinite(r["history"]["val_loss"][0])
