"""End-to-end engine tests on the 8-device CPU mesh: data -> model -> loss ->
step -> eval -> metrics, plus checkpoint round-trip and LAPS config."""

import numpy as np
import jax
import jax.numpy as jnp

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


def test_e2e_loss_decreases():
    cfg = _tiny_cfg()
    cfg.train.epochs = 3
    cfg.data.synthetic_length = 16
    r = train_and_evaluate(cfg)
    h = r["history"]["train_loss"]
    assert h[-1] < h[0], h
    assert "threshold_metrics" in r and 20 in r["threshold_metrics"]


def test_train_step_is_jittable_and_donates():
    cfg = _tiny_cfg()
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


def test_parse_overrides():
    cfg = shanghai_km_unet()
    parse_overrides(cfg, ["--train.lr=3e-4", "--data.img_size=128",
                          "--model.embed_dims=8,16,32", "--mesh.fsdp=true"])
    assert cfg.train.lr == 3e-4
    assert cfg.data.img_size == 128
    assert tuple(cfg.model.embed_dims) == (8, 16, 32)
    assert cfg.mesh.fsdp is True
