"""Per-model baseline recipe fidelity (kmunet_tpu/train/recipes.py vs the
15 reference training scripts — sources cited in the recipes module)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kmunet_tpu.configs import laps_km_unet, shanghai_km_unet
from kmunet_tpu.train.engine import build_loss, build_optimizer
from kmunet_tpu.train.recipes import RECIPES, Recipe, apply_recipe

ZOO = ("convlstm", "trajgru", "transunet", "swin_unet", "smaat_unet",
       "lptqpn", "sceca_net", "mamba_unet")


def test_table_covers_every_reference_script():
    # 7 NC scripts (no train_NC_convlstm exists in the reference) + 8 pic.
    nc = {m for m, r in RECIPES if r == "nc"}
    pic = {m for m, r in RECIPES if r == "pic"}
    assert pic == set(ZOO)
    assert nc == set(ZOO) - {"convlstm"}
    assert len(RECIPES) == 15


@pytest.mark.parametrize("model,recipe", sorted(RECIPES))
def test_recipe_instantiates(model, recipe):
    cfg = shanghai_km_unet() if recipe == "pic" else laps_km_unet()
    apply_recipe(cfg, model, recipe)
    assert cfg.model.name == model

    loss_fn = build_loss(cfg)
    # weighted_mse_mae consumes the reference's 5-D (B, S, C, H, W) layout
    shape = (2, 3, 1, 8, 8) if cfg.train.loss == "weighted_mse_mae" else (2, 3, 8, 8)
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.random(shape, dtype=np.float32))
    t = jnp.asarray(rng.random(shape, dtype=np.float32))
    assert np.isfinite(float(loss_fn(p, t)))

    tx = build_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1), "b": jnp.full((4,), 0.1)}
    updates, _ = tx.update(grads, state, params)
    out = optax.apply_updates(params, updates)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(out))


def test_spot_check_against_reference_values():
    # SmaAt NC: SGD momentum 0.9 wd 1e-4 + RAINlOSS + cosine eta_min 1e-4
    # (train_NC_SmAtunet.py:304-307,339-341)
    cfg = apply_recipe(laps_km_unet(), "smaat_unet", "nc")
    t = cfg.train
    assert (t.optimizer, t.lr, t.momentum, t.weight_decay) == ("sgd", 1e-2, 0.9, 1e-4)
    assert (t.loss, t.schedule, t.eta_min, t.cosine_t_max, t.epochs) == (
        "rain", "CosineAnnealingLR", 1e-4, 30, 60)

    # LPTQPN NC: AdamW + RAINlOSS + cosine eta_min 1e-9 (train_NC_lptqpn.py:302-338).
    # Bare torch.optim.AdamW(params, lr) inherits torch's default decoupled
    # weight_decay=1e-2 — the recipes must encode it.
    cfg = apply_recipe(laps_km_unet(), "lptqpn", "nc")
    assert (cfg.train.optimizer, cfg.train.eta_min) == ("adamw", 1e-9)
    assert cfg.train.weight_decay == 1e-2

    # SCECA NC: AdamW + RAINlOSS + MultiStepLR [15000,30000] (train_NC_SCECA.py:301-338)
    cfg = apply_recipe(laps_km_unet(), "sceca_net", "nc")
    assert cfg.train.schedule == "MultiStepLR"
    assert tuple(cfg.train.milestones) == (15000, 30000)
    assert cfg.train.weight_decay == 1e-2
    assert apply_recipe(shanghai_km_unet(), "lptqpn", "pic").train.weight_decay == 1e-2
    # Bare torch.optim.Adam defaults to weight_decay=0 (L2) — 0.0 is faithful.
    assert apply_recipe(laps_km_unet(), "mamba_unet", "nc").train.weight_decay == 0.0

    # ConvLSTM pic: Adam 1e-4 + Weighted_mse_mae(thr 20..40) + MultiStep
    # (train_convlstm_pic_resul.py:344-346,398-401)
    cfg = apply_recipe(shanghai_km_unet(), "convlstm", "pic")
    assert (cfg.train.optimizer, cfg.train.lr, cfg.train.loss) == (
        "adam", 1e-4, "weighted_mse_mae")
    assert tuple(cfg.data.thresholds) == (20, 30, 35, 40)

    # Swin pic trains 150 epochs with T_max 150 eta 1e-3
    # (train_swim_Unet_pic_result.py:669-726)
    cfg = apply_recipe(shanghai_km_unet(), "swin_unet", "pic")
    assert (cfg.train.epochs, cfg.train.cosine_t_max, cfg.train.eta_min) == (
        150, 150, 1e-3)


def test_epoch_stepped_multistep_never_fires():
    """The reference steps schedulers per EPOCH, so MultiStepLR milestones
    [15000, 30000] never trigger inside a 60-epoch run — constant LR. The
    schedule must reproduce that (not decay at step 15000)."""
    cfg = apply_recipe(shanghai_km_unet(), "transunet", "pic")
    from kmunet_tpu.train.optimizers import make_schedule

    sched = make_schedule(cfg.train.schedule, cfg.train.lr, steps_per_epoch=300,
                          milestones=tuple(cfg.train.milestones),
                          gamma=cfg.train.gamma)
    # step 16000 = epoch 53: still below milestone 15000 *epochs*
    assert float(sched(16000)) == pytest.approx(cfg.train.lr)
    # but a run that did reach epoch 15000 would decay
    assert float(sched(300 * 15001)) == pytest.approx(cfg.train.lr * 0.1)


def test_unknown_recipe_raises():
    with pytest.raises(KeyError):
        apply_recipe(laps_km_unet(), "convlstm", "nc")  # no NC convlstm script
    with pytest.raises(KeyError):
        apply_recipe(laps_km_unet(), "nope", "nc")
