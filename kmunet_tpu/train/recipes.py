"""Faithful per-model training recipes for the baseline zoo.

The reference encodes a distinct optimizer/loss/schedule in each of its 15
cloned training scripts (7 ``models/train_NC_*.py`` for the LAPS/"NC" task +
8 ``models/train_*_pic_res*.py`` for Shanghai 256^2).  This table is the
audited extraction of every one of them — optimizer class and kwargs, loss,
scheduler and its parameters, epochs — keyed by (model, recipe).

Scheduler-stepping quirk kept faithfully: every reference script calls
``scheduler.step()`` once per EPOCH (the per-iteration call is commented
out, e.g. train_NC_SCECA.py:60 vs :354), so the MultiStepLR milestones
[15000, 30000] never fire within <= 150 epochs — those runs train at
constant LR.  We encode the milestones as written (epoch units); the
effective constancy is the reference's behavior, not a bug here.

Sources (file:line for optimizer / loss / scheduler / epochs):

NC (LAPS data, 5-in/3-out, thresholds 0.1..0.8; no NC convlstm script exists):
  sceca_net   train_NC_SCECA.py:301-304,336-338    AdamW 1e-3 / RAINlOSS / MultiStep[15000,30000] g0.1 / 60
  smaat_unet  train_NC_SmAtunet.py:304-307,339-341 SGD 1e-2 m0.9 wd1e-4 / RAINlOSS / Cos T30 eta1e-4 / 60
  lptqpn      train_NC_lptqpn.py:302-304,336-338   AdamW 1e-3 / RAINlOSS / Cos T30 eta1e-9 / 60
  mamba_unet  train_NC_mambaunet.py:302-305,337-340 Adam 1e-3 / RainfallLoss(.57,.25,.5,1) / Cos T50 eta1e-5 / 40
  swin_unet   train_NC_swim_unet.py:636-639,671-674 SGD 1e-2 m0.9 wd1e-4 / RAINlOSS / Cos T30 eta5e-4 / 60
  trajgru     train_NC_trajgru.py:302-305,338-340  Adam 1e-4 / Weighted_mse_mae(thr 0.1..0.8) / MultiStep / 60
  transunet   train_NC_transunet.py:301-304,336-338 SGD 1e-2 m0.9 wd1e-4 / RAINlOSS / MultiStep / 60

pic (Shanghai 256^2, 5-in/20-out, batch 2, SimplifiedEvaluator):
  sceca_net   train_SCECA_pic_result.py:344-348,400-402    SGD 1e-3 m0.9 wd1e-4 / RAINlOSS / MultiStep / 60
  smaat_unet  train_SmAt_unet_pic_resul.py:344-348,400-402 SGD 1e-2 m0.9 wd1e-4 / RAINlOSS / Cos T30 eta1e-9 / 60
  convlstm    train_convlstm_pic_resul.py:344-346,398-401  Adam 1e-4 / Weighted_mse_mae(thr 20..40) / MultiStep / 60
  lptqpn      train_lptpqn_pic_resul.py:344-346,398-399    AdamW 1e-3 / RAINlOSS / Cos T30 eta1e-9 / 60
  mamba_unet  train_mamba_unet_pic_result.py:352-354,406-409 SGD 1e-3 m0.9 wd1e-4 / RainfallLoss(.57,.25,.5,1) / Cos T50 eta1e-5 / 60
  swin_unet   train_swim_Unet_pic_result.py:669-671,723-726 SGD 1e-2 m0.9 wd1e-4 / RAINlOSS / Cos T150 eta1e-3 / 150
  trajgru     train_trajgru_pic_resul.py:343-347,399-401   Adam 1e-4 / Weighted_mse_mae(thr 20..40) / MultiStep / 60
  transunet   train_transunet_pic_resul.py:342-346,398-400 SGD 1e-2 m0.9 wd1e-4 / RAINlOSS / MultiStep / 60

Optimizer-default quirk: the three bare ``torch.optim.AdamW(params, lr=...)``
calls (train_NC_SCECA.py:302, train_NC_lptqpn.py:303,
train_lptpqn_pic_resul.py:345) inherit torch's DEFAULT decoupled
weight_decay=1e-2 — encoded explicitly below. The bare ``Adam`` calls
inherit torch's default weight_decay=0 (L2), so 0.0 is faithful there.

Loss name mapping (kmunet_tpu/losses/losses.py):
  "rain"             = RAINlOSS (MSE + MAE, models/loss.py:61-69)
  "rainfall"         = the 4-arg RainfallLoss(omega_t=0.57, alpha=0.25, ...)
                       variant (models/utils.py:217-235); the reference's
                       0.5 / 1 trailing args are unused by its own forward.
  "weighted_mse_mae" = threshold-banded MSE+MAE (models/loss.py:73-100);
                       thresholds come from cfg.data.thresholds, which the
                       recipe dataset (pic=Shanghai 20..40, nc=LAPS 0.1..0.8)
                       already sets — matching each script's argument.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from kmunet_tpu.configs.base import ExperimentConfig


@dataclasses.dataclass(frozen=True)
class Recipe:
    optimizer: str
    lr: float
    loss: str
    schedule: str                      # name understood by make_schedule / engine
    epochs: int
    weight_decay: float = 0.0
    momentum: float = 0.0
    eta_min: float = 0.0
    t_max: int = 0
    milestones: Sequence[int] = ()
    gamma: float = 0.1


_MULTISTEP = dict(schedule="MultiStepLR", milestones=(15000, 30000), gamma=0.1)
_SGD = dict(optimizer="sgd", momentum=0.9, weight_decay=1e-4)

RECIPES: dict[tuple[str, str], Recipe] = {
    # ---- NC (LAPS) ----
    ("sceca_net", "nc"): Recipe(optimizer="adamw", lr=1e-3, loss="rain",
                                epochs=60, weight_decay=1e-2, **_MULTISTEP),
    ("smaat_unet", "nc"): Recipe(lr=1e-2, loss="rain", epochs=60,
                                 schedule="CosineAnnealingLR", t_max=30,
                                 eta_min=1e-4, **_SGD),
    ("lptqpn", "nc"): Recipe(optimizer="adamw", lr=1e-3, loss="rain",
                             epochs=60, weight_decay=1e-2,
                             schedule="CosineAnnealingLR",
                             t_max=30, eta_min=1e-9),
    ("mamba_unet", "nc"): Recipe(optimizer="adam", lr=1e-3, loss="rainfall",
                                 epochs=40, schedule="CosineAnnealingLR",
                                 t_max=50, eta_min=1e-5),
    ("swin_unet", "nc"): Recipe(lr=1e-2, loss="rain", epochs=60,
                                schedule="CosineAnnealingLR", t_max=30,
                                eta_min=5e-4, **_SGD),
    ("trajgru", "nc"): Recipe(optimizer="adam", lr=1e-4,
                              loss="weighted_mse_mae", epochs=60, **_MULTISTEP),
    ("transunet", "nc"): Recipe(lr=1e-2, loss="rain", epochs=60,
                                **_SGD, **_MULTISTEP),
    # ---- pic (Shanghai) ----
    ("sceca_net", "pic"): Recipe(lr=1e-3, loss="rain", epochs=60,
                                 **_SGD, **_MULTISTEP),
    ("smaat_unet", "pic"): Recipe(lr=1e-2, loss="rain", epochs=60,
                                  schedule="CosineAnnealingLR", t_max=30,
                                  eta_min=1e-9, **_SGD),
    ("convlstm", "pic"): Recipe(optimizer="adam", lr=1e-4,
                                loss="weighted_mse_mae", epochs=60, **_MULTISTEP),
    ("lptqpn", "pic"): Recipe(optimizer="adamw", lr=1e-3, loss="rain",
                              epochs=60, weight_decay=1e-2,
                              schedule="CosineAnnealingLR",
                              t_max=30, eta_min=1e-9),
    ("mamba_unet", "pic"): Recipe(lr=1e-3, loss="rainfall", epochs=60,
                                  schedule="CosineAnnealingLR", t_max=50,
                                  eta_min=1e-5, **_SGD),
    ("swin_unet", "pic"): Recipe(lr=1e-2, loss="rain", epochs=150,
                                 schedule="CosineAnnealingLR", t_max=150,
                                 eta_min=1e-3, **_SGD),
    ("trajgru", "pic"): Recipe(optimizer="adam", lr=1e-4,
                               loss="weighted_mse_mae", epochs=60, **_MULTISTEP),
    ("transunet", "pic"): Recipe(lr=1e-2, loss="rain", epochs=60,
                                 **_SGD, **_MULTISTEP),
}


def apply_recipe(cfg: ExperimentConfig, model: str, recipe: str) -> ExperimentConfig:
    """Overwrite cfg.train with the audited (model, recipe) settings.

    ``recipe``: "nc" (LAPS 5-in/3-out) or "pic" (Shanghai 5-in/20-out).
    cfg should already be laps_km_unet() / shanghai_km_unet() respectively —
    this only sets the optimizer/loss/schedule surface, not the data config.
    """
    key = (model, recipe)
    if key not in RECIPES:
        available = sorted(k for k in RECIPES if k[1] == recipe)
        raise KeyError(f"no reference recipe for {key}; audited: {available}")
    r = RECIPES[key]
    t = cfg.train
    t.optimizer = r.optimizer
    t.lr = r.lr
    t.weight_decay = r.weight_decay
    t.momentum = r.momentum
    t.loss = r.loss
    t.schedule = r.schedule
    t.epochs = r.epochs
    t.eta_min = r.eta_min
    if r.t_max:
        t.cosine_t_max = r.t_max
    t.milestones = tuple(r.milestones)
    t.gamma = r.gamma
    cfg.model.name = model
    return cfg
