"""Optimizer / LR-schedule factories mirroring the reference's 9-way and
8-way recipes (models/utils.py:64-214), in optax.

All schedules are *per-epoch* functions (the reference steps schedulers per
epoch) evaluated at ``step // steps_per_epoch``. ReduceLROnPlateau has no
step-schedule analogue; it is exposed as a host-side controller
(``PlateauScheduler``) that the engine can consult between epochs.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import optax


def make_schedule(
    name: str,
    base_lr: float,
    steps_per_epoch: int,
    *,
    step_size: int = 30,
    gamma: float = 0.1,
    milestones: Sequence[int] = (30, 60),
    t_max: int = 200,
    eta_min: float = 0.0,
    t_0: int = 10,
    t_mult: int = 2,
    warm_up_epochs: int = 5,
    epochs: int = 100,
):
    """Returns lr(step). Names follow models/utils.py:154-214."""
    spe = max(steps_per_epoch, 1)

    def per_epoch(f):
        return lambda step: base_lr * f(step // spe)

    if name == "StepLR":
        return per_epoch(lambda e: gamma ** (e // step_size))
    if name == "MultiStepLR":
        ms = jnp.asarray(sorted(milestones))
        return per_epoch(lambda e: gamma ** jnp.sum(ms <= e))
    if name == "ExponentialLR":
        return per_epoch(lambda e: gamma**e)
    if name == "CosineAnnealingLR":
        return lambda step: eta_min + (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * (step // spe) / t_max)
        ) / 2
    if name == "CosineAnnealingWarmRestarts":
        def warm_restart(step):
            e = step // spe
            # T_i = t_0 * t_mult^k; find cycle position
            if t_mult == 1:
                t_cur = e % t_0
                t_i = t_0
            else:
                k = jnp.floor(
                    jnp.log((e / t_0) * (t_mult - 1) + 1) / jnp.log(t_mult)
                )
                start = t_0 * (t_mult**k - 1) / (t_mult - 1)
                t_i = t_0 * t_mult**k
                t_cur = e - start
            return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2
        return warm_restart
    if name == "WP_MultiStepLR":
        ms = jnp.asarray(sorted(milestones))
        def wp_ms(step):
            e = step // spe
            warm = e / warm_up_epochs
            decayed = gamma ** jnp.sum(ms <= e)
            return base_lr * jnp.where(e <= warm_up_epochs, warm, decayed)
        return wp_ms
    if name == "WP_CosineLR":
        def wp_cos(step):
            e = step // spe
            warm = e / warm_up_epochs
            cos = 0.5 * (jnp.cos((e - warm_up_epochs) / (epochs - warm_up_epochs) * math.pi) + 1)
            return base_lr * jnp.where(e <= warm_up_epochs, warm, cos)
        return wp_cos
    if name == "constant":
        return base_lr
    raise ValueError(f"unsupported scheduler {name!r}")


def make_optimizer(
    name: str,
    learning_rate,
    *,
    weight_decay: float = 0.0,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    momentum: float = 0.9,
    alpha: float = 0.99,  # RMSprop smoothing
    rho: float = 0.9,     # Adadelta
    centered: bool = False,
    nesterov: bool = False,
    etas: tuple[float, float] = (0.5, 1.2),
    step_sizes: tuple[float, float] = (1e-6, 50.0),
) -> optax.GradientTransformation:
    """9-way optimizer factory (models/utils.py:64-151)."""
    name = name.lower()
    if name == "adadelta":
        tx = optax.adadelta(learning_rate, rho=rho, eps=eps, weight_decay=weight_decay)
    elif name == "adagrad":
        tx = optax.adagrad(learning_rate, eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "adam":
        tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:  # torch Adam couples wd into the gradient
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay)
    elif name == "adamax":
        tx = optax.adamax(learning_rate, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "asgd":
        # optax has no ASGD; plain SGD with weight decay is the honest analogue
        tx = optax.sgd(learning_rate)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "rmsprop":
        tx = optax.rmsprop(learning_rate, decay=alpha, eps=eps,
                           centered=centered, momentum=momentum or None)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    elif name == "rprop":
        tx = optax.rprop(learning_rate, eta_minus=etas[0], eta_plus=etas[1],
                         min_step_size=step_sizes[0], max_step_size=step_sizes[1])
    elif name == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum or None, nesterov=nesterov)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    else:
        raise ValueError(f"unsupported optimizer {name!r}")
    return tx


class PlateauScheduler:
    """Host-side ReduceLROnPlateau controller: returns an lr scale factor;
    inject via optax.inject_hyperparams or a scale-by-state wrapper."""

    def __init__(self, factor: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, min_scale: float = 1e-8):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_scale = min_scale
        self.best = float("inf")
        self.bad = 0
        self.scale = 1.0

    def update(self, metric: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad = 0
        return self.scale
