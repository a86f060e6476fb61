"""LR schedules replicating the reference recipes.

The reference steps ``CosineAnnealingLR(T_max=200, eta_min=5e-4)`` once per
*epoch* (train_shanghai.py:398-399,415) while optax schedules tick per step —
so the schedule here is a function of ``step // steps_per_epoch``.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_per_epoch(
    base_lr: float, eta_min: float, t_max: int, steps_per_epoch: int
):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        cos = (1.0 + jnp.cos(jnp.pi * epoch / t_max)) / 2.0
        return eta_min + (base_lr - eta_min) * cos

    return schedule
