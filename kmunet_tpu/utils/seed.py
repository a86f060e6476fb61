"""Determinism helpers (reference: models/utils.py:13-25 set_seed).

JAX is functionally deterministic given PRNG keys; host-side randomness
(numpy shuffles in the data pipeline) is seeded here. The reference's
cudnn.deterministic toggle has no analogue — XLA:TPU is deterministic by
default for a fixed compilation.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 42) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
