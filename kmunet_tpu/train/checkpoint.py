"""Orbax checkpointing with best-by-val-loss semantics.

The reference saves only the best model's ``state_dict`` to a fixed path and
warm-starts from it (train_shanghai.py:335-336,427-431); optimizer/step state
is lost. Here the full train state (params, batch_stats, opt_state, step) is
checkpointed so runs resume exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, best_fn=lambda m: -m["val_loss"]
            ),
        )

    def save(self, step: int, state: Any, val_loss: float):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={"val_loss": float(val_loss)},
        )

    def restore_latest(self, abstract_state: Any):
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return step, state

    def restore_best(self, abstract_state: Any):
        step = self._mgr.best_step()
        if step is None:
            return None, None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
        return step, state

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
