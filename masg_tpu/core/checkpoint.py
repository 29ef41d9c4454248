"""Checkpoint manager (orbax).

Reproduces the reference semantics (train.py:271-285, utils/model.py:11-34):
- save {model params, batch stats, optimizer state} keyed by step every
  save_step;
- `--restore_step N` restores both model and optimizer state and seeds the
  Noam schedule's step counter;
- `--checkpoint path` warm-starts MODEL-ONLY from a different run.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from ..train.state import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def _check_step(self, step: int) -> None:
        steps = list(self._mgr.all_steps())
        if step not in steps:
            raise FileNotFoundError(
                f"no checkpoint for step {step} under {self.ckpt_dir} "
                f"(available: {steps or 'none'})"
            )

    def restore(self, step: int, state: TrainState) -> TrainState:
        """Full restore: model + optimizer (reference --restore_step)."""
        self._check_step(step)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=step,
        )

    def restore_model_only(self, step: int, state: TrainState) -> TrainState:
        """Warm start from another run's weights (reference --checkpoint)."""
        self._check_step(step)
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"]
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()
