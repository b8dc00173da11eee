"""Checkpointing: orbax save/restore of the full TrainState.

Policy mirrors the reference (ref: framework/pipelines.py:260-293 +
framework/util/load_ckpoint.py:12-129): track the best ``train/mae``
(minimum), keep ``last`` always, optionally keep every-n-epochs snapshots.
A checkpoint carries {params, opt_state, step} so a resumed run continues the
optimizer trajectory exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from satnerf_tpu.logger import logger
from satnerf_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, run_dp: str, save_every_n_epochs: int = -1) -> None:
        self.ckpt_dp = os.path.abspath(os.path.join(run_dp, "ckpoints"))
        os.makedirs(self.ckpt_dp, exist_ok=True)
        self.save_every_n_epochs = save_every_n_epochs
        self.best_mae = float("inf")
        self._ckptr = ocp.PyTreeCheckpointer()

    # -- save ----------------------------------------------------------------
    def _save(self, name: str, state: TrainState) -> None:
        path = os.path.join(self.ckpt_dp, name)
        state = jax.device_get(state)
        self._ckptr.save(path, {"params": state.params,
                                "opt_state": state.opt_state,
                                "step": np.asarray(state.step)},
                         force=True)

    def save_last(self, state: TrainState) -> None:
        self._save("last", state)

    def maybe_save_best(self, state: TrainState, train_mae: float) -> bool:
        """Monitor train/mae (min), like the reference's best-checkpoint
        callback (ref: pipelines.py:268-275)."""
        if train_mae < self.best_mae:
            self.best_mae = train_mae
            self._save("best", state)
            return True
        return False

    def maybe_save_epoch(self, state: TrainState, epoch: int) -> None:
        n = self.save_every_n_epochs
        if n > 0 and epoch % n == 0:
            self._save(f"epoch_{epoch}", state)

    # -- restore ---------------------------------------------------------------
    def restore(self, template_state: TrainState, name: str = "last") -> TrainState:
        path = os.path.join(self.ckpt_dp, name)
        target = {
            "params": jax.device_get(template_state.params),
            "opt_state": jax.device_get(template_state.opt_state),
            "step": np.asarray(template_state.step),
        }
        restored = self._ckptr.restore(path, item=target)
        logger.info("Checkpoint", f"restored {name} at step {int(restored['step'])}")
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )


def find_ckpoint_fp(run_dp: str, epoch: int | None = None) -> str:
    """Locate a checkpoint dir by epoch or fall back to last
    (ref: framework/util/load_ckpoint.py:12-27)."""
    dp = os.path.join(run_dp, "ckpoints")
    if epoch is not None:
        cand = os.path.join(dp, f"epoch_{epoch}")
        if os.path.isdir(cand):
            return cand
    for name in ("best", "last"):
        cand = os.path.join(dp, name)
        if os.path.isdir(cand):
            return cand
    raise FileNotFoundError(f"no checkpoint found in {dp}")
