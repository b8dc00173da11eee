"""Learning-rate schedules (epoch-granular, traced-step friendly).

ref: framework/util/train_util.py:45-60 — "step" (0.9^epoch, the default used
by all pipelines), "exponential", "multistep", "cosine". Epoch is derived from
the step counter inside jit, so the schedule lives in the optax chain without
retracing.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(
    base_lr: float,
    scheduler: str = "step",
    steps_per_epoch: int = 1,
    num_epochs: int = 1,
):
    eps = 1e-8
    spe = max(int(steps_per_epoch), 1)

    def sched(step):
        epoch = jnp.asarray(step, jnp.float32) // spe
        if scheduler == "step":
            return base_lr * 0.9**epoch
        if scheduler == "exponential":
            return base_lr * 0.01**epoch
        if scheduler == "multistep":
            factor = 0.5 ** (
                (epoch >= 2).astype(jnp.float32)
                + (epoch >= 4).astype(jnp.float32)
                + (epoch >= 8).astype(jnp.float32)
            )
            return base_lr * factor
        if scheduler == "cosine":
            frac = jnp.clip(epoch / max(num_epochs, 1), 0.0, 1.0)
            return eps + (base_lr - eps) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        raise ValueError(f"lr scheduler not recognised: {scheduler}")

    return sched


def epoch_from_step(step, steps_per_epoch: int):
    """Lightning-style epoch number (ref: train_util.py:15-16)."""
    return step // max(int(steps_per_epoch), 1)
