"""Train state: params + optimizer state + step counter as one pytree.

Replaces the LightningModule's implicit state (ref: framework/pipelines.py:22)
with an explicit functional state that jit/shard_map can thread.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from satnerf_tpu.models import init_embedding, init_field_params
from satnerf_tpu.models.field import FieldConfig
from satnerf_tpu.train.schedule import make_lr_schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.int32


def make_optimizer(
    base_lr: float,
    scheduler: str = "step",
    steps_per_epoch: int = 1,
    num_epochs: int = 1,
) -> optax.GradientTransformation:
    """Adam (no weight decay) + epoch LR schedule.

    ref: baseline/pipelines/base_ray_pipeline.py:246-269 configure_optimizers.
    """
    sched = make_lr_schedule(base_lr, scheduler, steps_per_epoch, num_epochs)
    return optax.inject_hyperparams(optax.adam)(learning_rate=sched)


def init_params(
    key: jax.Array,
    fcfg: FieldConfig,
    t_vocab: int = 50,
    use_fine_network: bool = False,
) -> dict:
    """Init the full model dict: field + transient embedding table(s)
    (+ an independent fine field for hierarchical sampling).

    ref: baseline/pipelines/satnerf.py:51-66 models dict {"coarse", "t"}.
    """
    k_field, k_fine, k_t, k_ts = jax.random.split(key, 4)
    params = {"field": init_field_params(k_field, fcfg)}
    if use_fine_network:
        params["fine"] = init_field_params(k_fine, fcfg)
    if fcfg.has_beta:
        params["t"] = init_embedding(k_t, t_vocab, fcfg.t_embedding_tau)
        if fcfg.use_separate_tj_for_semantic:
            params["t_s"] = init_embedding(k_ts, t_vocab, fcfg.t_embedding_tau)
    return params


def create_train_state(
    key: jax.Array,
    fcfg: FieldConfig,
    optimizer: optax.GradientTransformation,
    t_vocab: int = 50,
    use_fine_network: bool = False,
) -> TrainState:
    params = init_params(key, fcfg, t_vocab, use_fine_network)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
