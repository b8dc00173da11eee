"""Device mesh + sharding layout for data-parallel ray training.

The reference has no distributed training at all (single pinned GPU,
ref: framework/pipelines.py:311; SURVEY.md §2.7) — scaling here is a
first-class TPU design:

* 1-D mesh over the 'data' axis (rays are embarrassingly parallel; the
  per-ray sample dimension stays on-chip for the compositing scan);
* parameters + optimizer state replicated; ray batches and the on-device
  ray store sharded along axis 0;
* the loss is a mean over the sharded batch, so XLA inserts the gradient
  all-reduce (psum over ICI) automatically under jit — no hand-written
  collectives needed for DP. Multi-host scale-out runs the same program
  per process (one mesh spanning all chips).

Store layout: sharding the ray store along rays would turn random-index
gathers into cross-chip all-to-alls, so for DFC2019-scale stores (~1 GB)
the store is REPLICATED and only the batch (or its index vector) is
sharded — every gather is chip-local and the only collective per step is
the gradient psum.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the 'data' axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if not 0 < n_devices <= len(devices):
                # silent truncation would run "4-way data parallelism" on
                # one chip with no hint beyond mysteriously low throughput
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} device(s) are available"
                )
            devices = devices[:n_devices]
    if len(devices) == 0:
        raise ValueError("cannot build a mesh over zero devices")
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard along the leading (ray/batch) axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_train_step(train_step, mesh: Mesh):
    """jit the train step with DP shardings attached.

    state (params/opt/step) replicated; batch arrays sharded on axis 0;
    PRNG key replicated. Output state replicated, metrics replicated
    (XLA all-reduces the means).
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    # a single sharding acts as a pytree prefix: every leaf of the batch
    # dict is sharded along its leading (ray) axis
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )
