"""Multi-host (multi-slice / DCN) initialisation helpers.

Single-host multi-chip needs nothing beyond `make_mesh()`. For pods or
multi-slice deployments, every host runs the SAME training program
(single-controller-per-process SPMD); this wrapper wires
``jax.distributed.initialize`` from explicit args or the standard cluster
env vars, after which ``jax.devices()`` spans all hosts, the 1-D data mesh
covers the pod, and each host feeds only its addressable shard of the batch.

Pod runs must point every process at the SAME ``run.run_dp`` (the Trainer
enforces this); host-side artifacts in it — TB events, config dump, log
file, profiler/trace dumps, validation TIFs/DSMs — are written by process 0
only (the lead-writer convention), while compute, including validation
renders, runs on every process as one SPMD program. Checkpoint saves are
orbax collectives: every process calls them (with broadcast-synchronised
best-mae decisions) and orbax writes from the primary host internally.

The reference has no multi-host story at all (SURVEY.md §2.7: tmux
process-per-GPU for independent experiments); here scale-out of ONE training
run is a first-class path, while independent-experiment scale-out remains
available through run/automated_training.py.
"""

from __future__ import annotations

import jax

from satnerf_tpu.logger import logger
from satnerf_tpu.parallel.mesh import make_mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialise the JAX distributed runtime (idempotent).

    With no args, defers to cluster auto-detection (TPU pod metadata /
    standard env vars). Returns (process_index, process_count).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as exc:  # already initialised
        logger.warning("Multihost", f"distributed init skipped: {exc}")
    logger.info(
        "Multihost",
        f"process {jax.process_index()}/{jax.process_count()} with "
        f"{jax.local_device_count()} local of {jax.device_count()} devices",
    )
    return jax.process_index(), jax.process_count()


def make_pod_mesh():
    """1-D data mesh over every device in the pod (call after
    initialize_multihost)."""
    return make_mesh(len(jax.devices()))


def local_batch_slice(global_batch: int) -> int:
    """Rays this host must feed per step for an evenly-sharded global batch.

    Requires ``global_batch`` divisible by the pod device count — flooring
    silently would train at a different effective batch than configured
    (LR schedules and loss scaling are tuned to the nominal size).
    """
    n = jax.device_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} is not divisible by the pod's "
            f"{n} devices (realized batch would be {global_batch // n * n})"
        )
    return (global_batch // n) * jax.local_device_count()
