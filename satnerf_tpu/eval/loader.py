"""Load a trained run for offline evaluation.

ref: framework/util/load_ckpoint.py:30-92 (load_from_disk) — rebuild the
pipeline from the persisted configs, restore checkpointed parameters (by
epoch snapshot, or best/last), and return everything eval scripts need.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

from satnerf_tpu.configs import adapt_configs_for_inference, load_configs_from_logs
from satnerf_tpu.logger import logger
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.checkpoint import find_ckpoint_fp


def load_run(run_dp: str, epoch: int | None = None, load_datasets: bool = True):
    """Returns (pipeline, params, rcfg, epoch_label)."""
    cfgs = load_configs_from_logs(run_dp)
    cfgs = adapt_configs_for_inference(cfgs)

    # Evaluate at the run's configured matmul precision (the training CLI
    # applies it at start; offline consumers must match or rendered metrics
    # shift slightly — same issue as the resume-path fix in
    # run/resume_training.py).
    from satnerf_tpu.run.training import _apply_matmul_precision

    _apply_matmul_precision(cfgs.run.matmul_precision)

    ckpt_path = find_ckpoint_fp(run_dp, epoch if (epoch or 0) > 0 else None)
    restored = ocp.PyTreeCheckpointer().restore(ckpt_path)
    params = restored["params"]
    step = int(restored.get("step", 0))
    logger.info(
        "Eval", f"restored {os.path.basename(ckpt_path)} (step {step}) from {run_dp}"
    )

    pipeline = load_pipeline(cfgs)
    if load_datasets:
        pipeline.load_datasets()

    scfg = pipeline.step_config(steps_per_epoch=1, with_depth=False)
    # the solar-correction ray pass exists for TRAINING loss terms only
    # (ref: baseline/components/loss.py:13-29); no eval/viz/serve consumer
    # reads its outputs, and dropping it renders ~1.9x faster (measured:
    # 45.5 -> 23.9 ms per 8192-ray chunk, docs/performance.md)
    from dataclasses import replace

    return pipeline, params, replace(scfg.render, solar_correction=False), step
