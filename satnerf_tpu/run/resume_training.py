"""Resume a training run from its run directory.

ref: run/resume_training.py:16-36. Usage:

    python -m satnerf_tpu.run.resume_training resume <run_dp>
"""

from __future__ import annotations

import sys

from satnerf_tpu.configs import load_configs_from_logs
from satnerf_tpu.logger import logger
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


def resume(run_dp: str):
    cfgs = load_configs_from_logs(run_dp)
    cfgs.run.resume_from_ckpoint = True
    logger.info("Resume", f"resuming run {run_dp}")
    # Re-apply the run's matmul precision: without this, resumed sessions
    # train/validate at JAX's default precision instead of the configured
    # one — caught by the 30k-step interrupted-vs-uninterrupted comparison
    # (validation PSNR shifted 0.02 dB across the resume boundary with
    # frozen params; docs/validation_run.md).
    from satnerf_tpu.run.training import _apply_matmul_precision

    _apply_matmul_precision(cfgs.run.matmul_precision)
    pipeline = load_pipeline(cfgs)
    pipeline.load_datasets()
    trainer = Trainer(pipeline)
    return trainer.fit()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd, *args = argv
    {"resume": resume}[cmd](*args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
