"""Training entry point.

ref: run/training.py:13-75. Usage:

    python -m satnerf_tpu.run.training start_training <run.toml> <pipeline.toml>

(plain argv dispatch instead of the ``fire`` dependency).
"""

from __future__ import annotations

import gc
import sys
import time

from satnerf_tpu.configs import MainConfig, load_configs
from satnerf_tpu.logger import logger
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


def start_training(run_fp: str, pipeline_fp: str):
    cfgs = load_configs(run_fp, pipeline_fp)
    return start_training_cfgs(cfgs)


def start_training_cfgs(cfgs: MainConfig):
    cfgs.create_run_dp()
    return start_pipeline_cfgs(cfgs)


def start_pipeline_cfgs(cfgs: MainConfig):
    if cfgs.run.deterministic:
        # determinism: jax is deterministic given fixed PRNG keys; the only
        # host randomness is the epoch sampler, which is seeded from run.seed
        logger.info("Run", f"deterministic run with seed {cfgs.run.seed}")

    _apply_matmul_precision(cfgs.run.matmul_precision)

    pipeline = load_pipeline(cfgs)
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline)
    state = trainer.fit()
    return pipeline, state


def start_assigned_ids_from_automated(experiment_dp: str, ids: str):
    """Run a sequence of derived experiment configs on this host
    (ref: run/training.py:49-70)."""
    import os

    for exp_id in str(ids).split(","):
        exp_id = exp_id.strip()
        run_fp = os.path.join(experiment_dp, exp_id, "run.toml")
        pipe_fp = os.path.join(experiment_dp, exp_id, "pipeline.toml")
        logger.info("Sweep", f"starting experiment {exp_id}")
        start_training(run_fp, pipe_fp)
        gc.collect()
        time.sleep(5)  # let the device settle between experiments


def _apply_matmul_precision(precision: str):
    import jax

    mapping = {"highest": "highest", "high": "high", "medium": "default",
               "default": "default"}
    jax.config.update(
        "jax_default_matmul_precision", mapping.get(precision, "high")
    )


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    cmd, *args = argv
    fn = {
        "start_training": start_training,
        "start_assigned_ids_from_automated": start_assigned_ids_from_automated,
    }[cmd]
    fn(*args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
