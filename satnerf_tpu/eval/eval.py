"""Eval orchestrator: run the full evaluation battery for a trained run.

ref: eval/eval.py:8-61 + eval/tmux_baseline.sh / tmux_semantic.sh — the
reference fans eval scripts out to tmux windows pinned to different GPUs;
on a single-tenant TPU chip the correct schedule is sequential (each step is
itself device-parallel), so this orchestrator simply runs:

    eval_nerf (train + test splits) -> point clouds -> semantic eval
    (when the run is an rs_semantic pipeline) -> gather tables.

CLI: python -m satnerf_tpu.eval.eval <run_or_experiment_dp> [output_dp]
"""

from __future__ import annotations

import os
import sys

from satnerf_tpu.configs import read_toml
from satnerf_tpu.eval.eval_nerf import eval_nerf_training
from satnerf_tpu.eval.eval_semantic import eval_semantic_nerfs
from satnerf_tpu.eval.extract_pointcloud import create_dsm_pointcloud
from satnerf_tpu.eval.gather_eval import gather
from satnerf_tpu.eval.util import expand_input_files_for_experiments
from satnerf_tpu.logger import logger


def _is_semantic(run_dp: str) -> bool:
    fp = os.path.join(run_dp, "configs", "pipeline.toml")
    return "rs_semantic" in read_toml(fp).get("pipeline", "")


def eval_all(input_dp: str, output_dp: str, splits=("train", "test"), epoch: int = -1):
    runs, output_dp = expand_input_files_for_experiments(input_dp, output_dp)
    for run_dp in runs:
        for split in splits:
            logger.info("EvalAll", f"{os.path.basename(run_dp)} [{split}]: nerf eval")
            eval_nerf_training(run_dp, output_dp, split=split, epoch=epoch)
            logger.info("EvalAll", f"{os.path.basename(run_dp)} [{split}]: point clouds")
            create_dsm_pointcloud(run_dp, output_dp, split=split, epoch=epoch)
            if _is_semantic(run_dp):
                logger.info(
                    "EvalAll", f"{os.path.basename(run_dp)} [{split}]: semantic eval"
                )
                eval_semantic_nerfs(run_dp, output_dp, split=split, epoch=epoch)
    gather(output_dp, os.path.join(output_dp, "gathered.txt"))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    eval_all(*argv)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
