"""Eval orchestrator: run the full evaluation battery for a trained run.

ref: eval/eval.py:8-61 + eval/tmux_baseline.sh / tmux_semantic.sh — the
reference fans eval scripts out to tmux windows pinned to different GPUs.
On a single-tenant TPU chip the right schedule is sequential but SHARED:
the checkpoint is restored once and every image is rendered exactly once,
with the rendered results fed to all three consumers (PSNR/SSIM/MAE,
point clouds, semantic metrics) — a ~3x cut in rendering and load work
compared to invoking the standalone CLIs back-to-back.

CLI: python -m satnerf_tpu.eval.eval <run_or_experiment_dp> [output_dp]
     [--splits test,train] [--epoch N]
     output_dp defaults to $SATNERF_TPU_EVAL_DP, else
     <run_or_experiment_dp>/eval_battery.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from satnerf_tpu.configs import read_toml
from satnerf_tpu.eval.eval_nerf import _with_running_means, evaluate_image
from satnerf_tpu.eval.eval_semantic import (
    evaluate_semantic_image,
    write_semantic_results,
)
from satnerf_tpu.eval.extract_pointcloud import export_image_clouds
from satnerf_tpu.eval.gather_eval import gather
from satnerf_tpu.eval.loader import load_run
from satnerf_tpu.eval.util import (
    EVAL_DP_ENV,
    EVAL_DP_ENV_COMPAT,
    expand_input_files_for_experiments,
)
from satnerf_tpu.logger import logger
from satnerf_tpu.render.renderer import render_image_chunked


def _is_semantic(run_dp: str) -> bool:
    fp = os.path.join(run_dp, "configs", "pipeline.toml")
    return "rs_semantic" in read_toml(fp).get("pipeline", "")


def eval_all(
    input_dp: str,
    output_dp: str | None = None,
    splits=("train", "test"),
    epoch: int = -1,
    chunk: int = 16384,
):
    # orbax rejects relative checkpoint paths; anchor everything up front.
    # Validate the input BEFORE creating any output tree so a typo'd run
    # path fails fast instead of scattering empty directories.
    input_dp = os.path.abspath(input_dp)
    if not os.path.isdir(input_dp):
        raise FileNotFoundError(f"run/experiment dir not found: {input_dp}")
    env_output = os.getenv(EVAL_DP_ENV) or os.getenv(EVAL_DP_ENV_COMPAT)
    if output_dp is None and env_output:
        # env-provided target: points at a pre-created shared eval area by
        # convention — fail fast on a typo rather than creating a new tree
        output_dp = env_output
        assert os.path.isdir(output_dp), (
            f"${EVAL_DP_ENV}={output_dp} is not a directory"
        )
    if output_dp is None:
        # bare `eval <run_dp>`: keep the battery self-contained in the run
        output_dp = os.path.join(input_dp, "eval_battery")
    output_dp = os.path.abspath(output_dp)
    os.makedirs(output_dp, exist_ok=True)
    if isinstance(splits, str):
        splits = tuple(s for s in splits.split(",") if s)

    runs, output_dp = expand_input_files_for_experiments(input_dp, output_dp)
    for run_dp in runs:
        run_dp = run_dp.rstrip("/")
        run_name = os.path.basename(run_dp)
        semantic = _is_semantic(run_dp)
        pipeline, params, rcfg, step = load_run(run_dp, epoch)
        corrupted = "corrupted" in getattr(
            pipeline.cfg.pipeline, "semantic_dataset_type", ""
        )

        for split in splits:
            logger.info("EvalAll", f"{run_name} [{split}]")
            dataset = pipeline.datasets["rgb" if split == "train" else "rgb_test"]
            nerf_dp = os.path.join(output_dp, run_name, "eval", split)
            pc_dp = os.path.join(output_dp, run_name, "pointclouds", split)
            sem_dp = os.path.join(output_dp, run_name, "eval_semantic", split)
            for dp in (nerf_dp, pc_dp) + ((sem_dp,) if semantic else ()):
                os.makedirs(dp, exist_ok=True)

            start = 1 if split == "test" else 0
            nerf_results: dict = {}
            sem_results: dict = {}
            n_cls = dataset.semantic_n_classes if semantic else 0
            cm_split = np.zeros((n_cls, n_cls)) if semantic else None

            for img_idx in range(len(dataset.data)):
                img = dataset.image_item(img_idx)
                res = render_image_chunked(
                    params, rcfg, img["rays"], img["extras"], chunk=chunk
                )
                # point clouds cover every item (incl. the prepended train
                # view); metrics skip it on the test split (ref behavior)
                export_image_clouds(dataset, img, res, pc_dp, step)
                if img_idx < start:
                    continue
                nerf_results[img["name"]] = evaluate_image(
                    dataset, img, res, nerf_dp, step
                )
                if semantic:
                    entry, cm_raw = evaluate_semantic_image(
                        dataset, img, res, sem_dp, corrupted
                    )
                    cm_split += cm_raw
                    sem_results[img["name"]] = entry

            with open(os.path.join(nerf_dp, "results.json"), "w") as f:
                json.dump(_with_running_means(nerf_results), f, indent=4)
            if semantic:
                write_semantic_results(
                    sem_results, cm_split,
                    list(dataset.semantic_cls_labels.values()), sem_dp,
                )
    gather(output_dp, os.path.join(output_dp, "gathered.txt"))


def main(argv=None):
    from satnerf_tpu.eval.eval_nerf import _parse

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    args, kwargs = _parse(argv)
    eval_all(*args, **kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
