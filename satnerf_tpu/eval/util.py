"""Shared eval-CLI plumbing: output-dir resolution and experiment expansion.

ref: eval/utils/util.py:45-153. ``batched_inference`` lives in the render
layer as ``render_image_chunked`` (the reference's chunked no-grad render,
relocated into core per SURVEY.md §1's layering-violation note).
"""

from __future__ import annotations

import os


from satnerf_tpu.configs import read_toml
from satnerf_tpu.logger import logger
from satnerf_tpu.render.renderer import render_image_chunked as batched_inference  # noqa: F401  (reference API name, ref: eval/utils/util.py:14-42)

EVAL_DP_ENV = "SATNERF_TPU_EVAL_DP"
EVAL_DP_ENV_COMPAT = "SEMANTIC_SATNERF_EVAL_DP"  # reference name accepted too


def _is_single_training(dp: str) -> bool:
    return os.path.isdir(os.path.join(dp, "ckpoints")) or os.path.isdir(
        os.path.join(dp, "tb")
    )


def extract_experiment_category(training_dp: str) -> str | None:
    run_cfg_fp = os.path.join(training_dp, "configs", "run.toml")
    if not os.path.isfile(run_cfg_fp):
        return None
    cat = read_toml(run_cfg_fp).get("experiment_category", "")
    return "_" + cat


def expand_input_files_for_experiments(input_dp: str, output_dp: str | None = None):
    """Single run dir -> [run]; experiment dir -> its run subdirs
    (ref: util.py:45-101)."""
    input_dp = input_dp.rstrip("/")
    if _is_single_training(input_dp):
        output = [input_dp]
    else:
        output = [
            os.path.join(input_dp, name)
            for name in sorted(os.listdir(input_dp))
            if os.path.isdir(os.path.join(input_dp, name))
            and os.path.isfile(
                os.path.join(input_dp, name, "configs", "pipeline.toml")
            )
        ]
    # already sorted above; keep plain str paths (np.sort would return
    # numpy.str_ objects that then leak into run_dp values)
    if not output:
        # fail loudly: a typo'd path would otherwise make eval jobs
        # "succeed" having evaluated nothing (the reference crashes on
        # output[0] here, util.py:55)
        raise FileNotFoundError(
            f"{input_dp} is neither a run dir (ckpoints/) nor an "
            "experiment dir containing runs with configs/pipeline.toml"
        )
    category = extract_experiment_category(output[0])
    if category not in (None, "_") and output_dp is not None and output_dp != input_dp:
        output_dp = os.path.join(output_dp, category)
        os.makedirs(output_dp, exist_ok=True)
    return output, output_dp


def run_eval_script(
    run_eval_method,
    input_dp: str,
    output_dp: str | None = None,
    split: str = "test",
    epoch: int = -1,
    skip_to_exp: int = 1,
    **kwargs,
):
    """Dispatch an eval method over one run or a whole experiment folder
    (ref: util.py:104-153)."""
    if output_dp is None:
        output_dp = os.getenv(EVAL_DP_ENV) or os.getenv(EVAL_DP_ENV_COMPAT)
        assert output_dp and os.path.isdir(output_dp), (
            f"no output_dp given and ${EVAL_DP_ENV} unset"
        )
        logger.info("Setup", f"eval output dp from env: {output_dp}")
    else:
        os.makedirs(output_dp, exist_ok=True)

    inputs, output_dp = expand_input_files_for_experiments(input_dp, output_dp)
    for run_dp in inputs[skip_to_exp - 1 :]:
        run_eval_method(
            run_dp, output_dp=output_dp, split=split.lower(), epoch=epoch, **kwargs
        )
