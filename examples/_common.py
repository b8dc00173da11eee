"""Shared helper for the runnable examples: a tiny trained run.

Every example is self-sufficient and CPU-friendly: the first one to run
trains a small RS-Semantic model on a generated synthetic scene (full
root.json layout, ~1 min on CPU) and later examples reuse the run
directory. Set SATNERF_EXAMPLES_OUT to relocate the workspace.
"""

from __future__ import annotations

import glob
import os
import sys

# allow `python examples/01_....py` from a checkout without pip-installing
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# honor JAX_PLATFORMS even where a site-installed PJRT plugin overrides the
# env var (tests/conftest.py uses the same double-force): the README's
# `JAX_PLATFORMS=cpu python examples/...` must actually mean cpu
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def example_workspace() -> str:
    return os.environ.get(
        "SATNERF_EXAMPLES_OUT", os.path.join("/tmp", "satnerf_examples")
    )


def get_or_train_run(steps: int | None = None) -> str:
    """Return a trained run directory, training one if none exists.

    ``SATNERF_EXAMPLES_STEPS`` / ``SATNERF_EXAMPLES_IMG`` shrink the run
    (used by the test suite's examples smoke test).
    """
    steps = steps or int(os.environ.get("SATNERF_EXAMPLES_STEPS", 300))
    img = int(os.environ.get("SATNERF_EXAMPLES_IMG", 48))
    base = example_workspace()
    runs = sorted(glob.glob(os.path.join(base, "training", "*_rs_semantic*")))
    for run_dp in reversed(runs):
        if os.path.isdir(os.path.join(run_dp, "ckpoints", "last")):
            return run_dp

    from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
    from satnerf_tpu.datasets.synthetic import generate_scene
    from satnerf_tpu.pipelines import load_pipeline
    from satnerf_tpu.train.loop import Trainer

    scene_dp = os.path.join(base, "datasets", "SYN_EX")
    if not os.path.isdir(scene_dp):
        generate_scene(scene_dp, n_train=3, n_test=1, img_size=img,
                       n_tie_points=120)

    run = RunConfig(
        dataset_name="SYN_EX",
        datasets_dp=os.path.join(base, "datasets"),
        cache_dp=os.path.join(base, "cache"),
        workspace_dp=os.path.join(base, "training"),
        max_train_steps=steps,
        check_val_every_n_epoch=50,
        num_sanity_val_steps=0,
        seed=0,
    )
    pipe = RSSemanticConfig(
        n_samples=8, fc_layers=2, fc_units=128, fc_skips=[1],
        batch_size=512, render_chunk_size=4096, first_beta_epoch=1,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    Trainer(pipeline, log_every=100).fit()  # checkpoints "last" on finish
    return cfg.run.run_dp
