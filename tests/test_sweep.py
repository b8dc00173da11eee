"""Experiment sweep runner tests: config derivation, round-robin assignment,
launch script, and an actual in-process sweep execution."""

import os

import pytest

from satnerf_tpu.configs import read_toml
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.run.automated_training import (
    assign_round_robin,
    create_launch_script,
    launch,
    prepare,
)


@pytest.fixture(scope="module")
def sweep_setup(tmp_path_factory):
    base = tmp_path_factory.mktemp("sweep")
    generate_scene(
        str(base / "datasets" / "SYN_SWEEP"), n_train=2, n_test=1, img_size=32,
        n_tie_points=60,
    )
    cfg_dp = base / "cfgs"
    os.makedirs(cfg_dp)
    with open(cfg_dp / "run.toml", "w") as f:
        f.write(
            f'max_train_steps = 4\nnum_sanity_val_steps = 0\n'
            f'dataset_name = "SYN_SWEEP"\n'
            f'datasets_dp = "{base / "datasets"}"\n'
            f'cache_dp = "{base / "cache"}"\n'
            f'workspace_dp = "{base / "training"}"\n'
        )
    with open(cfg_dp / "satnerf.toml", "w") as f:
        f.write(
            'pipeline = "satnerf"\nn_samples = 4\nfc_layers = 2\nfc_units = 32\n'
            "fc_skips = [1]\nbatch_size = 128\ndepth_enabled = false\n"
            "render_chunk_size = 2048\n"
        )
    with open(cfg_dp / "experiment.toml", "w") as f:
        f.write(
            'run_cfg = "run.toml"\n'
            'experiment_category = "demo"\n'
            "[pipeline]\n"
            "n_samples = 4\n"
            "[run]\n"
            "max_train_steps = 4\n"
            "[[experiments]]\n"
            'pipeline_name = "satnerf.toml"\nid = "1a"\n'
            "[experiments.pipeline]\nsc_lambda = 0.0\n"
            "[[experiments]]\n"
            'pipeline_name = "satnerf.toml"\nid = "2a"\n'
            "[experiments.pipeline]\nsc_lambda = 0.05\n"
        )
    return base, str(cfg_dp / "experiment.toml")


def test_prepare_derives_configs(sweep_setup, tmp_path):
    base, exp_fp = sweep_setup
    out_dp = str(tmp_path / "out")
    ids = prepare(exp_fp, out_dp)
    assert ids == ["1a", "2a"]
    p1 = read_toml(os.path.join(out_dp, "1a", "pipeline.toml"))
    p2 = read_toml(os.path.join(out_dp, "2a", "pipeline.toml"))
    assert p1["sc_lambda"] == 0.0 and p2["sc_lambda"] == 0.05
    r1 = read_toml(os.path.join(out_dp, "1a", "run.toml"))
    assert r1["run_name_postfix"].endswith("_exp1a")
    assert "demo" in r1["experiment_category"]


def test_round_robin():
    assert assign_round_robin(["a", "b", "c"], 2) == [["a", "c"], ["b"]]
    assert assign_round_robin(["a"], 4)[0] == ["a"]


def test_launch_script(sweep_setup, tmp_path):
    base, exp_fp = sweep_setup
    out_dp = str(tmp_path / "out")
    fp = launch(exp_fp, out_dp, workers=2, script_only="true")
    with open(fp) as f:
        content = f.read()
    assert "start_assigned_ids_from_automated" in content
    assert os.access(fp, os.X_OK)


def test_launch_runs_experiments(sweep_setup, tmp_path):
    base, exp_fp = sweep_setup
    out_dp = str(tmp_path / "out")
    launch(exp_fp, out_dp, workers=1)
    # both experiments trained: run dirs exist under the experiment category
    training_dp = base / "training" / "_demo" / "experiment"
    runs = os.listdir(training_dp)
    assert any("exp1a" in r for r in runs)
    assert any("exp2a" in r for r in runs)
    for r in runs:
        assert os.path.isdir(training_dp / r / "ckpoints" / "last")
