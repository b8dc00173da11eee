"""Config system tests: TOML round trip, registry incl. reference dotted
paths, ablation run-name postfixes, template bootstrap."""

import os

import pytest

from satnerf_tpu.configs import (
    MainConfig,
    PIPELINE_REGISTRY,
    RSSemanticConfig,
    RunConfig,
    load_configs,
    read_toml,
    write_toml,
)


def test_toml_roundtrip(tmp_path):
    d = {"a": 1, "b": 2.5, "c": True, "d": "x\"y", "e": [1, 2, 3], "f": "s"}
    fp = str(tmp_path / "x.toml")
    write_toml(fp, d)
    back = read_toml(fp)
    assert back == d


def test_reference_dotted_paths_resolve():
    assert (
        PIPELINE_REGISTRY["semantic.pipelines.rs_semantic.RSSemanticPipeline"]
        is RSSemanticConfig
    )
    assert PIPELINE_REGISTRY["baseline.pipelines.satnerf.SatNeRFPipeline"]


def test_load_configs_with_reference_style_pipeline_toml(tmp_path):
    run_fp = str(tmp_path / "run.toml")
    pipe_fp = str(tmp_path / "pipeline.toml")
    write_toml(run_fp, {"dataset_name": "X", "max_train_steps": 10})
    with open(pipe_fp, "w") as f:
        f.write(
            'pipeline = "semantic.pipelines.rs_semantic.RSSemanticPipeline"\n'
            "n_samples = 32\nlambda_s = 0.08\n"
            "unknown_key_from_future = 1\n"  # tolerated, filtered
        )
    cfg = load_configs(run_fp, pipe_fp)
    assert cfg.pipeline.variant == "rs_semantic"
    assert cfg.pipeline.n_samples == 32
    assert cfg.pipeline.lambda_s == 0.08


def test_template_bootstrap(tmp_path):
    run_fp = str(tmp_path / "missing" / "run.toml")
    with pytest.raises(SystemExit):
        load_configs(run_fp, run_fp)
    assert os.path.isfile(run_fp)  # template copied for editing


def test_ablation_postfix_in_run_name():
    cfg = MainConfig(
        RunConfig(dataset_name="JAX_068"),
        RSSemanticConfig(
            use_car_reg_loss=True, lambda_c=0.5, use_beta_for_s=True,
            sparsity_n_images=3, semantic_dataset_type="own_corrupted",
        ),
    )
    name = cfg.create_run_name()
    assert "own_corrupted" in name
    assert "sparsity3" in name
    assert "beta_for_s" in name
    assert "car_reg0.5" in name
    assert "JAX_068" in name and "rs_semantic" in name


def test_epoch_subsampling_wiring():
    from satnerf_tpu.train.data import EpochSampler

    s = EpochSampler(1000, 50, seed=0, subsample=200)
    assert s.epoch_size == 200
    assert s.steps_per_epoch == 4
    batches = [s.next_batch() for _ in range(4)]
    seen = set()
    for b in batches:
        seen.update(b.tolist())
    assert len(seen) == 200


def test_run_dir_collision_gets_suffix(tmp_path):
    cfg1 = MainConfig(
        RunConfig(dataset_name="X", workspace_dp=str(tmp_path), run_name="same"),
        RSSemanticConfig(),
    )
    cfg2 = MainConfig(
        RunConfig(dataset_name="X", workspace_dp=str(tmp_path), run_name="same"),
        RSSemanticConfig(),
    )
    dp1 = cfg1.create_run_dp()
    dp2 = cfg2.create_run_dp()
    assert dp1 != dp2 and dp2.endswith("_1")
    # idempotent: second call returns the same dir
    assert cfg1.create_run_dp() == dp1


def test_toml_escapes_control_chars(tmp_path):
    fp = str(tmp_path / "x.toml")
    write_toml(fp, {"a": "line1\nline2\twith\ttabs"})
    assert read_toml(fp)["a"] == "line1\nline2\twith\ttabs"


def test_antimeridian_zone():
    from satnerf_tpu.geo.utm import latlon_to_zone_number

    assert latlon_to_zone_number(10.0, 180.0) == 1
    assert latlon_to_zone_number(10.0, 179.9) == 60
