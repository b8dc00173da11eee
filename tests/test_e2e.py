"""End-to-end smoke: synthetic scene -> RS-Semantic training loop ->
validation with DSM MAE -> checkpoint -> resume. The miniature version of
SURVEY.md §7 step 5."""

import os

import numpy as np
import pytest

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e")
    scene = base / "datasets" / "SYN_E2E"
    generate_scene(str(scene), n_train=2, n_test=1, img_size=40, n_tie_points=80)
    return base


def _cfg(base, **pipe_overrides):
    run = RunConfig(
        dataset_name="SYN_E2E",
        datasets_dp=str(base / "datasets"),
        cache_dp=str(base / "cache"),
        workspace_dp=str(base / "training"),
        max_train_steps=40,
        check_val_every_n_epoch=1,
        num_sanity_val_steps=1,
        seed=0,
    )
    pipe = RSSemanticConfig(
        n_samples=8, fc_layers=2, fc_units=64, fc_skips=[1],
        batch_size=256, render_chunk_size=4096, first_beta_epoch=1,
        depth_enabled=True, use_car_reg_loss=True, car_reg_loss_start=2,
        **pipe_overrides,
    )
    return MainConfig(run, pipe)


def test_full_training_run(workspace):
    cfg = _cfg(workspace)
    pipeline = load_pipeline(cfg)
    assert type(pipeline).__name__ == "RSSemanticPipeline"
    pipeline.prepare_run()
    pipeline.load_datasets()
    assert pipeline.n_classes == 5
    assert pipeline.car_index == 4

    trainer = Trainer(pipeline, log_every=10)
    state = trainer.fit()
    assert int(state.step) == 40

    run_dp = cfg.run.run_dp
    # configs dumped for reload
    assert os.path.isfile(os.path.join(run_dp, "configs", "run.toml"))
    assert os.path.isfile(os.path.join(run_dp, "configs", "pipeline.toml"))
    # checkpoints written
    assert os.path.isdir(os.path.join(run_dp, "ckpoints", "last"))
    # DSM outputs produced during validation
    dsm_dp = os.path.join(run_dp, "visualization", "train", "dsm")
    assert any(f.endswith(".tif") for f in os.listdir(dsm_dp))
    # training metrics recorded and finite
    assert len(trainer.history) > 0
    assert np.isfinite(trainer.history[-1]["loss"])

    # validation after training produces sane metrics
    scfg = pipeline.step_config(10, with_depth=False)
    val = trainer.validate(state, scfg, epoch=4, display_epoch=5)
    assert "train/mae" in val
    assert np.isfinite(val["train/mae"])


def test_resume_from_checkpoint(workspace):
    cfg = _cfg(workspace)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline, log_every=50)
    state = trainer.fit(max_steps=20, validate_every_epoch=False)
    assert int(state.step) == 20

    # resume: same run dir, restore last, continue to 30
    cfg.run.resume_from_ckpoint = True
    trainer2 = Trainer(pipeline, log_every=50)
    state2 = trainer2.fit(max_steps=30, validate_every_epoch=False)
    assert int(state2.step) == 30


def test_reload_configs_from_logs(workspace):
    from satnerf_tpu.configs import load_configs_from_logs

    cfg = _cfg(workspace)
    pipeline = load_pipeline(cfg)
    run_dp = pipeline.prepare_run()
    reloaded = load_configs_from_logs(run_dp)
    assert reloaded.pipeline.variant == "rs_semantic"
    assert reloaded.pipeline.n_samples == 8
    assert reloaded.run.dataset_name == "SYN_E2E"


def test_deterministic_runs_reproduce(workspace):
    """Same seed -> identical training trajectory (the determinism contract
    run/training.py documents: all randomness flows from run.seed)."""
    import jax

    def run_once(ws_name):
        cfg = _cfg(workspace)
        cfg.run.workspace_dp = str(workspace / ws_name)
        cfg.run.num_sanity_val_steps = 0
        pipeline = load_pipeline(cfg)
        pipeline.prepare_run()
        pipeline.load_datasets()
        trainer = Trainer(pipeline, log_every=20)
        state = trainer.fit(max_steps=20, validate_every_epoch=False)
        return trainer.history[-1]["loss"], np.asarray(
            jax.device_get(state.params["field"]["trunk"][0]["w"])
        )

    loss1, w1 = run_once("det1")
    loss2, w2 = run_once("det2")
    assert loss1 == loss2
    np.testing.assert_array_equal(w1, w2)


def test_steps_per_dispatch_invariance(workspace):
    """K scanned steps per dispatch must produce EXACTLY the same training
    trajectory as per-step dispatch (fold_in(run_key, step) key stream)."""
    import jax

    def run(spd):
        cfg = _cfg(workspace)
        cfg.run.steps_per_dispatch = spd
        cfg.run.max_train_steps = 12
        cfg.run.num_sanity_val_steps = 0
        pipeline = load_pipeline(cfg)
        pipeline.prepare_run()
        pipeline.load_datasets()
        trainer = Trainer(pipeline, log_every=4)
        state = trainer.fit(validate_every_epoch=False)
        return state, trainer.history

    st1, h1 = run(1)
    st4, h4 = run(4)
    assert int(st1.step) == int(st4.step) == 12
    losses1 = [h["loss"] for h in h1]
    losses4 = [h["loss"] for h in h4]
    np.testing.assert_allclose(losses1, losses4, rtol=1e-6)
    diffs = jax.tree.map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        st1.params, st4.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_step_callbacks_fire_at_exact_steps(workspace):
    """step_callbacks land on their exact global step even when the loop
    dispatches scanned blocks (spd>1), and callback time never corrupts the
    trajectory (same final state as a run without callbacks)."""
    import jax

    def run(callbacks):
        cfg = _cfg(workspace)
        cfg.run.steps_per_dispatch = 4
        cfg.run.max_train_steps = 14
        cfg.run.num_sanity_val_steps = 0
        pipeline = load_pipeline(cfg)
        pipeline.prepare_run()
        pipeline.load_datasets()
        trainer = Trainer(pipeline, log_every=50)
        state = trainer.fit(
            validate_every_epoch=False, step_callbacks=callbacks
        )
        return state

    seen = []

    def cb(state, step):
        seen.append((step, int(jax.device_get(state.step))))

    state_cb = run({6: cb, 10: cb, 99: cb})  # 99 > max_steps: ignored
    assert seen == [(6, 6), (10, 10)]
    state_plain = run(None)
    diffs = jax.tree.map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        state_cb.params, state_plain.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
