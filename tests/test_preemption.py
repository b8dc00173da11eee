"""Graceful-preemption test: SIGTERM mid-training checkpoints and exits
cleanly; resume continues from the stop point."""

import os
import signal
import threading

import pytest

from satnerf_tpu.configs import MainConfig, SatNeRFConfig, RunConfig
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


def test_sigterm_checkpoints_and_resumes(tmp_path):
    generate_scene(
        str(tmp_path / "ds" / "SYN_SIG"), n_train=2, n_test=1, img_size=32,
        n_tie_points=60,
    )
    run = RunConfig(
        dataset_name="SYN_SIG", datasets_dp=str(tmp_path / "ds"),
        cache_dp=str(tmp_path / "cache"), workspace_dp=str(tmp_path / "train"),
        max_train_steps=10_000, num_sanity_val_steps=0,
    )
    pipe = SatNeRFConfig(
        n_samples=4, fc_layers=2, fc_units=32, fc_skips=[1], batch_size=128,
        depth_enabled=False, render_chunk_size=2048,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline, log_every=1000)

    # deliver SIGTERM once training is measurably underway (setup + first
    # compile can take ~20s on CPU)
    timer = threading.Timer(25.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state = trainer.fit(validate_every_epoch=False)
    finally:
        timer.cancel()

    stopped_at = int(state.step)
    assert stopped_at < 10_000, "run should have been interrupted"
    assert os.path.isdir(os.path.join(cfg.run.run_dp, "ckpoints", "last"))

    # resume continues from the stop point
    cfg.run.resume_from_ckpoint = True
    trainer2 = Trainer(pipeline, log_every=1000)
    state2 = trainer2.fit(
        max_steps=stopped_at + 5, validate_every_epoch=False
    )
    assert int(state2.step) == stopped_at + 5


def test_warm_start_from_explicit_ckpoint_fp(tmp_path):
    """run.ckpoint_fp warm-starts a NEW run from another run's checkpoint."""
    from satnerf_tpu.configs import MainConfig, SatNeRFConfig, RunConfig
    from satnerf_tpu.datasets.synthetic import generate_scene
    from satnerf_tpu.pipelines import load_pipeline
    from satnerf_tpu.train.loop import Trainer

    generate_scene(str(tmp_path / "ds" / "SYN_WS"), n_train=2, n_test=1,
                   img_size=32, n_tie_points=60)
    base_run = dict(
        dataset_name="SYN_WS", datasets_dp=str(tmp_path / "ds"),
        cache_dp=str(tmp_path / "cache"), num_sanity_val_steps=0,
    )
    pipe = SatNeRFConfig(
        n_samples=4, fc_layers=2, fc_units=32, fc_skips=[1], batch_size=128,
        depth_enabled=False, render_chunk_size=2048,
    )

    cfg1 = MainConfig(
        RunConfig(**base_run, workspace_dp=str(tmp_path / "t1"),
                  max_train_steps=5),
        pipe,
    )
    p1 = load_pipeline(cfg1)
    p1.prepare_run()
    p1.load_datasets()
    Trainer(p1, log_every=50).fit(validate_every_epoch=False)
    donor_ckpt = os.path.join(cfg1.run.run_dp, "ckpoints", "last")

    cfg2 = MainConfig(
        RunConfig(**base_run, workspace_dp=str(tmp_path / "t2"),
                  max_train_steps=8, resume_from_ckpoint=True,
                  ckpoint_fp=donor_ckpt),
        pipe,
    )
    p2 = load_pipeline(cfg2)
    p2.prepare_run()
    p2.load_datasets()
    state = Trainer(p2, log_every=50).fit(validate_every_epoch=False)
    # resumed from step 5 of the donor, continued to 8 in the new run dir
    import jax

    assert int(jax.device_get(state.step)) == 8
    assert cfg2.run.run_dp != cfg1.run.run_dp


def test_resume_trajectory_matches_uninterrupted(tmp_path):
    """Same seed: interrupt + resume must land on EXACTLY the same params as
    an uninterrupted run (sampler fast-forward + step-indexed PRNG keys)."""
    import numpy as np

    import jax

    generate_scene(
        str(tmp_path / "ds" / "SYN_DET"), n_train=2, n_test=1, img_size=32,
        n_tie_points=60,
    )

    def make_cfg(workspace):
        run = RunConfig(
            dataset_name="SYN_DET", datasets_dp=str(tmp_path / "ds"),
            cache_dp=str(tmp_path / "cache"),
            workspace_dp=str(tmp_path / workspace),
            max_train_steps=36, num_sanity_val_steps=0, seed=3,
        )
        pipe = SatNeRFConfig(
            n_samples=4, fc_layers=2, fc_units=32, fc_skips=[1],
            batch_size=128, depth_enabled=True, render_chunk_size=2048,
            first_beta_epoch=1,
        )
        return MainConfig(run, pipe)

    # uninterrupted run: 36 steps (crosses epoch boundaries at 16 rays*128)
    cfg_a = make_cfg("train_a")
    pa = load_pipeline(cfg_a)
    pa.prepare_run()
    pa.load_datasets()
    state_a = Trainer(pa, log_every=1000).fit(validate_every_epoch=False)
    assert int(state_a.step) == 36

    # interrupted at 20, resumed to 36
    cfg_b = make_cfg("train_b")
    pb = load_pipeline(cfg_b)
    pb.prepare_run()
    pb.load_datasets()
    state_b1 = Trainer(pb, log_every=1000).fit(
        max_steps=20, validate_every_epoch=False
    )
    assert int(state_b1.step) == 20
    cfg_b.run.resume_from_ckpoint = True
    state_b = Trainer(pb, log_every=1000).fit(validate_every_epoch=False)
    assert int(state_b.step) == 36

    flat_a = jax.flatten_util.ravel_pytree(state_a.params)[0]
    flat_b = jax.flatten_util.ravel_pytree(state_b.params)[0]
    np.testing.assert_allclose(
        np.asarray(flat_a), np.asarray(flat_b), atol=1e-6,
        err_msg="resumed trajectory diverged from the uninterrupted run",
    )


def test_resume_reapplies_matmul_precision(tmp_path):
    """Resumed sessions and offline eval must run at the run's configured
    matmul precision (regression: the 30k-run interrupted-vs-uninterrupted
    comparison showed a 0.02 dB validation shift across a resume boundary
    because only the fresh-start CLI applied it)."""
    import jax

    from satnerf_tpu.run.resume_training import resume

    generate_scene(
        str(tmp_path / "ds" / "SYN_PRE"), n_train=2, n_test=1, img_size=32,
        n_tie_points=60,
    )
    run = RunConfig(
        dataset_name="SYN_PRE", datasets_dp=str(tmp_path / "ds"),
        cache_dp=str(tmp_path / "cache"), workspace_dp=str(tmp_path / "train"),
        max_train_steps=4, num_sanity_val_steps=0,
        matmul_precision="highest",
    )
    pipe = SatNeRFConfig(
        n_samples=4, fc_layers=2, fc_units=32, fc_skips=[1], batch_size=128,
        depth_enabled=False, render_chunk_size=2048,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    state = Trainer(pipeline, log_every=1000).fit(validate_every_epoch=False)
    from satnerf_tpu.train.checkpoint import CheckpointManager

    CheckpointManager(cfg.run.run_dp).save_last(state)

    before = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "default")
        resume(cfg.run.run_dp)  # already at max steps: applies cfg + exits
        assert str(jax.config.jax_default_matmul_precision) == "highest"

        jax.config.update("jax_default_matmul_precision", "default")
        from satnerf_tpu.eval.loader import load_run

        _, _, rcfg, _ = load_run(cfg.run.run_dp, load_datasets=False)
        assert str(jax.config.jax_default_matmul_precision) == "highest"
        # inference rendering must not pay for the training-only
        # solar-correction ray pass (~1.9x render time)
        assert rcfg.solar_correction is False
    finally:
        jax.config.update("jax_default_matmul_precision", before)
