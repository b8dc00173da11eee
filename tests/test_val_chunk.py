"""Regression lock for the validation render-chunk floor (round-4 fix).

The round-4 dress rehearsal measured an 8x validation-latency cliff when the
reference's points-per-chunk memory knob (render_chunk_size=40960 / 64
samples = 640 rays) was used verbatim for full-image validation over the
remote tunnel: a 768^2 image became ~576 round trips. train/loop.py floors
the auto-derived chunk at 8192 rays (caps at 16384); an explicit
``val_chunk_rays`` wins outright as the memory escape hatch. These tests
fail if the 1024-ray floor (or an uncapped chunk) ever returns, and lock the
call-site wiring via a counted validate() pass.
"""

import dataclasses

import numpy as np
import pytest

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train import loop as train_loop
from satnerf_tpu.train.loop import Trainer, val_chunk_rays


class _Pipe:
    def __init__(self, render_chunk_size=40960, val_chunk=0):
        self.render_chunk_size = render_chunk_size
        self.val_chunk_rays = val_chunk


def test_floor_applies_to_reference_default():
    # 40960 points / 64 samples = 640 rays would be tunnel-latency-bound;
    # the floor must lift it to 8192
    assert val_chunk_rays(_Pipe(), 64) == 8192


def test_cap_at_16384():
    assert val_chunk_rays(_Pipe(render_chunk_size=64 * 1 << 20), 64) == 16384


def test_large_knob_between_floor_and_cap_passes_through():
    assert val_chunk_rays(_Pipe(render_chunk_size=12000 * 64), 64) == 12000


def test_explicit_small_chunk_wins():
    # the memory escape hatch (ADVICE r4): deliberate small chunks must not
    # be silently overridden by the floor
    assert val_chunk_rays(_Pipe(val_chunk=2048), 64) == 2048


def test_config_carries_val_chunk_rays():
    cfg = RSSemanticConfig(val_chunk_rays=4096)
    assert val_chunk_rays(cfg, cfg.n_samples) == 4096
    cfg = RSSemanticConfig()
    assert val_chunk_rays(cfg, cfg.n_samples) == 8192


def test_validate_call_site_uses_floored_chunk(tmp_path, monkeypatch):
    """The Trainer's validate() must request the floored chunk from
    render_image_chunked — counted for a synthetic 'large' image by
    intercepting the render call."""
    scene = tmp_path / "datasets" / "SYN_CHUNK"
    generate_scene(str(scene), n_train=2, n_test=1, img_size=24,
                   n_tie_points=60)
    run = RunConfig(
        dataset_name="SYN_CHUNK", datasets_dp=str(tmp_path / "datasets"),
        cache_dp=str(tmp_path / "cache"),
        workspace_dp=str(tmp_path / "training"),
        max_train_steps=2, check_val_every_n_epoch=1000,
        num_sanity_val_steps=0, seed=0,
    )
    pipe = RSSemanticConfig(
        n_samples=8, fc_layers=2, fc_units=64, fc_skips=[1], batch_size=64,
        first_beta_epoch=1000, depth_enabled=False,
    )
    cfg = MainConfig(run, pipe)
    cfg.create_run_dp()
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline, log_every=10)
    state = trainer.fit(validate_every_epoch=False)

    seen_chunks = []
    real_render = train_loop.render_image_chunked

    def counting_render(params, rcfg, rays, extras, chunk=8192, mesh=None):
        seen_chunks.append(chunk)
        return real_render(params, rcfg, rays, extras, chunk=chunk, mesh=mesh)

    monkeypatch.setattr(train_loop, "render_image_chunked", counting_render)
    scfg = pipeline.step_config(10, with_depth=False)
    trainer.validate(state, scfg, epoch=0, display_epoch=0)
    assert seen_chunks, "validate() never rendered"
    # reference-default knob (40960) at n_samples=8 derives 5120 rays; the
    # floor must lift every request to 8192 — a 768^2 image then costs ~72
    # round trips, not ~576
    assert all(c == 8192 for c in seen_chunks), seen_chunks

    # ... and the explicit escape hatch must reach the call site
    seen_chunks.clear()
    trainer.cfg.pipeline.val_chunk_rays = 512
    trainer.validate(state, scfg, epoch=0, display_epoch=0)
    assert all(c == 512 for c in seen_chunks), seen_chunks
