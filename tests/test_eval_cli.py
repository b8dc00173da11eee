"""Offline-eval battery test: train a tiny run, then run eval_nerf,
eval_semantic, point-cloud extraction and gather through the CLI surface."""

import json
import os

import numpy as np
import pytest

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    base = tmp_path_factory.mktemp("evalcli")
    scene = base / "datasets" / "SYN_EVAL"
    generate_scene(str(scene), n_train=2, n_test=1, img_size=40, n_tie_points=80)
    run = RunConfig(
        dataset_name="SYN_EVAL",
        datasets_dp=str(base / "datasets"),
        cache_dp=str(base / "cache"),
        workspace_dp=str(base / "training"),
        max_train_steps=24,
        num_sanity_val_steps=0,
    )
    pipe = RSSemanticConfig(
        n_samples=8, fc_layers=2, fc_units=64, fc_skips=[1],
        batch_size=256, render_chunk_size=4096, first_beta_epoch=1,
        depth_enabled=True,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    Trainer(pipeline, log_every=50).fit()
    return base, cfg.run.run_dp


def test_eval_nerf_cli(trained_run):
    base, run_dp = trained_run
    from satnerf_tpu.eval.eval_nerf import eval_nerf_training

    out_dp = str(base / "evalout")
    os.makedirs(out_dp, exist_ok=True)
    eval_nerf_training(run_dp, out_dp, split="test", chunk=2048)

    run_name = os.path.basename(run_dp)
    results_fp = os.path.join(out_dp, run_name, "eval", "test", "results.json")
    assert os.path.isfile(results_fp)
    with open(results_fp) as f:
        res = json.load(f)
    assert "MAE (Mean)" in res and "PSNR (Mean)" in res and "SSIM (Mean)" in res
    assert np.isfinite(float(res["MAE (Mean)"]))


def test_eval_semantic_cli(trained_run):
    base, run_dp = trained_run
    from satnerf_tpu.eval.eval_semantic import eval_semantic_nerfs

    out_dp = str(base / "evalout")
    os.makedirs(out_dp, exist_ok=True)
    eval_semantic_nerfs(run_dp, out_dp, split="test", chunk=2048)

    run_name = os.path.basename(run_dp)
    d = os.path.join(out_dp, run_name, "eval_semantic", "test")
    with open(os.path.join(d, "results.json")) as f:
        res = json.load(f)
    assert "Semantic Accuracy (Mean)" in res
    assert "mIoU (Mean)" in res
    assert 0.0 <= float(res["Semantic Accuracy (Mean)"]) <= 1.0
    assert os.path.isfile(os.path.join(d, "mean.png"))  # split confusion matrix


def test_pointcloud_cli(trained_run):
    base, run_dp = trained_run
    from satnerf_tpu.eval.extract_pointcloud import (
        create_dsm_pointcloud,
        read_ply,
    )

    out_dp = str(base / "evalout")
    create_dsm_pointcloud(
        run_dp, out_dp, split="test", chunk=2048, filter_points=500
    )
    run_name = os.path.basename(run_dp)
    pc_dp = os.path.join(out_dp, run_name, "pointclouds", "test")
    files = os.listdir(pc_dp)
    assert any(f.endswith("_filtered.ply") for f in files)
    assert any(f.endswith("_normalized.ply") for f in files)
    full = [f for f in files if f.endswith(".ply") and "filtered" not in f
            and "normalized" not in f][0]
    rec = read_ply(os.path.join(pc_dp, full))
    assert rec.shape[0] == 40 * 40
    # UTM eastings for Jacksonville are ~4xx,xxx
    assert 300000 < rec["x"].mean() < 600000


def test_gather_cli(trained_run):
    base, run_dp = trained_run
    from satnerf_tpu.eval.gather_eval import gather

    out_dp = str(base / "evalout")
    report = gather(out_dp, os.path.join(out_dp, "gathered.txt"))
    assert "PSNR" in report and "tabular" in report
    assert os.path.isfile(os.path.join(out_dp, "gathered.txt"))


def test_render_view_cli(trained_run, tmp_path):
    """Novel-view rendering with sun-angle relighting and re-dating."""
    base, run_dp = trained_run
    from satnerf_tpu.eval.render_view import render_view

    out = str(tmp_path / "views")
    res = render_view(
        run_dp, "SYN_001_001_RGB", out=out, sun_elevation=25.0,
        sun_azimuth=300.0, ts=1, chunk=2048,
    )
    assert res["rgb"].shape == (40 * 40, 3)
    files = os.listdir(out)
    assert any(f.endswith("_rgb.png") for f in files)
    assert any(f.endswith("_semantic.png") for f in files)
    assert any(f.endswith("_semantic_shaded.png") for f in files)
    assert any("sun25-300_ts1" in f for f in files)

    # relighting changes the rendered image
    res2 = render_view(
        run_dp, "SYN_001_001_RGB", out=out, sun_elevation=70.0,
        sun_azimuth=100.0, ts=1, chunk=2048,
    )
    assert float(np.abs(res2["rgb"] - res["rgb"]).mean()) > 1e-4


def test_eval_all_orchestrator(trained_run, tmp_path):
    """Single-load single-render battery produces all three result sets."""
    base, run_dp = trained_run
    from satnerf_tpu.eval.eval import eval_all

    out = str(tmp_path / "battery")
    os.makedirs(out, exist_ok=True)
    eval_all(run_dp, out, splits="test", chunk=2048)
    run_name = os.path.basename(run_dp)
    assert os.path.isfile(
        os.path.join(out, run_name, "eval", "test", "results.json")
    )
    assert os.path.isfile(
        os.path.join(out, run_name, "eval_semantic", "test", "results.json")
    )
    pcs = os.listdir(os.path.join(out, run_name, "pointclouds", "test"))
    assert len([f for f in pcs if f.endswith(".ply")]) == 8  # 2 imgs x 4 each
    assert os.path.isfile(os.path.join(out, "gathered.txt"))


def test_eval_all_bare_relative_invocation(trained_run, tmp_path, monkeypatch):
    """`eval <run_dp>` with a RELATIVE path and no output_dp works: the
    input is abspathed (orbax rejects relative checkpoint paths) and the
    battery defaults to <run_dp>/eval_battery."""
    base, run_dp = trained_run
    from satnerf_tpu.eval.eval import eval_all
    from satnerf_tpu.eval.util import EVAL_DP_ENV, EVAL_DP_ENV_COMPAT

    monkeypatch.delenv(EVAL_DP_ENV, raising=False)
    monkeypatch.delenv(EVAL_DP_ENV_COMPAT, raising=False)
    monkeypatch.chdir(os.path.dirname(run_dp))
    eval_all(os.path.basename(run_dp), splits="test", chunk=2048)
    out = os.path.join(run_dp, "eval_battery")
    run_name = os.path.basename(run_dp)
    assert os.path.isfile(
        os.path.join(out, run_name, "eval", "test", "results.json")
    )
    assert os.path.isfile(os.path.join(out, "gathered.txt"))


def test_study_cli(trained_run, tmp_path):
    """DSM study tools (ref: eval/study/*): colormapped PNG from a GeoTIFF
    band and a PLY point cloud from the GT DSM raster, via the CLI."""
    base, _run_dp = trained_run
    dsm_fp = str(base / "datasets" / "SYN_EVAL" / "SYN_001_DSM.tif")

    from satnerf_tpu.eval.study import main

    png = str(tmp_path / "dsm.png")
    ply = str(tmp_path / "dsm.ply")
    main(["tif2png", dsm_fp, png])
    main(["dsm2ply", dsm_fp, ply])

    from PIL import Image

    img = np.asarray(Image.open(png))
    assert img.ndim == 3 and img.shape[2] == 3 and img.std() > 0

    from satnerf_tpu.eval.extract_pointcloud import read_ply

    rec = read_ply(ply)
    from satnerf_tpu.io.tiff import read_geotiff

    arr, _ = read_geotiff(dsm_fp)
    assert rec.shape[0] == np.isfinite(arr[0]).sum()
    zs = rec["z"]
    assert np.nanmin(arr[0]) - 1e-3 <= zs.min() and zs.max() <= np.nanmax(arr[0]) + 1e-3


def test_eval_all_typo_path_fails_fast(tmp_path):
    """A typo'd input path raises before any output tree is created."""
    import pytest as _pytest

    from satnerf_tpu.eval.eval import eval_all

    bad = str(tmp_path / "no_such_run")
    with _pytest.raises(FileNotFoundError):
        eval_all(bad, splits="test")
    assert not os.path.exists(os.path.join(bad, "eval_battery"))


def test_eval_split_resumable_partials(trained_run, tmp_path, monkeypatch):
    """max_images batching stops early, per-image partials make the resume
    skip finished renders, and the merged results match a one-shot run."""
    base, run_dp = trained_run
    from satnerf_tpu.eval import eval as eval_mod
    from satnerf_tpu.eval.loader import load_run

    out = str(tmp_path / "battery")
    os.makedirs(out, exist_ok=True)
    pipeline, params, rcfg, step = load_run(run_dp)
    run_name = os.path.basename(run_dp)

    rendered = []
    real_render = eval_mod.render_image_chunked

    def counting_render(params, rcfg, rays, extras, chunk=16384, mesh=None):
        rendered.append(rays.shape[0])
        return real_render(params, rcfg, rays, extras, chunk=chunk, mesh=mesh)

    monkeypatch.setattr(eval_mod, "render_image_chunked", counting_render)

    done = eval_mod._eval_split(
        pipeline, params, rcfg, step, run_dp, out, "test",
        chunk=2048, max_images=1,
    )
    assert not done and len(rendered) == 1
    partial_dp = os.path.join(out, run_name, "partial", "test")
    assert len([f for f in os.listdir(partial_dp) if f.endswith(".json")]) == 1

    done = eval_mod._eval_split(
        pipeline, params, rcfg, step, run_dp, out, "test", chunk=2048,
    )
    assert done
    # image 1 was NOT re-rendered: 2 renders total for the 2-image split
    assert len(rendered) == 2
    res_fp = os.path.join(out, run_name, "eval", "test", "results.json")
    assert os.path.isfile(res_fp)
    merged = json.load(open(res_fp))
    assert any(k.startswith("mean") or "/" not in k for k in merged)

    # a partial from ANOTHER checkpoint step is stale -> re-rendered
    rendered.clear()
    done = eval_mod._eval_split(
        pipeline, params, rcfg, step + 1, run_dp, out, "test", chunk=2048,
    )
    assert done and len(rendered) == 2


def test_eval_all_subprocess_isolation(trained_run, tmp_path, monkeypatch):
    """Fresh-worker mode: eval_all spawns short-lived worker subprocesses
    (batch_images=1 => one image per client) and produces the same
    published battery artifacts."""
    base, run_dp = trained_run
    from satnerf_tpu.eval.eval import eval_all

    monkeypatch.setenv("SATNERF_EVAL_FORCE_PLATFORM", "cpu")
    out = str(tmp_path / "battery_iso")
    os.makedirs(out, exist_ok=True)
    eval_all(run_dp, out, splits="test", chunk=2048,
             isolate="subprocess", batch_images=1, stall_timeout_s=600.0)
    run_name = os.path.basename(run_dp)
    assert os.path.isfile(
        os.path.join(out, run_name, "eval", "test", "results.json")
    )
    assert os.path.isfile(
        os.path.join(out, run_name, "eval_semantic", "test", "results.json")
    )
    assert os.path.isfile(os.path.join(out, "gathered.txt"))


def test_eval_worker_stall_respawn(trained_run, tmp_path, monkeypatch):
    """A worker whose heartbeat goes stale is SIGTERMed and respawned; the
    split still completes (stall simulated via an env-gated sleep hook in a
    stub worker command)."""
    base, run_dp = trained_run
    from satnerf_tpu.eval import eval as eval_mod

    out = str(tmp_path / "battery_stall")
    run_name = os.path.basename(run_dp)
    partial_dp = eval_mod._partial_dp(out, run_name, "test")
    os.makedirs(partial_dp, exist_ok=True)

    calls = {"n": 0}
    real_popen = eval_mod.subprocess.Popen

    def fake_popen(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # first worker: hangs forever (simulated device stall)
            return real_popen(
                [sys.executable, "-c", "import time; time.sleep(600)"]
            )
        # respawn: completes the split instantly
        return real_popen([sys.executable, "-c", "import sys; sys.exit(0)"])

    import sys

    monkeypatch.setattr(eval_mod.subprocess, "Popen", fake_popen)
    eval_mod._run_split_isolated(
        run_dp, out, "test", -1, 2048, 0, stall_timeout_s=8.0,
    )
    assert calls["n"] == 2
