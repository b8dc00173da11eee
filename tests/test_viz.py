"""Visualizer suite tests: every visualizer produces valid output on a
rendered synthetic image, GeoTIFF export works, and the run_visualizer CLI
regenerates outputs from a checkpoint."""

import os

import numpy as np
import pytest

from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
from satnerf_tpu.datasets.synthetic import generate_scene
from satnerf_tpu.pipelines import load_pipeline
from satnerf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    base = tmp_path_factory.mktemp("viz")
    generate_scene(
        str(base / "datasets" / "SYN_VIZ"), n_train=2, n_test=1, img_size=32,
        n_tie_points=60,
    )
    run = RunConfig(
        dataset_name="SYN_VIZ", datasets_dp=str(base / "datasets"),
        cache_dp=str(base / "cache"), workspace_dp=str(base / "training"),
        max_train_steps=8, num_sanity_val_steps=0,
    )
    pipe = RSSemanticConfig(
        n_samples=8, fc_layers=2, fc_units=64, fc_skips=[1], batch_size=256,
        render_chunk_size=2048, depth_enabled=False,
    )
    cfg = MainConfig(run, pipe)
    pipeline = load_pipeline(cfg)
    pipeline.prepare_run()
    pipeline.load_datasets()
    trainer = Trainer(pipeline, log_every=50)
    state = trainer.fit(validate_every_epoch=False)
    from satnerf_tpu.train.checkpoint import CheckpointManager

    CheckpointManager(cfg.run.run_dp).save_last(state)
    return base, pipeline, state


def test_all_visualizers_produce_output(trained):
    base, pipeline, state = trained
    import jax

    from satnerf_tpu.render.renderer import render_image_chunked

    scfg = pipeline.step_config(4, with_depth=False)
    dataset = pipeline.datasets["rgb_test"]
    item = dataset.image_item(1)
    params = jax.device_get(state.params)
    res = render_image_chunked(
        params, scfg.render, item["rays"], item["extras"], chunk=1024
    )

    visualizers = pipeline.visualizers()
    names = {v._name() for v in visualizers}
    # the full reference suite is registered
    assert {
        "gt_pred_depth", "rgb", "depth", "albedo", "sun", "beta",
        "semantic_rendering", "semantic_rendering_shaded", "semantic_error",
        "semantic_summary", "semantic_class_overview", "confusion_matrix",
        "alts", "RGB_Diff_Distance",
    } <= names

    produced = {}
    for viz in visualizers:
        out = viz._visualize(dataset, item, res, item["w"], item["h"])
        assert out is not None, viz._name()
        produced[viz._name()] = np.asarray(out)

    h, w = item["h"], item["w"]
    assert produced["semantic_rendering"].shape == (3, h, w)
    assert produced["alts"].shape == (h, w)
    # shaded rendering darker or equal to flat class colors
    assert (
        produced["semantic_rendering_shaded"].astype(int).sum()
        <= produced["semantic_rendering"].astype(int).sum()
    )
    assert produced["gt_pred_depth"].shape[0] == 3  # stack of 3 panels


def test_save_as_tif_with_rpc(trained, tmp_path):
    base, pipeline, state = trained
    import jax

    from satnerf_tpu.io.tiff import read_geotiff
    from satnerf_tpu.render.renderer import render_image_chunked
    from satnerf_tpu.viz.baseline_viz import FactorVisualization

    scfg = pipeline.step_config(4, with_depth=False)
    dataset = pipeline.datasets["rgb_test"]
    item = dataset.image_item(1)
    res = render_image_chunked(
        jax.device_get(state.params), scfg.render, item["rays"], item["extras"],
        chunk=1024,
    )
    viz = FactorVisualization(pipeline.cfg, False, True, "depth")
    viz.run(dataset, item, res, split="test", epoch=3, run_dp=str(tmp_path),
            source_fp=item["img_fp"])
    out_fp = os.path.join(
        str(tmp_path), "visualization", "test", "depth",
        f"{item['name']}_epoch_3.tif",
    )
    arr, prof = read_geotiff(out_fp)
    assert arr.shape == (1, item["h"], item["w"])
    assert prof.rpc is not None  # RPC tags copied from the source image


def test_run_visualizer_cli(trained):
    base, pipeline, state = trained
    from satnerf_tpu.viz.visualize import run_visualizer

    run_dp = pipeline.cfg.run.run_dp
    run_visualizer(run_dp, split="test", chunk=1024)
    viz_dp = os.path.join(run_dp, "visualization", "test")
    subdirs = os.listdir(viz_dp)
    assert "semantic_rendering" in subdirs
    assert "rgb" in subdirs


def test_extract_cls_viz(trained, tmp_path):
    base, _, _ = trained
    from satnerf_tpu.viz.extract_cls_viz import extract_cls_viz

    cls_fp = str(base / "datasets" / "SYN_VIZ" / "semantic_own" / "SYN_001_000_CLS.tif")
    out = extract_cls_viz(cls_fp, str(tmp_path / "cls.png"))
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3)
