"""Pipeline classes: dataset wiring, normalization handshake, step configs.

Functional replacement for the reference's LightningModule hierarchy
(ref: framework/pipelines.py:22-235, baseline/pipelines/base_ray_pipeline.py).
A Pipeline here owns host state only (configs, datasets, run dir); all device
state lives in the TrainState threaded through the jitted step functions by
the training loop (train/loop.py).
"""

from __future__ import annotations

import os

import numpy as np

from satnerf_tpu.configs import MainConfig
from satnerf_tpu.datasets import DepthDataset, SatNeRFDataset, SemanticDataset
from satnerf_tpu.logger import logger
from satnerf_tpu.train.step import step_config_from_main


class Pipeline:
    """Base: RGB train/test datasets + normalization orchestration."""

    VARIANT = "nerf"

    def __init__(self, cfg: MainConfig) -> None:
        self.cfg = cfg
        self.datasets: dict = {}
        self.loaded = False

    # -- run dir (ref: pipelines.py:48-74) ---------------------------------
    def prepare_run(self) -> str:
        import jax

        if jax.process_count() > 1 and not self.cfg.run.run_dp:
            # timestamp+collision-suffix naming is per-process: without an
            # explicit shared run_dp each pod process would invent its own
            # run directory and the run's artifacts would scatter
            raise ValueError(
                "multi-process runs must set run.run_dp to a shared directory"
            )
        run_dp = self.cfg.create_run_dp()
        if jax.process_index() == 0:
            # pod runs: config dump + the log file belong to process 0 (the
            # same lead-writer convention as checkpoints/TB, train/loop.py)
            self.cfg.dump(os.path.join(run_dp, "configs"))
            logger.attach_file_handler(run_dp)
        logger.info("Run", f"run directory: {run_dp}")
        return run_dp

    # -- datasets (ref: pipelines.py:76-98 + base_ray_pipeline:198-243) ----
    def _rgb_dataset_cls(self):
        return SatNeRFDataset

    def _init_datasets(self) -> dict:
        cls = self._rgb_dataset_cls()
        d = {
            "rgb": cls(self.cfg, "rgb", "train"),
            "rgb_test": cls(self.cfg, "rgb", "test"),
        }
        if getattr(self.cfg.pipeline, "depth_enabled", False):
            d["depth"] = DepthDataset(self.cfg, "depth", "train")
        return d

    def load_datasets(self) -> None:
        self.datasets = self._init_datasets()
        rgb, rgb_test = self.datasets["rgb"], self.datasets["rgb_test"]
        rgb.load()
        rgb_test.load()
        combined = np.concatenate(
            [rgb.combined["rays"], rgb_test.combined["rays"]], axis=0
        )
        for ds in (rgb, rgb_test):
            ds.initialize_normalization(combined)
            ds.save_to_cache()
            ds.normalize()
        if "depth" in self.datasets:
            depth = self.datasets["depth"]
            depth.initialize_normalization()  # from the cache written above
            depth.load()
        self.loaded = True

    # -- semantic metadata (overridden by RSSemanticPipeline) --------------
    @property
    def n_classes(self) -> int:
        return 0

    @property
    def car_index(self) -> int:
        return -1

    @property
    def t_vocab(self) -> int:
        return getattr(self.cfg.pipeline, "t_embedding_vocab", 50)

    # -- visualizers --------------------------------------------------------
    def visualizers(self) -> list:
        from satnerf_tpu.viz import default_visualizers

        return default_visualizers(
            self.cfg,
            semantic=self.VARIANT == "rs_semantic",
            has_sun=self.VARIANT != "nerf",
            has_beta=self.VARIANT in ("satnerf", "rs_semantic"),
        )

    # -- step configs -------------------------------------------------------
    def step_config(self, steps_per_epoch: int, with_depth: bool | None = None):
        return step_config_from_main(
            self.cfg, steps_per_epoch, with_depth=with_depth,
            n_classes=max(self.n_classes, 1), car_index=self.car_index,
        )

    @property
    def ds_drop_step(self) -> int:
        """Step index where depth supervision stops
        (ref: baseline/pipelines/satnerf.py:27-30)."""
        p = self.cfg.pipeline
        if not getattr(p, "depth_enabled", False):
            return 0
        return int(round(p.depth_supervision_drop * self.cfg.run.max_train_steps))


class NerfPipeline(Pipeline):
    VARIANT = "nerf"


class SNerfPipeline(Pipeline):
    VARIANT = "snerf"


class SatNeRFPipeline(Pipeline):
    VARIANT = "satnerf"


class RSSemanticPipeline(Pipeline):
    """ref: semantic/pipelines/rs_semantic.py:26-123."""

    VARIANT = "rs_semantic"

    def _rgb_dataset_cls(self):
        return SemanticDataset

    def _cls_labels(self) -> dict:
        """Semantic class map without requiring loaded ray datasets: read
        from the loaded rgb dataset when present, else straight from
        root.json (cached; e.g. ``load_run(load_datasets=False)`` for
        export/serve consumers that never touch rays — the scene's
        root.json must still be reachable at the trained dataset_dp)."""
        if self.datasets:
            return self.datasets["rgb"].semantic_cls_labels
        cached = getattr(self, "_cls_labels_cache", None)
        if cached is not None:
            return cached
        from satnerf_tpu.io.json_io import read_json

        root_fp = os.path.join(self.cfg.run.dataset_dp, "root.json")
        try:
            root = read_json(root_fp)
        except FileNotFoundError as e:
            raise FileNotFoundError(
                f"semantic class map needs the scene's root.json at "
                f"{root_fp} (datasets not loaded and the trained "
                f"dataset_dp is not reachable from here)"
            ) from e
        self._cls_labels_cache = root["semantic_cls_labels"]
        return self._cls_labels_cache

    @property
    def n_classes(self) -> int:
        return len(self._cls_labels())

    @property
    def car_index(self) -> int:
        for k, v in self._cls_labels().items():
            if v == "cars":
                return int(k)
        return -1


PIPELINES = {
    "nerf": NerfPipeline,
    "snerf": SNerfPipeline,
    "satnerf": SatNeRFPipeline,
    "rs_semantic": RSSemanticPipeline,
}


def load_pipeline(cfg: MainConfig) -> Pipeline:
    """Registry-based construction (ref: framework/pipelines.py:341-352 uses
    importlib dotted paths; names and reference paths both resolve)."""
    key = cfg.pipeline.variant
    return PIPELINES[key](cfg)
