"""Dataset-construction config (ref: data_prep/utils/dataset_config.py:82-147).

TOML file with a [general] section and [[steps]] entries; template bootstrap
copies dataset_template.toml on first run.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pydantic import BaseModel

from satnerf_tpu.configs import read_toml
from satnerf_tpu.logger import logger


class StepConfig(BaseModel):
    file: str  # registry name or dotted module path with ProcessingStep
    enabled: bool = True
    from_dir: Optional[str] = None
    params: dict = {}


class GeneralConfig(BaseModel):
    aoi_name: str = "JAX_068"
    lazy: bool = True
    # inputs (DFC2019 Track-3 distribution layout)
    dfc_rgb_dp: str = ""
    dfc_truth_dp: str = ""
    dfc_metadata_dp: str = ""
    ignore_masks_dp: Optional[str] = None
    semantic_masks_dp: Optional[str] = None
    # output dataset dir
    output_dp: str = ""
    zone_string: str = "17R"
    alt_min: Optional[float] = None
    alt_max: Optional[float] = None
    # splits: "predefined" (SatNeRF test files) | "random" | "fixed" | "custom"
    split_mode: str = "predefined"
    n_test: int = 2
    custom_test_files: list[str] = []
    seed: int = 0


class DatasetConfig(BaseModel):
    general: GeneralConfig = GeneralConfig()
    steps: list[StepConfig] = []


_TEMPLATE = os.path.join(os.path.dirname(__file__), "dataset_template.toml")


def load_dataset_config(cfg_fp: str) -> DatasetConfig:
    if not os.path.isfile(cfg_fp):
        os.makedirs(os.path.dirname(cfg_fp) or ".", exist_ok=True)
        shutil.copy(_TEMPLATE, cfg_fp)
        logger.info(
            "DataPrep",
            f"No dataset config found; template copied to {cfg_fp}. Edit and re-run.",
        )
        raise SystemExit(0)
    d = read_toml(cfg_fp)
    return DatasetConfig(
        general=GeneralConfig(**d.get("general", {})),
        steps=[StepConfig(**s) for s in d.get("steps", [])],
    )
