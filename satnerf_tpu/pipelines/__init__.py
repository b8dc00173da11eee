"""Pipelines: wire datasets + field + renderer + losses + visualizers per
variant (ref class chain: baseline/pipelines/{nerf,snerf,satnerf}.py,
semantic/pipelines/rs_semantic.py)."""

from satnerf_tpu.pipelines.base import (  # noqa: F401
    NerfPipeline,
    Pipeline,
    RSSemanticPipeline,
    SatNeRFPipeline,
    SNerfPipeline,
    load_pipeline,
)
