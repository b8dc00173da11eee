"""Visualization: TensorBoard image panels + GeoTIFF exports per validation
image, plus the standalone re-run CLI."""

from satnerf_tpu.viz.visualize import ImageVisualization, run_visualizer  # noqa: F401
from satnerf_tpu.viz import baseline_viz, experimental_viz, semantic_viz  # noqa: F401
from satnerf_tpu.viz.visualize import default_visualizers  # noqa: F401
