"""Novel-view rendering from a trained checkpoint.

Renders arbitrary viewpoints (any RPC camera meta JSON), with optional
overrides of the sun direction (relighting through the irradiance model) and
the transient embedding index (re-dating) — the novel-view semantic rendering
sweep evaluated in the paper. Outputs RGB / depth / semantic-class /
shaded-semantic PNGs and optional GeoTIFFs.

CLI:
    python -m satnerf_tpu.eval.render_view <run_dp> <meta.json|view_name>
        [--out out_dir] [--sun_elevation E] [--sun_azimuth A] [--ts N]
        [--chunk 16384]
"""

from __future__ import annotations

import os
import sys

import numpy as np

from satnerf_tpu.core.rays import build_rays_from_rpc, construct_sun_dir
from satnerf_tpu.datasets.satnerf_dataset import construct_rpc_camera_model
from satnerf_tpu.eval.loader import load_run
from satnerf_tpu.io.json_io import read_json
from satnerf_tpu.logger import logger
from satnerf_tpu.render.renderer import render_image_chunked
from satnerf_tpu.viz.colormaps import apply_colormap


def build_view_rays(dataset, meta: dict, sun_elevation: float | None = None,
                    sun_azimuth: float | None = None, ts: int = 0):
    """Build normalized rays + extras for an arbitrary RPC view meta.

    Returns (rays, extras, w, h, sun_elevation, sun_azimuth) — the inputs
    ``render_image_chunked`` needs for a full-image render of the view.
    """
    w, h = int(meta["width"]), int(meta["height"])
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    rays = build_rays_from_rpc(
        construct_rpc_camera_model(meta),
        dataset.coordinate_system,
        rows=rows,
        cols=cols,
        min_alt=float(meta["min_alt"]),
        max_alt=float(meta["max_alt"]),
    )
    rays = dataset.normalization.normalize_rays(rays)

    el = sun_elevation if sun_elevation is not None else float(meta["sun_elevation"])
    az = sun_azimuth if sun_azimuth is not None else float(meta["sun_azimuth"])
    sun_dirs = construct_sun_dir(el, az, rays.shape[0])
    extras = np.concatenate(
        [sun_dirs, np.full((rays.shape[0], 1), float(ts), np.float32)], axis=1
    )
    return rays, extras, w, h, el, az


def render_view(
    input_dp: str,
    meta_fp: str,
    out: str | None = None,
    sun_elevation: float | None = None,
    sun_azimuth: float | None = None,
    ts: int = 0,
    chunk: int = 16384,
    save_tif: bool = False,
):
    """Render one novel view; returns the results dict."""
    from PIL import Image

    pipeline, params, rcfg, step = load_run(input_dp)
    dataset = pipeline.datasets["rgb"]

    if not os.path.isfile(meta_fp):
        # allow bare view names from the dataset ("SYN_001_002_RGB")
        meta_fp = os.path.join(dataset.meta_dp, meta_fp + ".json")
    meta = read_json(meta_fp)
    rays, extras, w, h, el, az = build_view_rays(
        dataset, meta, sun_elevation, sun_azimuth, ts
    )

    res = render_image_chunked(params, rcfg, rays, extras, chunk=chunk)

    out = out or os.path.join(input_dp, "novel_views")
    os.makedirs(out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(meta_fp))[0]
    stem += f"_sun{el:.0f}-{az:.0f}_ts{int(ts)}_step{step}"

    rgb = np.clip(res["rgb"].reshape(h, w, 3) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(rgb).save(os.path.join(out, stem + "_rgb.png"))
    depth_img = (apply_colormap(res["depth"].reshape(h, w), "jet") * 255).astype(
        np.uint8
    )
    Image.fromarray(depth_img).save(os.path.join(out, stem + "_depth.png"))

    if "semantic_label" in res:
        from satnerf_tpu.data_prep.prepare_annotations import (
            get_semantic_class_color_mapping,
        )

        colors = get_semantic_class_color_mapping()
        labels = res["semantic_label"].reshape(h, w)
        sem = colors[np.clip(labels, 0, len(colors) - 1)]
        Image.fromarray(sem).save(os.path.join(out, stem + "_semantic.png"))
        # the paper's lighting-scalar shaded rendering
        shading = (res["weights"][..., None] * res["sun"]).sum(-2).reshape(h, w, 1)
        shaded = (sem * shading).astype(np.uint8)
        Image.fromarray(shaded).save(
            os.path.join(out, stem + "_semantic_shaded.png")
        )

    if save_tif:
        from satnerf_tpu.io.image import save_output_image

        save_output_image(
            np.moveaxis(res["rgb"].reshape(h, w, 3), -1, 0).astype(np.float32),
            os.path.join(out, stem + "_rgb.tif"),
        )

    logger.info("RenderView", f"novel view written under {out} ({stem}_*.png)")
    return res


def main(argv=None):
    from satnerf_tpu.eval.eval_nerf import _parse

    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        return 1
    args, kwargs = _parse(argv)
    for k in ("sun_elevation", "sun_azimuth"):
        if k in kwargs:
            kwargs[k] = float(kwargs[k])
    if "ts" in kwargs:
        kwargs["ts"] = int(kwargs["ts"])
    if "chunk" in kwargs:
        kwargs["chunk"] = int(kwargs["chunk"])
    render_view(*args, **kwargs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
