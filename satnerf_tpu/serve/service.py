"""RenderService: a trained run loaded once, rendered many times.

The TPU-native serving core: parameters stay resident on the device, the
fixed-shape chunked render program compiles exactly once (first request or
an explicit ``warmup()``), and every subsequent request reuses the cached
executable — request latency is pure device compute + readback. A lock
serializes device access (one chip, one program at a time); concurrent
callers queue.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np

from satnerf_tpu.eval.loader import load_run
from satnerf_tpu.eval.render_view import build_view_rays
from satnerf_tpu.io.json_io import read_json
from satnerf_tpu.logger import logger
from satnerf_tpu.render.renderer import render_image_chunked


class RenderService:
    """Persistent novel-view renderer over one trained run.

    ``render(view, ...)`` accepts a dataset view name ("SYN_001_002_RGB"),
    a path to an RPC meta JSON, or an already-parsed meta dict, plus the
    paper's relight/re-date overrides (sun elevation/azimuth in degrees,
    transient timestamp index).
    """

    def __init__(self, run_dp: str, epoch: int | None = None,
                 chunk: int = 16384, fast_sine: bool = False):
        self.run_dp = run_dp
        self.chunk = int(chunk)
        pipeline, params, rcfg, step = load_run(run_dp, epoch)
        if fast_sine:
            # ~7% faster renders. Eval-time engine choice is MEASURED to
            # be metric-free on trained checkpoints (18/18 cells of the
            # sine-swap matrix agree to <=0.005 dB PSNR / <0.001 m MAE,
            # docs/performance.md "quality gate" section): the ~0.9 m
            # poly5 DSM-MAE cost arises only from TRAINING with poly5.
            # Served RGB and depth are both unaffected by this swap.
            from dataclasses import replace

            rcfg = replace(rcfg, field=replace(rcfg.field, sin_impl="poly5"))
        self.fast_sine = bool(fast_sine)
        self.pipeline = pipeline
        self.params = params
        self.rcfg = rcfg
        self.step = step
        self.dataset = pipeline.datasets["rgb"]
        self._lock = threading.Lock()
        self._stats = {"requests": 0, "rays": 0, "render_seconds": 0.0}

    # ------------------------------------------------------------------ api
    def metadata(self) -> dict:
        f = self.rcfg.field
        return {
            "run_dp": self.run_dp,
            "step": self.step,
            "variant": f.variant,
            "n_classes": f.n_classes if f.has_semantic else 0,
            "views": self.view_names(),
            "chunk": self.chunk,
            "fast_sine": self.fast_sine,
            # Kept for API compat; the swap study (docs/performance.md
            # "quality gate") shows the eval-time engine does not change
            # served depth quality.
            "depth_quality": "poly5_fast_sine" if self.fast_sine else "exact",
        }

    def view_names(self) -> list[str]:
        return [d["name"] for d in self.dataset.data]

    def resolve_meta(self, view, allow_paths: bool = True) -> dict:
        """View name / meta path / meta dict -> meta dict.

        ``allow_paths=False`` (used by the HTTP front-end) restricts views
        to plain names resolving inside the dataset's meta dir, so a remote
        client cannot probe arbitrary filesystem JSON via view names like
        ``"../../etc/foo"`` / absolute paths, nor post a raw meta dict with
        an unbounded width x height (a 50000x50000 request would meshgrid
        2.5e9 rays host-side before any chunking). The path and dict forms
        stay available to the Python API.
        """
        if isinstance(view, dict):
            if not allow_paths:
                raise ValueError(
                    "inline meta dicts are not accepted over HTTP; "
                    "use a known view name"
                )
            return view
        if allow_paths and os.path.isfile(str(view)):
            return read_json(str(view))
        fp = os.path.join(self.dataset.meta_dp, str(view) + ".json")
        meta_root = os.path.realpath(self.dataset.meta_dp)
        if os.path.commonpath([meta_root, os.path.realpath(fp)]) != meta_root:
            raise KeyError(f"view name {view!r} escapes the meta directory")
        if not os.path.isfile(fp):
            # No fp in the message: it is echoed verbatim in HTTP 400
            # bodies and would leak the server's on-disk dataset layout.
            raise KeyError(f"unknown view {view!r}")
        return read_json(fp)

    def warmup(self) -> float:
        """Compile + run the render program once; returns wall seconds."""
        t0 = time.monotonic()
        names = self.view_names()
        if names:
            self.render(names[0])
        return time.monotonic() - t0

    def render(self, view, sun_elevation: float | None = None,
               sun_azimuth: float | None = None, ts: int = 0,
               allow_paths: bool = True) -> dict:
        """Render one view; returns (H, W, ...) numpy arrays.

        Keys: rgb (H, W, 3 in [0, 1]), depth (H, W), plus semantic_label /
        semantic_rgb / shaded semantic for semantic models.
        """
        meta = self.resolve_meta(view, allow_paths=allow_paths)
        rays, extras, w, h, el, az = build_view_rays(
            self.dataset, meta, sun_elevation, sun_azimuth, ts
        )
        with self._lock:
            t0 = time.monotonic()
            res = render_image_chunked(
                self.params, self.rcfg, rays, extras, chunk=self.chunk
            )
            dt = time.monotonic() - t0
            self._stats["requests"] += 1
            self._stats["rays"] += int(rays.shape[0])
            self._stats["render_seconds"] += dt

        out = {
            "rgb": np.clip(np.asarray(res["rgb"], np.float32), 0, 1).reshape(
                h, w, 3
            ),
            "depth": np.asarray(res["depth"], np.float32).reshape(h, w),
            "sun_elevation": el,
            "sun_azimuth": az,
            "ts": int(ts),
        }
        if "semantic_label" in res:
            from satnerf_tpu.data_prep.prepare_annotations import (
                get_semantic_class_color_mapping,
            )

            colors = get_semantic_class_color_mapping()
            labels = np.asarray(res["semantic_label"]).reshape(h, w)
            out["semantic_label"] = labels
            sem = colors[np.clip(labels, 0, len(colors) - 1)]
            out["semantic_rgb"] = sem.astype(np.uint8)
            shading = (
                (np.asarray(res["weights"])[..., None] * np.asarray(res["sun"]))
                .sum(-2)
                .reshape(h, w, 1)
            )
            out["semantic_shaded_rgb"] = (sem * shading).astype(np.uint8)
        return out

    def stats(self) -> dict:
        s = dict(self._stats)
        s["rays_per_second"] = (
            s["rays"] / s["render_seconds"] if s["render_seconds"] else 0.0
        )
        return s


def load_service(run_dp: str, epoch: int | None = None, chunk: int = 16384,
                 warmup: bool = True, fast_sine: bool = False) -> RenderService:
    svc = RenderService(run_dp, epoch=epoch, chunk=chunk, fast_sine=fast_sine)
    if warmup:
        dt = svc.warmup()
        logger.info("Serve", f"warmed up in {dt:.1f}s (compile included)")
    return svc
