"""Inference (no-gradient) render throughput, honest scan+readback timing.

Mirrors bench.py's methodology (docs/performance.md "Measurement
methodology"): `block_until_ready` lies on this machine's axon tunnel, so
the only honest clock is K render chunks scanned ON DEVICE inside one jit,
timed to a forced scalar readback. Each scan iteration renders one
8192-ray chunk of the flagship rs_semantic field in the INFERENCE
configuration (sc pass dropped — no eval/viz/serve consumer reads its
outputs, eval/loader.py) and folds rgb/depth/semantic sums into the carry
so no output can be dead-code-eliminated.

HOIST HAZARD (learned the hard way, 2026-08-18): if the scan body is
loop-invariant (same rays/params every iteration), XLA's loop-invariant
code motion hoists the ENTIRE render out of the loop and the "per-chunk"
time measures one render plus 50 scalar adds (~25x optimistic: 0.93 ms vs
the honest ~24 ms). The carry must feed back into the render's inputs:
each iteration perturbs the ray tensor by acc*1e-30 — numerically a no-op
(ray coords are O(1)) but a true serial data dependence, so every
iteration must execute the full field evaluation.

Env knobs: SATNERF_RENDER_SIN (poly|poly5|poly7f|exact), SATNERF_RENDER_SC=1
to keep the solar-correction outputs, SATNERF_RENDER_DTYPE,
SATNERF_RENDER_CHUNK, and SATNERF_RENDER_SCAN (scan length).

Usage: python tools/render_bench.py   (single-tenant chip: never run
concurrently with another TPU process)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

CHUNK = int(os.environ.get("SATNERF_RENDER_CHUNK", 8192))
SIN_IMPL = os.environ.get("SATNERF_RENDER_SIN", "poly")
DTYPE = os.environ.get("SATNERF_RENDER_DTYPE", "bfloat16")
WITH_SC = os.environ.get("SATNERF_RENDER_SC", "0") == "1"
SCAN_CHUNKS = int(os.environ.get("SATNERF_RENDER_SCAN", 50))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _batch
    from satnerf_tpu.models.field import FieldConfig
    from satnerf_tpu.render.renderer import RenderConfig, render_rays
    from satnerf_tpu.train.state import create_train_state, make_optimizer

    fcfg = FieldConfig(variant="rs_semantic", mapping=True, siren=True,
                       n_classes=5, sin_impl=SIN_IMPL)
    rcfg = RenderConfig(field=fcfg, n_samples=64, solar_correction=WITH_SC,
                        compute_dtype=DTYPE)
    state = create_train_state(
        jax.random.PRNGKey(0), fcfg, make_optimizer(5e-4, steps_per_epoch=1000),
        t_vocab=50
    )
    params = state.params

    b = _batch(CHUNK, depth=0)
    rays = jax.device_put(b["rays"])
    extras = jax.device_put(b["extras"])

    def many_chunks(params, rays, extras):
        def body(acc, _):
            # Loop-carried dependence: without this XLA hoists the render
            # out of the scan (see module docstring). acc*1e-30 is far below
            # f32 ulp of O(1) ray coords — a numeric no-op, a real dependence.
            rays_i = rays + (acc * jnp.float32(1e-30)).astype(rays.dtype)
            res = render_rays(params, rcfg, rays_i, extras, key=None)
            acc = (
                acc
                + jnp.sum(res["rgb"].astype(jnp.float32))
                + jnp.sum(res["depth"].astype(jnp.float32))
                + jnp.sum(res["semantic_logits"].astype(jnp.float32))
            )
            if WITH_SC:
                acc = acc + jnp.sum(res["sun_sc"].astype(jnp.float32))
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=SCAN_CHUNKS)
        return acc

    many_j = jax.jit(many_chunks)
    acc = float(many_j(params, rays, extras))  # warmup/compile + readback
    assert np.isfinite(acc)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = float(many_j(params, rays, extras))  # forced readback clock
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(acc)

    rays_per_sec = SCAN_CHUNKS * CHUNK / best
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "ms_per_chunk": round(1e3 * best / SCAN_CHUNKS, 2),
                "config": f"chunk{CHUNK}/{DTYPE}/{SIN_IMPL}"
                + ("/sc" if WITH_SC else ""),
            }
        )
    )


if __name__ == "__main__":
    main()
