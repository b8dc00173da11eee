"""Pallas TPU kernel: fused alpha compositing + weighted accumulation.

The volume-rendering tail after the field MLP (ref math:
framework/util/rendering.py:4-34 + the weighted reductions in
baseline/models/satnerf.py:71-98): per ray, compute alphas from sigma/z,
the exclusive transmittance product, weights, depth, and the
irradiance-composited RGB — all in one VMEM-resident pass over a (TB, S)
ray tile, so the per-sample tensors (sigma, z, albedo, sun, sky) are read
from HBM exactly once and only per-ray outputs are written back.

Measured on a v5e chip at 131k rays x 64 samples: this kernel runs in
3.5 ms; XLA's automatic fusion of the equivalent jnp chain
(core/compositing.py) runs in 2.2 ms — the compiler wins on this op, so the
production renderer keeps the XLA path and this kernel stays as validated
infrastructure (numerics match to 2e-6) and the scaffold for deeper fusions
(MLP-final-layer + compositing). Kernel-engineering notes that mattered:
a (TB, S, 3) albedo block pads its 3-wide lane axis to 128 (42x VMEM bloat,
7x slowdown) — channels must be split into (B, S) planes; cumprod has no
Mosaic lowering — use a Hillis-Steele doubling scan with pltpu.roll.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _composite_kernel(sigma_ref, z_ref, alb_r_ref, alb_g_ref, alb_b_ref,
                      sun_ref, sky_ref, w_ref, t_ref, depth_ref, rgb_ref):
    sig = sigma_ref[:]  # (TB, S)
    z = z_ref[:]

    deltas = z[:, 1:] - z[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1
    )
    alphas = 1.0 - jnp.exp(-deltas * jnp.maximum(sig, 0.0))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1] + 1e-10], axis=-1
    )
    # cumulative product via a Hillis-Steele doubling scan over the lane
    # axis (cumprod has no Mosaic lowering): log2(S) rounds of
    # multiply-by-rolled-self, wrapped lanes masked to 1. Exact f32
    # multiplication chain — no exp/log precision loss.
    s = shifted.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, shifted.shape, 1)
    acc = shifted
    d = 1
    while d < s:
        rolled = pltpu.roll(acc, d, axis=1)
        rolled = jnp.where(lane >= d, rolled, 1.0)
        acc = acc * rolled
        d *= 2
    transparency = acc
    weights = alphas * transparency

    w_ref[:] = weights
    t_ref[:] = transparency
    depth_ref[:] = jnp.sum(weights * z, axis=-1, keepdims=True)

    # irradiance composite: rgb = clamp(sum w * albedo * (sun + (1-sun)*sky))
    sun = sun_ref[:]  # (TB, S)
    acc = []
    for c, alb_ref in enumerate((alb_r_ref, alb_g_ref, alb_b_ref)):
        sky_c = sky_ref[:, c][:, None]
        irr = sun + (1.0 - sun) * sky_c
        acc.append(jnp.sum(weights * alb_ref[:] * irr, axis=-1))
    rgb_ref[:] = jnp.clip(jnp.stack(acc, axis=-1), 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def composite_pallas(
    sigmas, z_vals, albedo, sun, sky, block_b: int = 512, interpret: bool = False
):
    """Fused compositing tail.

    Args:
        sigmas, z_vals: (B, S); albedo: (B, S, 3); sun: (B, S);
        sky: (B, 3) (the sky head depends only on the per-ray sun direction,
        so it is per-ray, not per-sample).
    Returns:
        weights (B, S), transparency (B, S), depth (B,), rgb (B, 3).
    """
    b, s = sigmas.shape
    # split albedo channels into contiguous (B, S) planes: a (TB, S, 3) block
    # would pad the 3-wide lane axis to 128 (42x VMEM bloat)
    alb_r, alb_g, alb_b = (albedo[..., c] for c in range(3))
    pad = (-b) % block_b
    if pad:
        padf = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
        sigmas, z_vals, alb_r, alb_g, alb_b, sun, sky = map(
            padf, (sigmas, z_vals, alb_r, alb_g, alb_b, sun, sky)
        )
    n_blocks = (b + pad) // block_b

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, 3), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, s), lambda i: (i, 0)),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_b, 3), lambda i: (i, 0)),
        ],
    )
    weights, transparency, depth, rgb = pl.pallas_call(
        _composite_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b + pad, s), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, s), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b + pad, 3), jnp.float32),
        ],
        interpret=interpret,
    )(sigmas, z_vals, alb_r, alb_g, alb_b, sun, sky)
    return (
        weights[:b],
        transparency[:b],
        depth[:b, 0],
        rgb[:b],
    )
