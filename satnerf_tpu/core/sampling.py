"""Ray sampling: stratified coarse samples and hierarchical inverse-CDF.

ref: framework/components/rendering.py:84-116 (sample_rays) and :8-55
(sample_pdf). Functional: randomness comes from an explicit jax PRNG key so
the whole renderer stays jit-compatible and reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from satnerf_tpu.core.rays import ray_component


def sample_rays(
    rays,
    n_samples: int,
    key: jax.Array | None = None,
    use_disp: bool = False,
    perturb: float = 1.0,
    given_z_vals=None,
):
    """Stratified depths along each ray -> (xyz points, z_vals).

    Args:
        rays: (N, 8) packed rays.
        n_samples: number of coarse samples per ray.
        key: PRNG key for stratified jitter; ``None`` or ``perturb<=0``
            disables jitter (deterministic midpoints of linspace).
    Returns:
        xyz (N, S, 3), z_vals (N, S).
    ref: rendering.py:84-116.
    """
    rays_o = ray_component(rays, "origins")
    rays_d = ray_component(rays, "directions")
    near = ray_component(rays, "near")
    far = ray_component(rays, "far")

    if given_z_vals is not None:
        z_vals = given_z_vals
    else:
        z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=rays.dtype)
        if not use_disp:
            z_vals = near * (1.0 - z_steps) + far * z_steps
        else:
            z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)

        if perturb > 0 and key is not None:
            z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
            upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
            lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
            u = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
            z_vals = lower + (upper - lower) * (perturb * u)

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    return xyz, z_vals


def sample_pdf(
    bins,
    weights,
    n_importance: int,
    key: jax.Array | None = None,
    det: bool = False,
    eps: float = 1e-5,
):
    """Hierarchical sampling: draw n_importance samples from the coarse-weight
    distribution by inverse-CDF transform. ref: rendering.py:8-55.

    Args:
        bins: (N, S+1) bin edges.
        weights: (N, S) coarse weights.
    Returns:
        samples (N, n_importance).
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, S+1)

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=bins.dtype)

    return _inverse_cdf_interp(bins, cdf, u, n_bins, clamp_denom_below=eps)


def _inverse_cdf_interp(bins, cdf, u, n_bins, clamp_denom_below=None,
                        denom_eps=0.0):
    """Shared inverse-CDF transform: locate each u in the per-ray cdf and
    linearly interpolate the corresponding bin values.

    clamp_denom_below: replace denominators < this with 1 (sample_pdf's
        guard). denom_eps: additive epsilon on the denominator (the SDF
        variant's guard, matching the reference formula exactly).
    """
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(inds - 1, 0, None)
    above = jnp.clip(inds, None, n_bins)

    cdf_below = jnp.take_along_axis(cdf, below, axis=1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=1)
    bins_below = jnp.take_along_axis(bins, below, axis=1)
    bins_above = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_above - cdf_below + denom_eps
    if clamp_denom_below is not None:
        denom = jnp.where(denom < clamp_denom_below, 1.0, denom)
    return bins_below + (u - cdf_below) / denom * (bins_above - bins_below)


def sample_pdf_midpoint(bins, weights, n_importance: int, eps: float = 1e-8):
    """Deterministic inverse-CDF sampling at uniform-interval MIDPOINTS.

    Port of the reference's SDF-style sampler ``sample_dists_from_pdf_sdf``
    (ref: framework/components/rendering.py:55-81 — defined there but unused
    by the shipped coarse-only renderers; provided for parity): instead of
    ``sample_pdf``'s jittered/endpoint u-grid, u is the midpoint of each of
    the ``n_importance`` uniform intervals, giving a stratified-deterministic
    fine sample set.

    Args:
        bins: (N, S+1) bin edges (distance values).
        weights: (N, S) coarse weights (need not be normalised).
    Returns:
        samples (N, n_importance).
    """
    n_rays, n_bins = weights.shape
    pdf = weights / jnp.maximum(
        jnp.sum(jnp.abs(weights), axis=-1, keepdims=True), eps
    )
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)

    grid = jnp.linspace(0.0, 1.0, n_importance + 1, dtype=bins.dtype)
    u = 0.5 * (grid[:-1] + grid[1:])
    u = jnp.broadcast_to(u, (n_rays, n_importance))

    return _inverse_cdf_interp(bins, cdf, u, n_bins, denom_eps=eps)
