"""Volume-rendering alpha compositing.

ref: framework/util/rendering.py:4-34 (``convert_sigmas``) — delta_inf=1e10,
alpha = 1 - exp(-delta * relu(sigma)), transmittance = exclusive cumprod of
(1 - alpha + 1e-10), weights = alpha * T, depth = sum(w * z).

The cumulative product along the (small, on-chip) sample axis maps to a cheap
VPU scan; the whole function fuses with the surrounding field evaluation under
XLA, so no host-side chunk loop exists around it.
"""

from __future__ import annotations

import jax.numpy as jnp


def convert_sigmas(sigmas, z_vals):
    """sigma -> (weights, depth, transparency, alphas).

    Args:
        sigmas: (N, S) raw density head output.
        z_vals: (N, S) sample depths along each ray.
    Returns:
        weights (N, S), depth (N,), transparency T (N, S), alphas (N, S).
    """
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)

    alphas = 1.0 - jnp.exp(-deltas * jnp.maximum(sigmas, 0.0))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1
    )
    transparency = jnp.cumprod(shifted, axis=-1)[:, :-1]
    weights = alphas * transparency
    depth = jnp.sum(weights * z_vals, axis=-1)
    return weights, depth, transparency, alphas


def composite_scalar(weights, values):
    """Accumulate per-sample values (N, S, C) with weights (N, S) -> (N, C).

    The generic reduction used for beta, semantic logits and sun scalars
    (ref: semantic/models/rs_semantic.py:101-109, semantic/components/loss.py:21).
    """
    return jnp.sum(weights[..., None] * values, axis=-2)
