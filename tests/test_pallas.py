"""Pallas compositing kernel vs the jnp reference path (interpret mode on
the CPU backend; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.core.compositing import convert_sigmas
from satnerf_tpu.ops.pallas.composite import composite_pallas


def _data(b=100, s=64, seed=0):
    rng = np.random.default_rng(seed)
    sigmas = rng.uniform(0, 5, (b, s)).astype(np.float32)
    z = np.sort(rng.uniform(0.1, 1.0, (b, s)).astype(np.float32), axis=1)
    albedo = rng.uniform(0, 1, (b, s, 3)).astype(np.float32)
    sun = rng.uniform(0, 1, (b, s)).astype(np.float32)
    sky = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    return map(jnp.asarray, (sigmas, z, albedo, sun, sky))


def test_matches_jnp_reference():
    sigmas, z, albedo, sun, sky = _data()
    w_ref, depth_ref, t_ref, _ = convert_sigmas(sigmas, z)
    irr = sun[..., None] + (1 - sun[..., None]) * sky[:, None, :]
    rgb_ref = jnp.clip(
        jnp.sum(w_ref[..., None] * albedo * irr, axis=-2), 0.0, 1.0
    )

    w, t, depth, rgb = composite_pallas(
        sigmas, z, albedo, sun, sky, block_b=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)


def test_ragged_batch_padding():
    sigmas, z, albedo, sun, sky = _data(b=77)
    w, t, depth, rgb = composite_pallas(
        sigmas, z, albedo, sun, sky, block_b=32, interpret=True
    )
    assert w.shape == (77, 64) and rgb.shape == (77, 3)
    w_ref, depth_ref, *_ = convert_sigmas(sigmas, z)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-6)
