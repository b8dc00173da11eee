"""Renderer-level golden parity: our fused render (with the solar-correction
pass) vs the reference SatNeRFRendering component, same weights + z ladder."""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satnerf_tpu.models import FieldConfig, init_field_params
from satnerf_tpu.render import RenderConfig, render_rays
from tests.test_field_golden import _copy_params_into_satnerf

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def test_full_renderer_with_solar_correction_matches_reference():
    import torch
    from baseline.components.rendering import SatNeRFRendering
    from baseline.models.satnerf import SatNeRF

    cfgs = SimpleNamespace(
        pipeline=SimpleNamespace(
            fc_use_full_features=False, render_chunk_size=100000,
            sc_lambda=0.05, n_samples=16,
        )
    )
    fcfg = FieldConfig(variant="satnerf", siren=True, mapping=False)
    params = init_field_params(jax.random.PRNGKey(0), fcfg)
    model = SatNeRF(
        cfgs, layers=8, feat=512, mapping=False, skips=[4], siren=True,
        t_embedding_dims=4,
    )
    _copy_params_into_satnerf(model, params)
    model.eval()

    B, S, tau = 8, 16, 4
    rng = np.random.default_rng(0)
    o = rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    far = rng.uniform(0.5, 1.0, (B, 1)).astype(np.float32)
    rays = np.concatenate([o, d, np.zeros((B, 1), np.float32), far], axis=1)
    z_vals = np.sort(rng.uniform(0, 1, (B, S)).astype(np.float32), axis=1)
    xyz = o[:, None] + d[:, None] * z_vals[..., None]
    sun = rng.normal(size=(1, 3)); sun /= np.linalg.norm(sun)
    sun_d = np.tile(sun, (B, 1)).astype(np.float32)
    ts = (np.arange(B) % 4).astype(np.float32)
    extras = np.concatenate([sun_d, ts[:, None]], axis=1)
    t_table = rng.normal(size=(4, tau)).astype(np.float32)

    # reference path: internal _model_rendering with OUR fixed z ladder
    renderer = SatNeRFRendering(cfgs)
    t_emb_module = torch.nn.Embedding(4, tau)
    t_emb_module.weight.data = torch.from_numpy(t_table.copy())
    models = {"coarse": model, "t": t_emb_module}
    with torch.no_grad():
        ref = renderer._model_rendering(
            models, "coarse", cfgs,
            torch.from_numpy(rays), torch.from_numpy(extras),
            torch.from_numpy(xyz), torch.from_numpy(z_vals),
            rays_d=None,
        )

    # ours: same z ladder, solar correction folded into the same batch
    rcfg = RenderConfig(field=fcfg, n_samples=S, solar_correction=True)
    ours = render_rays(
        {"field": params, "t": jnp.asarray(t_table)},
        rcfg,
        jnp.asarray(rays),
        jnp.asarray(extras),
        key=None,
        given_z_vals=jnp.asarray(z_vals),
    )

    np.testing.assert_allclose(
        np.asarray(ours["rgb"]), ref["rgb"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["depth"]), ref["depth"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["beta"]), ref["beta"].numpy(), atol=2e-4
    )
    # the solar-correction outputs the SNerf/SatNerf losses consume
    np.testing.assert_allclose(
        np.asarray(ours["weights_sc"]), ref["weights_sc"].numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["transparency_sc"]), ref["transparency_sc"].numpy(),
        atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours["sun_sc"]), ref["sun_sc"].numpy(), atol=3e-5
    )

    # and the losses computed from those outputs agree end to end
    from baseline.components.loss import SatNerfLoss

    from satnerf_tpu.train import losses

    gt = rng.uniform(0, 1, (B, 3)).astype(np.float32)
    ref_inputs = {f"{k}_coarse": v for k, v in ref.items()}
    ref_loss, _ = SatNerfLoss(lambda_sc=0.05)(
        ref_inputs, torch.from_numpy(gt)
    )
    our_loss, _ = losses.satnerf_loss(
        {k: jnp.asarray(np.asarray(v)) for k, v in ours.items()},
        jnp.asarray(gt), lambda_sc=0.05,
    )
    np.testing.assert_allclose(float(our_loss), ref_loss.item(), rtol=1e-4)
