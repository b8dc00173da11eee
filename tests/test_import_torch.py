"""Checkpoint-migration golden test: a reference Lightning checkpoint imports
into our params and reproduces the torch forward exactly."""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from satnerf_tpu.models import FieldConfig, field_forward
from satnerf_tpu.models.import_torch import params_from_lightning_ckpt

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def test_lightning_ckpt_roundtrip(tmp_path):
    import torch
    from baseline.models.satnerf import SatNeRF

    cfgs = SimpleNamespace(pipeline=SimpleNamespace(fc_use_full_features=False))
    model = SatNeRF(
        cfgs, layers=8, feat=512, mapping=False, skips=[4], siren=True,
        t_embedding_dims=4,
    )
    t_table = torch.nn.Embedding(50, 4)

    # save exactly the way Lightning persists the reference pipeline
    # (model_<key>.<param> entries, ref: load_ckpoint.py:94-129)
    state = {}
    for k, v in model.state_dict().items():
        state[f"model_coarse.{k}"] = v
    for k, v in t_table.state_dict().items():
        state[f"model_t.{k}"] = v
    ckpt_fp = str(tmp_path / "epoch=12.ckpt")
    torch.save({"state_dict": state, "epoch": 12, "global_step": 1234}, ckpt_fp)

    fcfg = FieldConfig(variant="satnerf", siren=True, mapping=False)
    params = params_from_lightning_ckpt(ckpt_fp, fcfg, t_vocab=50)

    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    sun = rng.normal(size=(1, 3)); sun /= np.linalg.norm(sun)
    sun_d = np.tile(sun, (64, 1)).astype(np.float32)
    ts = rng.integers(0, 50, 64)
    t_emb = t_table.weight.detach().numpy()[ts]

    model.eval()
    with torch.no_grad():
        ref_out = model(
            torch.from_numpy(xyz),
            input_sun_dir=torch.from_numpy(sun_d),
            input_t=torch.from_numpy(t_emb),
        ).numpy()

    ours = field_forward(
        params["field"], fcfg, jnp.asarray(xyz), sun_d=jnp.asarray(sun_d),
        t_emb=jnp.asarray(params["t"][ts]),
    )
    np.testing.assert_allclose(np.asarray(ours["rgb"]), ref_out[:, :3], atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["sigma"]), ref_out[:, 3], atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(ours["beta"])[:, 0], ref_out[:, 8], atol=2e-4
    )
    np.testing.assert_allclose(params["t"], t_table.weight.detach().numpy())


def test_export_to_reference_and_back(tmp_path):
    """Our trained params export to a Lightning ckpt the REFERENCE model
    loads strictly, its forward matches ours, and re-import is exact."""
    import torch
    from baseline.models.satnerf import SatNeRF

    import jax

    from satnerf_tpu.models.import_torch import save_lightning_ckpt
    from satnerf_tpu.train.state import init_params

    fcfg = FieldConfig(variant="satnerf", siren=True, mapping=False)
    params = jax.device_get(
        init_params(jax.random.PRNGKey(3), fcfg, t_vocab=50)
    )
    ckpt_fp = save_lightning_ckpt(
        params, str(tmp_path / "export.ckpt"), epoch=7, global_step=777
    )

    # the reference's own loader contract: model_coarse.* keys load strict
    raw = torch.load(ckpt_fp, map_location="cpu", weights_only=True)
    assert raw["global_step"] == 777
    coarse = {
        k[len("model_coarse."):]: v
        for k, v in raw["state_dict"].items()
        if k.startswith("model_coarse.")
    }
    cfgs = SimpleNamespace(pipeline=SimpleNamespace(fc_use_full_features=False))
    model = SatNeRF(
        cfgs, layers=8, feat=512, mapping=False, skips=[4], siren=True,
        t_embedding_dims=4,
    )
    model.load_state_dict(coarse, strict=True)

    rng = np.random.default_rng(1)
    xyz = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    sun = rng.normal(size=(1, 3)); sun /= np.linalg.norm(sun)
    sun_d = np.tile(sun, (32, 1)).astype(np.float32)
    ts = rng.integers(0, 50, 32)
    t_emb = np.asarray(params["t"], np.float32)[ts]

    model.eval()
    with torch.no_grad():
        ref_out = model(
            torch.from_numpy(xyz),
            input_sun_dir=torch.from_numpy(sun_d),
            input_t=torch.from_numpy(t_emb),
        ).numpy()
    ours = field_forward(
        params["field"], fcfg, jnp.asarray(xyz), sun_d=jnp.asarray(sun_d),
        t_emb=jnp.asarray(t_emb),
    )
    np.testing.assert_allclose(np.asarray(ours["rgb"]), ref_out[:, :3], atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours["sigma"]), ref_out[:, 3], atol=2e-4)

    # exact round-trip through the importer
    back = params_from_lightning_ckpt(ckpt_fp, fcfg, t_vocab=50)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]))
