"""Golden parity for the remaining variants: classic NeRF (posenc + ReLU +
view dirs) and Shadow-NeRF (SIREN, sun/sky heads)."""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satnerf_tpu.models import FieldConfig, field_forward, init_field_params
from tests.test_field_golden import _copy_linear, _inputs

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


class TestNeRFGolden:
    def test_forward_matches_reference(self):
        import torch
        from baseline.models.nerf import NeRF

        fcfg = FieldConfig(
            variant="nerf", siren=False, mapping=True,
            mapping_pos_n_freq=10, mapping_dir_n_freq=4,
        )
        params = init_field_params(jax.random.PRNGKey(0), fcfg)

        model = NeRF(layers=8, feat=512, mapping=True, mapping_sizes=[10, 4],
                     skips=[4], siren=False)
        for i, layer in enumerate(params["trunk"]):
            _copy_linear(model.fc_net[2 * i], layer)
        _copy_linear(model.sigma_from_xyz[0], params["sigma"])
        _copy_linear(model.feats_from_xyz, params["feats"])
        _copy_linear(model.rgb_from_xyzdir[0], params["rgb"][0])
        _copy_linear(model.rgb_from_xyzdir[2], params["rgb"][1])
        model.eval()

        xyz, _, _ = _inputs(seed=11)
        rng = np.random.default_rng(12)
        dirs = rng.normal(size=xyz.shape).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

        with torch.no_grad():
            ref_out = model(
                torch.from_numpy(xyz), input_dir=torch.from_numpy(dirs)
            ).numpy()
        ours = field_forward(
            params, fcfg, jnp.asarray(xyz), view_dir=jnp.asarray(dirs)
        )
        np.testing.assert_allclose(np.asarray(ours["rgb"]), ref_out[:, :3], atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours["sigma"]), ref_out[:, 3], atol=2e-4)


class TestShadowNeRFGolden:
    def test_forward_matches_reference(self):
        import torch
        from baseline.models.snerf import ShadowNeRF

        fcfg = FieldConfig(variant="snerf", siren=True, mapping=False)
        params = init_field_params(jax.random.PRNGKey(1), fcfg)

        model = ShadowNeRF(layers=8, feat=512, mapping=False, skips=[4], siren=True)
        for i, layer in enumerate(params["trunk"]):
            _copy_linear(model.fc_net[2 * i], layer)
        _copy_linear(model.sigma_from_xyz[0], params["sigma"])
        _copy_linear(model.feats_from_xyz, params["feats"])
        _copy_linear(model.rgb_from_xyzdir[0], params["rgb"][0])
        _copy_linear(model.rgb_from_xyzdir[2], params["rgb"][1])
        for i in range(4):
            _copy_linear(model.sun_v_net[2 * i], params["sun_v"][i])
        _copy_linear(model.sky_color[0], params["sky"][0])
        _copy_linear(model.sky_color[2], params["sky"][1])
        model.eval()

        xyz, sun_d, _ = _inputs(seed=13)
        with torch.no_grad():
            ref_out = model(
                torch.from_numpy(xyz), input_sun_dir=torch.from_numpy(sun_d)
            ).numpy()
        ours = field_forward(
            params, fcfg, jnp.asarray(xyz), sun_d=jnp.asarray(sun_d)
        )
        # packing: rgb(3) sigma(1) sun_v(1) sky(3)
        np.testing.assert_allclose(np.asarray(ours["rgb"]), ref_out[:, :3], atol=2e-5)
        np.testing.assert_allclose(np.asarray(ours["sigma"]), ref_out[:, 3], atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(ours["sun_v"])[:, 0], ref_out[:, 4], atol=2e-5
        )
        np.testing.assert_allclose(np.asarray(ours["sky"]), ref_out[:, 5:8], atol=2e-5)


class TestRSSemanticAblationsGolden:
    def test_all_ablation_heads_match_reference(self):
        """All rs_semantic ablation flags on: t_j for semantic, separate
        semantic embedding, separate beta_s, t_j instead of beta for RGB."""
        import torch
        from semantic.models.rs_semantic import RSSemanticNeRF

        from tests.test_field_golden import _copy_params_into_satnerf

        pipeline = SimpleNamespace(
            fc_layers=8, fc_units=512, fc_use_full_features=False, fc_skips=[4],
            activation_function="siren", t_embedding_tau=4,
            mapping_pos_n_freq=10, mapping_dir_n_freq=4,
            semantic_activation_function="none",
            use_tj_for_s=True, use_tj_instead_of_beta=True,
            use_separate_beta_for_s=True, use_separate_tj_for_semantic=True,
            render_chunk_size=100000,
        )
        cfgs = SimpleNamespace(pipeline=pipeline)
        model = RSSemanticNeRF(cfgs, SimpleNamespace(semantic_n_classes=5))
        model.eval()

        fcfg = FieldConfig(
            variant="rs_semantic", siren=True, mapping=True, n_classes=5,
            semantic_sigmoid=False, use_tj_for_s=True,
            use_tj_instead_of_beta=True, use_separate_beta_for_s=True,
            use_separate_tj_for_semantic=True,
        )
        params = init_field_params(jax.random.PRNGKey(3), fcfg)
        _copy_params_into_satnerf(model, params)
        from tests.test_field_golden import _copy_linear as cl

        cl(model.semantic_prediction[0], params["semantic"][0])
        cl(model.semantic_prediction[2], params["semantic"][1])
        cl(model.semantic_beta_from_xyz[0], params["beta_s"][0])
        cl(model.semantic_beta_from_xyz[2], params["beta_s"][1])

        xyz, sun_d, t = _inputs(seed=21)
        rng = np.random.default_rng(22)
        t_s = rng.normal(size=t.shape).astype(np.float32)

        with torch.no_grad():
            ref_out = model(
                torch.from_numpy(xyz),
                input_sun_dir=torch.from_numpy(sun_d),
                input_t=torch.from_numpy(t),
                input_t_s=torch.from_numpy(t_s),
            ).numpy()

        ours = field_forward(
            params, fcfg, jnp.asarray(xyz), sun_d=jnp.asarray(sun_d),
            t_emb=jnp.asarray(t), t_s_emb=jnp.asarray(t_s),
        )
        # packing: rgb(3) sigma(1) sun_v(1) sky(3) beta(1) beta_s(1) sem(5)
        np.testing.assert_allclose(np.asarray(ours["rgb"]), ref_out[:, :3], atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ours["beta"])[:, 0], ref_out[:, 8], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours["beta_s"])[:, 0], ref_out[:, 9], atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours["semantic"]), ref_out[:, 10:15], atol=2e-4
        )
