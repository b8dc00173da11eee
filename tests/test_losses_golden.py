"""Golden loss parity: jnp loss terms vs the reference torch loss modules."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from satnerf_tpu.train import losses

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def _random_results(b=32, s=8, n_classes=5, seed=0, with_sc=True, with_sem=False):
    rng = np.random.default_rng(seed)
    res = {
        "rgb": rng.uniform(0, 1, (b, 3)).astype(np.float32),
        "depth": rng.uniform(0, 1, b).astype(np.float32),
        "weights": rng.uniform(0, 0.2, (b, s)).astype(np.float32),
        "beta": rng.uniform(0, 0.5, (b, s, 1)).astype(np.float32),
    }
    if with_sc:
        res["sun_sc"] = rng.uniform(0, 1, (b, s, 1)).astype(np.float32)
        res["transparency_sc"] = rng.uniform(0, 1, (b, s)).astype(np.float32)
        res["weights_sc"] = rng.uniform(0, 0.2, (b, s)).astype(np.float32)
    if with_sem:
        res["semantic_logits"] = rng.normal(size=(b, n_classes)).astype(np.float32)
    gt = rng.uniform(0, 1, (b, 3)).astype(np.float32)
    return res, gt


def _to_ref_inputs(res):
    import torch

    d = {}
    mapping = {
        "rgb": "rgb_coarse", "depth": "depth_coarse", "weights": "weights_coarse",
        "beta": "beta_coarse", "sun_sc": "sun_sc_coarse",
        "transparency_sc": "transparency_sc_coarse",
        "weights_sc": "weights_sc_coarse",
        "semantic_logits": "semantic_logits_coarse",
    }
    for k, v in res.items():
        d[mapping[k]] = torch.from_numpy(v)
    return d


class TestRgbLossGolden:
    def test_satnerf_loss(self):
        import torch
        from baseline.components.loss import SatNerfLoss

        res, gt = _random_results()
        ref_loss, ref_dict = SatNerfLoss(lambda_sc=0.05)(
            _to_ref_inputs(res), torch.from_numpy(gt)
        )
        ours, ours_dict = losses.satnerf_loss(
            {k: jnp.asarray(v) for k, v in res.items()}, jnp.asarray(gt),
            lambda_sc=0.05,
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-5)
        for ref_k, our_k in [
            ("coarse_color", "coarse_color"),
            ("coarse_logbeta", "coarse_logbeta"),
            ("coarse_sc_term2", "coarse_sc_term2"),
            ("coarse_sc_term3", "coarse_sc_term3"),
        ]:
            np.testing.assert_allclose(
                float(ours_dict[our_k]), ref_dict[ref_k].item(), rtol=1e-5,
                err_msg=ref_k,
            )

    def test_snerf_loss(self):
        import torch
        from baseline.components.loss import SNerfLoss

        res, gt = _random_results(seed=1)
        ref_loss, _ = SNerfLoss(lambda_sc=0.05)(
            _to_ref_inputs(res), torch.from_numpy(gt)
        )
        ours, _ = losses.snerf_loss(
            {k: jnp.asarray(v) for k, v in res.items()}, jnp.asarray(gt), 0.05
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-5)

    def test_depth_loss(self):
        import torch
        from baseline.components.loss import DepthLoss

        res, _ = _random_results(seed=2, with_sc=False)
        rng = np.random.default_rng(3)
        target = rng.uniform(0, 1, 32).astype(np.float32)
        w = rng.uniform(0, 1, 32).astype(np.float32)
        ref_loss, _ = DepthLoss(lambda_ds=1000.0)(
            _to_ref_inputs(res), torch.from_numpy(target), torch.from_numpy(w)
        )
        ours, _ = losses.depth_loss(
            {"depth": jnp.asarray(res["depth"])}, jnp.asarray(target),
            jnp.asarray(w), 1000.0,
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-4)


class TestSemanticLossGolden:
    def _sem_data(self, b=64, n_classes=5, seed=4):
        rng = np.random.default_rng(seed)
        res, _ = _random_results(b=b, with_sc=False, with_sem=True, seed=seed)
        targets = rng.integers(0, n_classes, (b, 1)).astype(np.int64)
        mask = rng.uniform(size=b) > 0.3
        return res, targets, mask

    def test_semantic_loss_with_car_ignore(self):
        import torch
        from semantic.components.loss import SemanticLoss

        res, targets, mask = self._sem_data()
        car = 4
        ref_loss, _ = SemanticLoss(lambda_s=0.04, car_index=car, ignore_car_index=True)(
            _to_ref_inputs(res), torch.from_numpy(targets), torch.from_numpy(mask)
        )
        ours, _ = losses.semantic_loss(
            {k: jnp.asarray(v) for k, v in res.items()},
            jnp.asarray(targets), jnp.asarray(mask),
            lambda_s=0.04, car_index=car, ignore_car=True,
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-5)

    def test_semantic_loss_no_ignore(self):
        import torch
        from semantic.components.loss import SemanticLoss

        res, targets, mask = self._sem_data(seed=5)
        ref_loss, _ = SemanticLoss(lambda_s=0.04, car_index=4, ignore_car_index=False)(
            _to_ref_inputs(res), torch.from_numpy(targets), torch.from_numpy(mask)
        )
        ours, _ = losses.semantic_loss(
            {k: jnp.asarray(v) for k, v in res.items()},
            jnp.asarray(targets), jnp.asarray(mask),
            lambda_s=0.04, car_index=4, ignore_car=False,
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-5)

    def test_semantic_uncertainty_loss(self):
        import torch
        from semantic.components.loss import SemanticUncertaintyLoss

        res, targets, mask = self._sem_data(seed=6)
        ref_loss, _ = SemanticUncertaintyLoss(
            lambda_s=0.04, car_index=4, ignore_car_index=True
        )(_to_ref_inputs(res), torch.from_numpy(targets), torch.from_numpy(mask))
        ours, _ = losses.semantic_uncertainty_loss(
            {k: jnp.asarray(v) for k, v in res.items()},
            jnp.asarray(targets), jnp.asarray(mask),
            lambda_s=0.04, car_index=4, ignore_car=True,
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-5)

    def test_car_reg_loss(self):
        import torch
        from semantic.components.loss import SemanticCarRegLoss

        res, targets, mask = self._sem_data(seed=7)
        targets[:20] = 4  # guarantee car rays
        ref_loss, _ = SemanticCarRegLoss(lambda_c=0.1, car_label=4)(
            _to_ref_inputs(res), torch.from_numpy(targets), torch.from_numpy(mask)
        )
        ours, _ = losses.semantic_car_reg_loss(
            {k: jnp.asarray(v) for k, v in res.items()},
            jnp.asarray(targets), jnp.asarray(mask),
            lambda_c=0.1, car_label=4,
        )
        np.testing.assert_allclose(float(ours), ref_loss.item(), rtol=1e-5)
