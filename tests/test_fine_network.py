"""Hierarchical (fine) sampling tests — the feature the reference only
scaffolds (use_fine_network never enabled in its configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.models.field import FieldConfig
from satnerf_tpu.render.renderer import RenderConfig, render_rays
from satnerf_tpu.train.state import create_train_state, init_params, make_optimizer
from satnerf_tpu.train.step import StepConfig, build_train_step


def _rays(b=16, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, (b, 3)).astype(np.float32)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (b, 1))
    rays = np.concatenate(
        [o, d, np.zeros((b, 1), np.float32), np.ones((b, 1), np.float32)], 1
    )
    extras = np.concatenate(
        [np.tile([[0.3, 0.3, 0.9]], (b, 1)).astype(np.float32),
         rng.integers(0, 4, (b, 1)).astype(np.float32)], 1
    )
    return jnp.asarray(rays), jnp.asarray(extras)


SMALL = dict(layers=2, feat=64, skips=(1,))


def test_fine_pass_shapes_and_coarse_subdict():
    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=16, use_fine_network=True,
        solar_correction=True,
    )
    params = init_params(jax.random.PRNGKey(0), fcfg, t_vocab=4,
                         use_fine_network=True)
    rays, extras = _rays()
    out = render_rays(params, rcfg, rays, extras, key=jax.random.PRNGKey(1))
    # primary outputs at the combined sample count
    assert out["weights"].shape == (16, 24)
    assert out["rgb"].shape == (16, 3)
    assert "coarse" in out
    assert out["coarse"]["weights"].shape == (16, 8)
    assert out["coarse"]["rgb"].shape == (16, 3)
    # fine network params actually distinct
    assert not np.allclose(
        np.asarray(params["field"]["trunk"][0]["w"]),
        np.asarray(params["fine"]["trunk"][0]["w"]),
    )


def test_fine_samples_concentrate_where_coarse_weight_is():
    """Inverse-CDF samples land near the coarse density peak."""
    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(field=fcfg, n_samples=16, n_importance=32,
                        solar_correction=False)
    params = init_params(jax.random.PRNGKey(2), fcfg, t_vocab=4)
    rays, extras = _rays(8)
    out = render_rays(params, rcfg, rays, extras, key=jax.random.PRNGKey(3))
    # weight distribution of the fine pass is still normalised sanely
    w = np.asarray(out["weights"])
    assert w.shape == (8, 48)
    assert (w.sum(-1) <= 1.0 + 1e-5).all()


def test_training_with_fine_network_decreases_loss():
    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, use_fine_network=True,
        solar_correction=True,
    )
    scfg = StepConfig(render=rcfg, steps_per_epoch=4, sc_lambda=0.05,
                      first_beta_epoch=0)
    opt = make_optimizer(5e-3, steps_per_epoch=4)
    state = create_train_state(jax.random.PRNGKey(4), fcfg, opt, t_vocab=4,
                               use_fine_network=True)
    step = jax.jit(build_train_step(scfg, opt))
    rays, extras = _rays(64)
    rng = np.random.default_rng(1)
    batch = {
        "rays": rays, "extras": extras,
        "rgbs": jnp.asarray(rng.uniform(0.3, 0.7, (64, 3)).astype(np.float32)),
    }
    first = None
    for i in range(20):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if i == 0:
            first = float(metrics["loss"])
    assert "c_coarse_color" in metrics  # coarse pass supervised too
    assert float(metrics["loss"]) < first
    # both fields received gradient updates
    assert int(state.step) == 20


def test_fine_network_full_image_eval():
    """render_image_chunked must work with hierarchical sampling: the nested
    coarse dict is flattened to "_coarse"-suffixed keys (the reference's
    convention, framework/components/rendering.py:119-174) so eval can
    report both passes."""
    from satnerf_tpu.render.renderer import render_image_chunked

    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, use_fine_network=True,
        solar_correction=True,
    )
    params = init_params(jax.random.PRNGKey(7), fcfg, t_vocab=4,
                         use_fine_network=True)
    rays, extras = _rays(37)
    out = render_image_chunked(params, rcfg, np.asarray(rays),
                               np.asarray(extras), chunk=16)
    assert out["rgb"].shape == (37, 3)
    assert out["weights"].shape == (37, 16)
    assert "coarse" not in out
    assert out["rgb_coarse"].shape == (37, 3)
    assert out["depth_coarse"].shape == (37,)
    # per-sample coarse tensors are NOT hauled to host (eval reads per-ray)
    assert "weights_coarse" not in out
    # the flattened coarse outputs match an unchunked render with the same
    # deterministic (key=None) sampling
    ref = render_rays(params, rcfg, rays, extras, key=None)
    np.testing.assert_allclose(
        out["rgb_coarse"], np.asarray(ref["coarse"]["rgb"]), atol=1e-5
    )


def test_fine_network_eval_image_reports_coarse_metrics(tmp_path):
    """evaluate_image adds psnr_coarse/ssim_coarse for hierarchical runs."""
    from satnerf_tpu.eval.eval_nerf import evaluate_image

    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, use_fine_network=True,
        solar_correction=True,
    )
    params = init_params(jax.random.PRNGKey(7), fcfg, t_vocab=4,
                         use_fine_network=True)
    h = w = 6
    rays, extras = _rays(h * w)
    from satnerf_tpu.render.renderer import render_image_chunked

    res = render_image_chunked(params, rcfg, np.asarray(rays),
                               np.asarray(extras), chunk=16)
    rng = np.random.default_rng(0)
    img = {
        "h": h, "w": w, "name": "synthetic_000",
        "rays": np.asarray(rays),
        "rgbs": rng.uniform(0, 1, (h * w, 3)).astype(np.float32),
    }

    class _DS:  # minimal dataset stand-in: no GT DSM -> mae is nan-safe dict
        data = []

        def __getattr__(self, name):
            raise AttributeError(name)

    import satnerf_tpu.eval.eval_nerf as en

    orig = en.compute_dsm_and_mae
    en.compute_dsm_and_mae = lambda *a, **k: {"mean": "nan", "median": "nan"}
    try:
        out = evaluate_image(_DS(), img, res, str(tmp_path), step=0)
    finally:
        en.compute_dsm_and_mae = orig
    assert "psnr_coarse" in out and "ssim_coarse" in out
    assert float(out["psnr_coarse"]) > 0


def test_fine_network_semantic_coarse_keys_and_metrics(tmp_path):
    """Chunked render surfaces the coarse semantic per-ray keys, and
    evaluate_semantic_image reports coarse accuracy/mIoU for hierarchical
    runs (reference suffix convention, rendering.py:119-174)."""
    from satnerf_tpu.eval.eval_semantic import evaluate_semantic_image
    from satnerf_tpu.render.renderer import render_image_chunked

    fcfg = FieldConfig(variant="rs_semantic", mapping=True, **SMALL)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, use_fine_network=True,
        solar_correction=False,
    )
    params = init_params(jax.random.PRNGKey(9), fcfg, t_vocab=4,
                         use_fine_network=True)
    rays, extras = _rays(25)
    res = render_image_chunked(params, rcfg, np.asarray(rays),
                               np.asarray(extras), chunk=16)
    n_cls = fcfg.n_classes
    assert res["semantic_logits_coarse"].shape == (25, n_cls)
    assert res["semantic_label_coarse"].shape == (25,)

    class _DS:
        semantic_cls_labels = {i: f"c{i}" for i in range(n_cls)}
        semantic_n_classes = n_cls
        car_cls_idx = 4

    rng = np.random.default_rng(3)
    img = {
        "name": "synthetic_000",
        "semantic": rng.integers(0, n_cls, 25),
    }
    entry, _ = evaluate_semantic_image(_DS(), img, res, str(tmp_path), False)
    assert "semantic_accuracy_coarse" in entry and "mIoU_coarse" in entry
    assert 0.0 <= entry["semantic_accuracy_coarse"] <= 1.0


def test_fine_network_semantic_losses_cover_coarse_pass():
    from satnerf_tpu.train.state import create_train_state, make_optimizer
    from satnerf_tpu.train.step import StepConfig, build_train_step

    fcfg = FieldConfig(variant="rs_semantic", mapping=True, **SMALL)
    rcfg = RenderConfig(
        field=fcfg, n_samples=8, n_importance=8, use_fine_network=True,
        solar_correction=False,
    )
    scfg = StepConfig(render=rcfg, steps_per_epoch=4, semantic=True,
                      car_index=4, sc_lambda=0.0, first_beta_epoch=0)
    opt = make_optimizer(1e-3, steps_per_epoch=4)
    state = create_train_state(jax.random.PRNGKey(8), fcfg, opt, t_vocab=4,
                               use_fine_network=True)
    step = jax.jit(build_train_step(scfg, opt))
    rays, extras = _rays(32)
    rng = np.random.default_rng(2)
    batch = {
        "rays": rays, "extras": extras,
        "rgbs": jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32)),
        "semantic": jnp.asarray(rng.integers(0, 5, (32, 1))),
        "semantic_sparsity_mask": jnp.ones(32, dtype=bool),
    }
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "coarse_semantic" in metrics and "c_coarse_semantic" in metrics
    # coarse field's semantic head received gradient
    w_before = np.asarray(state.params["field"]["semantic"][0]["w"])
    w_after = np.asarray(state2.params["field"]["semantic"][0]["w"])
    assert not np.allclose(w_before, w_after)
