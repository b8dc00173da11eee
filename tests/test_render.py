"""Renderer tests across all four variants: shapes, ranges, solar-correction
outputs, jit-compatibility, and the bfloat16 compute path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satnerf_tpu.models import FieldConfig, init_field_params, init_embedding
from satnerf_tpu.render import RenderConfig, render_rays, render_image_chunked


def _rays(b=16, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.5, 0.5, (b, 3)).astype(np.float32)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    far = rng.uniform(0.5, 1.0, (b, 1)).astype(np.float32)
    rays = np.concatenate([o, d, np.zeros((b, 1), np.float32), far], 1)
    sun = rng.normal(size=(1, 3)); sun /= np.linalg.norm(sun)
    extras = np.concatenate(
        [np.tile(sun, (b, 1)).astype(np.float32),
         (np.arange(b) % 4).astype(np.float32)[:, None]], 1
    )
    return jnp.asarray(rays), jnp.asarray(extras)


def _params(fcfg, seed=0):
    key = jax.random.PRNGKey(seed)
    p = {"field": init_field_params(key, fcfg)}
    if fcfg.has_beta:
        p["t"] = init_embedding(jax.random.PRNGKey(seed + 1), 8, fcfg.t_embedding_tau)
    return p


SMALL = dict(layers=2, feat=64, skips=(1,))


@pytest.mark.parametrize("variant,mapping,siren", [
    ("nerf", True, False),
    ("snerf", False, True),
    ("satnerf", False, True),
    ("rs_semantic", True, True),
])
def test_variant_render_shapes(variant, mapping, siren):
    fcfg = FieldConfig(variant=variant, mapping=mapping, siren=siren, **SMALL)
    rcfg = RenderConfig(field=fcfg, n_samples=8, solar_correction=True)
    rays, extras = _rays()
    out = render_rays(_params(fcfg), rcfg, rays, extras, key=jax.random.PRNGKey(0))

    assert out["rgb"].shape == (16, 3)
    assert out["depth"].shape == (16,)
    assert out["weights"].shape == (16, 8)
    if variant == "nerf":
        assert "sun" not in out and "weights_sc" not in out
    else:
        assert out["sun"].shape == (16, 8, 1)
        assert out["sky"].shape == (16, 8, 3)
        # solar-correction second pass present (ref: rendering.py:47-66)
        assert out["weights_sc"].shape == (16, 8)
        assert out["sun_sc"].shape == (16, 8, 1)
        assert float(jnp.min(out["rgb"])) >= 0.0
        assert float(jnp.max(out["rgb"])) <= 1.0
    if variant in ("satnerf", "rs_semantic"):
        assert out["beta"].shape == (16, 8, 1)
        assert float(jnp.min(out["beta"])) >= 0.0
    if variant == "rs_semantic":
        assert out["semantic_logits"].shape == (16, 5)
        assert out["semantic_label"].shape == (16,)


def test_rs_semantic_ablation_heads():
    fcfg = FieldConfig(
        variant="rs_semantic", mapping=True, siren=True,
        use_separate_beta_for_s=True, use_tj_for_s=True,
        use_separate_tj_for_semantic=True, **SMALL
    )
    rcfg = RenderConfig(field=fcfg, n_samples=4, solar_correction=False)
    p = _params(fcfg)
    p["t_s"] = init_embedding(jax.random.PRNGKey(9), 8, fcfg.t_embedding_tau)
    rays, extras = _rays(8)
    out = render_rays(p, rcfg, rays, extras, key=jax.random.PRNGKey(1))
    assert out["beta_semantic"].shape == (8, 4, 1)


def test_render_jit_and_determinism():
    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(field=fcfg, n_samples=8)
    p = _params(fcfg)
    rays, extras = _rays()
    fn = jax.jit(lambda pp, r, e, k: render_rays(pp, rcfg, r, e, key=k))
    o1 = fn(p, rays, extras, jax.random.PRNGKey(3))
    o2 = fn(p, rays, extras, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(o1["rgb"]), np.asarray(o2["rgb"]))
    o3 = render_rays(p, rcfg, rays, extras, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(o1["rgb"]), np.asarray(o3["rgb"]), atol=1e-6
    )


def test_bfloat16_close_to_f32():
    fcfg = FieldConfig(variant="satnerf", **SMALL)
    p = _params(fcfg)
    rays, extras = _rays()
    out32 = render_rays(
        p, RenderConfig(field=fcfg, n_samples=8), rays, extras, key=None
    )
    out16 = render_rays(
        p, RenderConfig(field=fcfg, n_samples=8, compute_dtype="bfloat16"),
        rays, extras, key=None,
    )
    assert out16["rgb"].dtype == jnp.float32  # outputs stay f32
    np.testing.assert_allclose(
        np.asarray(out16["rgb"]), np.asarray(out32["rgb"]), atol=0.05
    )


def test_render_image_chunked_matches_unchunked():
    fcfg = FieldConfig(variant="satnerf", **SMALL)
    rcfg = RenderConfig(field=fcfg, n_samples=8)
    p = _params(fcfg)
    rays, extras = _rays(37)  # deliberately not a multiple of the chunk
    full = render_rays(p, rcfg, rays, extras, key=None)
    chunked = render_image_chunked(p, rcfg, np.asarray(rays), np.asarray(extras), chunk=16)
    assert chunked["rgb"].shape == (37, 3)
    np.testing.assert_allclose(chunked["rgb"], np.asarray(full["rgb"]), atol=1e-5)
    np.testing.assert_allclose(chunked["depth"], np.asarray(full["depth"]), atol=1e-5)


def test_n_full_head_pruning_matches_full_eval():
    """field_forward(n_full=k): sigma/sun_v cover all N points, every other
    head output equals the full evaluation sliced to the first k points."""
    from satnerf_tpu.models import field_forward

    fcfg = FieldConfig(variant="rs_semantic", mapping=True, siren=True,
                       n_classes=5, **SMALL)
    key = jax.random.PRNGKey(3)
    params = init_field_params(key, fcfg)
    n, k = 24, 10
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))
    sun = rng.normal(size=(n, 3)).astype(np.float32)
    sun /= np.linalg.norm(sun, axis=1, keepdims=True)
    sun = jnp.asarray(sun)
    t_emb = jnp.asarray(rng.normal(size=(n, fcfg.t_embedding_tau)).astype(np.float32))

    full = field_forward(params, fcfg, xyz, sun_d=sun, t_emb=t_emb)
    pruned = field_forward(params, fcfg, xyz, sun_d=sun, t_emb=t_emb, n_full=k)

    for name in ("sigma", "sun_v"):
        np.testing.assert_allclose(pruned[name], full[name], rtol=1e-6)
    for name in ("rgb", "sky", "beta", "semantic"):
        assert pruned[name].shape[0] == k, name
        np.testing.assert_allclose(pruned[name], full[name][:k], rtol=1e-6)


def test_solar_correction_outputs_unchanged_by_pruning():
    """The renderer's sc outputs (driven by sigma/sun_v on the appended sun
    rays) are identical whether or not the other heads are pruned there:
    render with solar_correction on and check sun_sc/weights_sc are finite
    and the main-half outputs match a render without the sc pass."""
    fcfg = FieldConfig(variant="rs_semantic", mapping=True, siren=True,
                       n_classes=5, **SMALL)
    rays, extras = _rays(b=8, seed=5)
    params = _params(fcfg, seed=2)
    rc_sc = RenderConfig(field=fcfg, n_samples=8, solar_correction=True)
    rc_no = RenderConfig(field=fcfg, n_samples=8, solar_correction=False)
    out_sc = render_rays(params, rc_sc, rays, extras, key=None)
    out_no = render_rays(params, rc_no, rays, extras, key=None)
    for name in ("rgb", "depth", "beta", "semantic_logits", "sun"):
        np.testing.assert_allclose(out_sc[name], out_no[name], rtol=1e-5,
                                   err_msg=name)
    for name in ("weights_sc", "transparency_sc", "sun_sc"):
        assert np.all(np.isfinite(out_sc[name])), name


class TestChunkedScanRemat:
    """remat_chunks (chunked-scan field eval) must be numerically identical
    to the direct eval — forward and gradients."""

    def _cfg(self, remat_chunks=0, trunk_impl="xla"):
        from satnerf_tpu.models.field import FieldConfig
        from satnerf_tpu.render.renderer import RenderConfig

        fcfg = FieldConfig(variant="rs_semantic", layers=2, feat=64,
                           skips=(1,), mapping=True, n_classes=5,
                           trunk_impl=trunk_impl)
        return RenderConfig(field=fcfg, n_samples=8, solar_correction=True,
                            remat_chunks=remat_chunks)

    def _data(self, b=20):
        import numpy as np

        rng = np.random.default_rng(0)
        o = rng.uniform(-0.4, 0.4, (b, 3)).astype(np.float32)
        d = np.tile([[0.0, 0.0, -1.0]], (b, 1)).astype(np.float32)
        rays = np.concatenate(
            [o, d, np.zeros((b, 1), np.float32), np.ones((b, 1), np.float32)],
            axis=1,
        )
        sun = np.tile([[0.3, 0.3, 0.9]], (b, 1)).astype(np.float32)
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        extras = np.concatenate(
            [sun, (np.arange(b) % 4)[:, None].astype(np.float32)], axis=1
        )
        return jnp.asarray(rays), jnp.asarray(extras)

    def test_forward_matches_direct(self):
        from satnerf_tpu.render.renderer import render_rays
        from satnerf_tpu.train.state import init_params

        rc0 = self._cfg(0)
        rc4 = self._cfg(4)
        params = init_params(jax.random.PRNGKey(0), rc0.field, t_vocab=4)
        rays, extras = self._data()
        o0 = render_rays(params, rc0, rays, extras, key=None)
        o4 = render_rays(params, rc4, rays, extras, key=None)
        assert set(o0) == set(o4)
        for k in o0:
            err = float(jnp.max(jnp.abs(o0[k] - o4[k])))
            assert err < 1e-5, (k, err)

    def test_forward_matches_uneven_tiles(self):
        """Point count not divisible by remat_chunks exercises the padding."""
        from satnerf_tpu.render.renderer import render_rays
        from satnerf_tpu.train.state import init_params

        rc0 = self._cfg(0)
        rc3 = self._cfg(3)
        params = init_params(jax.random.PRNGKey(0), rc0.field, t_vocab=4)
        rays, extras = self._data(b=17)  # 17*8 points, 3 tiles -> pad
        o0 = render_rays(params, rc0, rays, extras, key=None)
        o3 = render_rays(params, rc3, rays, extras, key=None)
        for k in o0:
            err = float(jnp.max(jnp.abs(o0[k] - o3[k])))
            assert err < 1e-5, (k, err)

    def test_grads_match_direct(self):
        from jax.flatten_util import ravel_pytree

        from satnerf_tpu.render.renderer import render_rays
        from satnerf_tpu.train.state import init_params

        rc0 = self._cfg(0)
        rc4 = self._cfg(4)
        params = init_params(jax.random.PRNGKey(0), rc0.field, t_vocab=4)
        rays, extras = self._data()

        def loss(rcfg):
            def f(p):
                o = render_rays(p, rcfg, rays, extras, key=None)
                return (
                    jnp.sum(o["rgb"] ** 2)
                    + jnp.sum(o["weights_sc"] * o["sun_sc"][..., 0])
                    + jnp.sum(o["semantic_logits"] ** 2)
                    + jnp.sum(o["beta"])
                )
            return f

        g0, _ = ravel_pytree(jax.grad(loss(rc0))(params))
        g4, _ = ravel_pytree(jax.grad(loss(rc4))(params))
        import numpy as np

        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g4), atol=2e-5, rtol=1e-4
        )

    def test_training_step_runs_under_jit(self):
        from satnerf_tpu.train.state import create_train_state, make_optimizer
        from satnerf_tpu.train.step import StepConfig, build_train_step

        rc = self._cfg(4)
        scfg = StepConfig(render=rc, steps_per_epoch=4, sc_lambda=0.05,
                          first_beta_epoch=0, semantic=True, car_index=4)
        opt = make_optimizer(1e-3, steps_per_epoch=4)
        state = create_train_state(jax.random.PRNGKey(0), rc.field, opt,
                                   t_vocab=4)
        step = jax.jit(build_train_step(scfg, opt))
        rays, extras = self._data(b=32)
        import numpy as np

        rng = np.random.default_rng(1)
        batch = {
            "rays": rays, "extras": extras,
            "rgbs": jnp.asarray(
                rng.uniform(0, 1, (32, 3)).astype(np.float32)
            ),
            "semantic": jnp.asarray(rng.integers(0, 5, (32, 1))),
            "semantic_sparsity_mask": jnp.ones(32, dtype=bool),
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))

    def test_forward_matches_with_fine_sampling(self):
        """remat_chunks composes with hierarchical (n_importance) passes."""
        from dataclasses import replace

        from satnerf_tpu.render.renderer import render_rays
        from satnerf_tpu.train.state import init_params

        rc0 = replace(self._cfg(0), n_importance=8)
        rc4 = replace(self._cfg(4), n_importance=8)
        params = init_params(jax.random.PRNGKey(0), rc0.field, t_vocab=4)
        rays, extras = self._data(b=12)
        o0 = render_rays(params, rc0, rays, extras, key=None)
        o4 = render_rays(params, rc4, rays, extras, key=None)
        for k in ("rgb", "depth", "weights", "semantic_logits"):
            err = float(jnp.max(jnp.abs(o0[k] - o4[k])))
            assert err < 1e-5, (k, err)
        err = float(jnp.max(jnp.abs(o0["coarse"]["rgb"] - o4["coarse"]["rgb"])))
        assert err < 1e-5


class TestScStride:
    """Strided solar-correction quadrature (RenderConfig.sc_stride): the sc
    half marches every k-th z rung; the main half must be bit-invariant."""

    def _cfg(self, stride, **kw):
        fcfg = FieldConfig(variant="satnerf", mapping=False, siren=True, **SMALL)
        return RenderConfig(
            field=fcfg, n_samples=8, solar_correction=True,
            sc_stride=stride, **kw,
        )

    def test_main_half_invariant_sc_shapes(self):
        rc1, rc2 = self._cfg(1), self._cfg(2)
        params = _params(rc1.field)
        rays, extras = _rays()
        o1 = render_rays(params, rc1, rays, extras, key=None)
        o2 = render_rays(params, rc2, rays, extras, key=None)
        # the main half sees the identical points/z ladder: bit-invariant
        for k in ("rgb", "depth", "weights", "transparency", "sun", "sky"):
            assert float(jnp.max(jnp.abs(o1[k] - o2[k]))) == 0.0, k
        # sc half at half the rungs, anchored at the far end
        assert o2["weights_sc"].shape == (16, 4)
        assert o2["transparency_sc"].shape == (16, 4)
        assert o2["sun_sc"].shape == (16, 4, 1)
        assert o1["weights_sc"].shape == (16, 8)
        for k in ("weights_sc", "transparency_sc", "sun_sc"):
            assert bool(jnp.all(jnp.isfinite(o2[k])))
        # the strided transmittance ladder subsamples the same sun march:
        # its first rung equals the full ladder's second (z index 1)
        assert float(jnp.max(jnp.abs(
            o2["sun_sc"][:, 0] - o1["sun_sc"][:, 1]
        ))) == 0.0

    def test_remat_chunks_matches_unchunked(self):
        rc = self._cfg(2)
        rcm = self._cfg(2, remat_chunks=2)
        params = _params(rc.field)
        rays, extras = _rays()
        o = render_rays(params, rc, rays, extras, key=None)
        om = render_rays(params, rcm, rays, extras, key=None)
        for k in ("rgb", "weights_sc", "transparency_sc", "sun_sc"):
            err = float(jnp.max(jnp.abs(o[k] - om[k])))
            assert err < 1e-5, (k, err)

    def test_hierarchical_pass_strided(self):
        rc = self._cfg(2, n_importance=8)
        params = _params(rc.field)
        rays, extras = _rays()
        out = render_rays(params, rc, rays, extras, key=None)
        # fine pass merges 8+8 rungs; stride 2 -> 8 sc rungs
        assert out["weights_sc"].shape == (16, 8)
        assert out["coarse"]["weights_sc"].shape == (16, 4)

    def test_grads_flow(self):
        from satnerf_tpu.train import losses

        rc = self._cfg(2)
        params = _params(rc.field)
        rays, extras = _rays()

        def loss_fn(p):
            out = render_rays(p, rc, rays, extras, key=None)
            gt = jnp.zeros_like(out["rgb"])
            return losses.snerf_loss(out, gt, lambda_sc=0.05)[0]

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)

    def test_term2_quadrature_invariant(self):
        """A constant integrand gives the same compensated term2 at any
        stride (the x(S/S_sc) rescale restores the full-ladder sum)."""
        from satnerf_tpu.train.losses import solar_correction_terms

        B, S = 4, 8
        base = {
            "weights": jnp.ones((B, S)) / S,
        }
        full = dict(base)
        full["sun_sc"] = jnp.full((B, S, 1), 0.25)
        full["transparency_sc"] = jnp.full((B, S), 0.75)
        full["weights_sc"] = jnp.ones((B, S)) / S
        half = dict(base)
        half["sun_sc"] = jnp.full((B, S // 2, 1), 0.25)
        half["transparency_sc"] = jnp.full((B, S // 2), 0.75)
        half["weights_sc"] = jnp.ones((B, S // 2)) / (S // 2)
        tf = solar_correction_terms(full, 0.05)
        th = solar_correction_terms(half, 0.05)
        assert abs(float(tf["coarse_sc_term2"] - th["coarse_sc_term2"])) < 1e-6
        assert abs(float(tf["coarse_sc_term3"] - th["coarse_sc_term3"])) < 1e-6

    def test_pallas_engine_strided_matches_xla(self):
        """The fused pallas field handles the mixed-count flat batch
        (B*S main + B*S_sc sc points) produced by sc_stride > 1."""
        base = dict(variant="satnerf", mapping=False, siren=True,
                    layers=2, feat=128, skips=(1,))
        fx = FieldConfig(trunk_impl="xla", **base)
        fp = FieldConfig(trunk_impl="pallas", **base)
        rcx = RenderConfig(field=fx, n_samples=8, solar_correction=True,
                           sc_stride=2)
        rcp = RenderConfig(field=fp, n_samples=8, solar_correction=True,
                           sc_stride=2)
        params = _params(fx)
        rays, extras = _rays()
        ox = render_rays(params, rcx, rays, extras, key=None)
        op = render_rays(params, rcp, rays, extras, key=None)
        for k in ("rgb", "depth", "weights_sc", "transparency_sc", "sun_sc"):
            err = float(jnp.max(jnp.abs(ox[k] - op[k])))
            assert err < 2e-4, (k, err)

    def test_non_divisible_stride_far_anchored(self):
        """stride 3 on an 8-rung ladder: the sc march still includes the
        deepest rung ((S-1)%k offset), so the transmittance integral
        reaches the full depth range."""
        rc1, rc3 = self._cfg(1), self._cfg(3)
        params = _params(rc1.field)
        rays, extras = _rays()
        o1 = render_rays(params, rc1, rays, extras, key=None)
        o3 = render_rays(params, rc3, rays, extras, key=None)
        assert o3["sun_sc"].shape == (16, 3, 1)  # indices 1, 4, 7
        assert float(jnp.max(jnp.abs(
            o3["sun_sc"][:, -1] - o1["sun_sc"][:, -1]
        ))) == 0.0

    def test_degenerate_stride_rejected(self):
        """Strides leaving <2 sc rungs would silently kill the sc loss —
        rejected at trace time."""
        import pytest as _pytest

        rc = self._cfg(5)  # 8-rung ladder: 5 > 8//2
        params = _params(rc.field)
        rays, extras = _rays()
        with _pytest.raises(ValueError, match="sc_stride"):
            render_rays(params, rc, rays, extras, key=None)
