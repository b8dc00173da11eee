"""Numerics tests for the fused Pallas SIREN-trunk kernel
(satnerf_tpu/ops/pallas/trunk.py) against the reference XLA layer chain.
Runs in interpreter mode on the CPU test backend."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from satnerf_tpu.models.field import (
    FieldConfig,
    field_forward,
    init_field_params,
)
from satnerf_tpu.ops.pallas.trunk import TrunkSpec, fused_trunk, pack_trunk


def _cfg_pair(**kw):
    base = dict(variant="satnerf", siren=True, **kw)
    return (
        FieldConfig(trunk_impl="xla", **base),
        FieldConfig(trunk_impl="pallas", **base),
    )


def _inputs(key, n, cfg):
    k1, k2, k3 = jax.random.split(key, 3)
    xyz = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    sun_d = jnp.tile(jnp.array([[0.3, 0.4, -0.866]]), (n, 1))
    t_emb = jax.random.normal(k3, (n, cfg.t_embedding_tau)) * 0.1
    return xyz, sun_d, t_emb


CASES = [
    # (layers, feat, skips, mapping, n)
    (8, 512, (4,), True, 700),     # flagship shape, ragged row count
    (8, 512, (4,), False, 512),    # raw-xyz SIREN (satnerf default)
    (3, 128, (1,), True, 130),     # small, odd N
    (2, 128, (), False, 256),      # no skip
    (4, 256, (1, 3), True, 384),   # multiple skips
]


class TestFusedTrunkForward:
    @pytest.mark.parametrize("layers,feat,skips,mapping,n", CASES)
    def test_matches_xla_path(self, layers, feat, skips, mapping, n):
        cfg_x, cfg_p = _cfg_pair(
            layers=layers, feat=feat, skips=skips, mapping=mapping
        )
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), n, cfg_x)
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb)
        assert set(out_x) == set(out_p)
        for k in out_x:
            assert out_p[k].shape == out_x[k].shape
            err = float(jnp.max(jnp.abs(out_x[k] - out_p[k])))
            assert err < 5e-5, (k, err)

    def test_bfloat16_compute(self):
        cfg_x, cfg_p = _cfg_pair(layers=3, feat=128, skips=(1,), mapping=True)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 200, cfg_x)
        out_x = field_forward(
            params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb,
            compute_dtype=jnp.bfloat16,
        )
        out_p = field_forward(
            params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb,
            compute_dtype=jnp.bfloat16,
        )
        for k in out_x:
            err = float(jnp.max(jnp.abs(out_x[k].astype(jnp.float32)
                                        - out_p[k].astype(jnp.float32))))
            assert err < 0.1, (k, err)  # bf16 rounding dominates

    def test_under_jit(self):
        cfg_x, cfg_p = _cfg_pair(layers=3, feat=128, skips=(1,), mapping=False)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 257, cfg_x)
        f = jax.jit(
            lambda p, x: field_forward(p, cfg_p, x, sun_d=sun_d, t_emb=t_emb)
        )
        out_j = f(params, xyz)
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        for k in out_x:
            assert float(jnp.max(jnp.abs(out_j[k] - out_x[k]))) < 5e-5


class TestFusedTrunkBackward:
    @pytest.mark.parametrize(
        "layers,feat,skips,mapping,n", [CASES[0], CASES[3], CASES[4]]
    )
    def test_grads_match_xla_path(self, layers, feat, skips, mapping, n):
        cfg_x, cfg_p = _cfg_pair(
            layers=layers, feat=feat, skips=skips, mapping=mapping
        )
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), n, cfg_x)

        def loss(cfg):
            def f(p, x):
                o = field_forward(p, cfg, x, sun_d=sun_d, t_emb=t_emb)
                return sum(jnp.sum(v ** 2) for v in o.values())
            return f

        gx = jax.grad(loss(cfg_x), argnums=(0, 1))(params, xyz)
        gp = jax.grad(loss(cfg_p), argnums=(0, 1))(params, xyz)
        fx, _ = ravel_pytree(gx)
        fp, _ = ravel_pytree(gp)
        fx, fp = np.asarray(fx), np.asarray(fp)
        # overall gradient direction must agree tightly; elementwise noise
        # from the cos-approximation in the backward kernel is ~1e-4 abs
        norm_rel = abs(np.linalg.norm(fx) - np.linalg.norm(fp)) / np.linalg.norm(fx)
        assert norm_rel < 1e-4
        cos_sim = float(fx @ fp / (np.linalg.norm(fx) * np.linalg.norm(fp)))
        assert cos_sim > 1.0 - 1e-6
        denom = np.maximum(np.abs(fx), 1e-1 * np.abs(fx).mean() + 1e-3)
        assert np.max(np.abs(fx - fp) / denom) < 0.05

    def test_value_and_grad_finite_bf16(self):
        cfg_x, cfg_p = _cfg_pair(layers=3, feat=128, skips=(1,), mapping=True)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 128, cfg_x)

        def f(p):
            o = field_forward(
                p, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb,
                compute_dtype=jnp.bfloat16,
            )
            return jnp.sum(o["sigma"]) + jnp.sum(o["rgb"])

        v, g = jax.value_and_grad(f)(params)
        flat, _ = ravel_pytree(g)
        assert np.isfinite(float(v))
        assert np.all(np.isfinite(np.asarray(flat)))


class TestStoredBackward:
    """trunk_bwd="stored": the forward emits pre-activation residuals to
    HBM and the VJP consumes them instead of recomputing — the gradients
    must match the recompute engine to float tolerance (both read the
    same compute-dtype pre-activations)."""

    @pytest.mark.parametrize("n", [700, 512, 130])
    def test_fused_trunk_stored_equals_recompute(self, n):
        # n=700 exercises the FWD_TILE=512 padding vs BWD_TILE=256
        # padding mismatch (acts sliced to the backward's row padding)
        cfg = FieldConfig(variant="satnerf", siren=True, layers=3, feat=128,
                          skips=(1,), mapping=True)
        spec_r = TrunkSpec(layers=3, feat=128, skips=(1,), c_in=cfg.xyz_in)
        spec_s = dataclasses.replace(spec_r, bwd="stored")
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, cfg.xyz_in),
                               minval=-1.0, maxval=1.0)

        def loss(spec):
            def f(trunk_params, x):
                packed = pack_trunk(trunk_params, spec, jnp.float32)
                return jnp.sum(fused_trunk(spec, True, x, packed) ** 2)
            return f

        vr, gr = jax.value_and_grad(loss(spec_r), argnums=(0, 1))(
            params["trunk"], x
        )
        vs, gs = jax.value_and_grad(loss(spec_s), argnums=(0, 1))(
            params["trunk"], x
        )
        assert float(abs(vr - vs)) < 1e-5 * abs(float(vr))
        fr, _ = ravel_pytree(gr)
        fs, _ = ravel_pytree(gs)
        np.testing.assert_allclose(np.asarray(fr), np.asarray(fs),
                                   rtol=1e-5, atol=1e-5)

    def test_fused_field_stored_equals_recompute(self):
        base = dict(
            variant="rs_semantic", siren=True, layers=2, feat=128,
            skips=(1,), mapping=True, n_classes=5, trunk_impl="pallas",
        )
        cfg_r = FieldConfig(trunk_bwd="recompute", **base)
        cfg_s = FieldConfig(trunk_bwd="stored", **base)
        params = init_field_params(jax.random.PRNGKey(0), cfg_r)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 320, cfg_r)

        def loss(cfg):
            def f(p, x):
                o = field_forward(p, cfg, x, sun_d=sun_d, t_emb=t_emb)
                return sum(jnp.sum(v ** 2) for v in o.values())
            return f

        gr = jax.grad(loss(cfg_r), argnums=(0, 1))(params, xyz)
        gs = jax.grad(loss(cfg_s), argnums=(0, 1))(params, xyz)
        fr, _ = ravel_pytree(gr)
        fs, _ = ravel_pytree(gs)
        np.testing.assert_allclose(np.asarray(fr), np.asarray(fs),
                                   rtol=1e-5, atol=1e-5)

    def test_stored_eval_path_emits_no_residuals(self):
        # the primal (non-differentiated) call of a stored-mode spec must
        # not allocate the (L, N, F) activation output
        cfg = FieldConfig(variant="satnerf", siren=True, layers=2, feat=128,
                          skips=(1,), mapping=True)
        spec_s = TrunkSpec(layers=2, feat=128, skips=(1,), c_in=cfg.xyz_in,
                           bwd="stored")
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, cfg.xyz_in))
        packed = pack_trunk(params["trunk"], spec_s, jnp.float32)
        out = fused_trunk(spec_s, True, x, packed)
        assert out.shape == (64, 128)
        # and it matches the recompute-spec primal exactly (same program)
        spec_r = dataclasses.replace(spec_s, bwd="recompute")
        out_r = fused_trunk(spec_r, True, x, packed)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_r))


class TestPackTrunk:
    def test_pack_shapes(self):
        cfg = FieldConfig(
            variant="satnerf", layers=8, feat=512, skips=(4,), siren=True,
            mapping=True,
        )
        params = init_field_params(jax.random.PRNGKey(0), cfg)
        spec = TrunkSpec(layers=8, feat=512, skips=(4,), c_in=cfg.xyz_in)
        packed = pack_trunk(params["trunk"], spec, jnp.float32)
        assert packed["w0"].shape == (128, 512)
        assert packed["w_mid"].shape == (7, 512, 512)
        assert packed["w_skip"].shape == (1, 128, 512)
        assert packed["b"].shape == (8, 512)
        # zero padding beyond the true input width
        assert float(jnp.abs(packed["w0"][cfg.xyz_in:, :]).max()) == 0.0


class TestFusedFullField:
    """Full trunk+heads kernel (ops/pallas/field_fused.py) vs the XLA path."""

    @pytest.mark.parametrize(
        "variant,mapping,flags",
        [
            ("rs_semantic", True, {}),
            ("rs_semantic", True, {"use_tj_for_s": True}),
            ("rs_semantic", True, {"semantic_sigmoid": False}),
            ("satnerf", False, {}),
            ("snerf", False, {}),
        ],
    )
    def test_forward_matches(self, variant, mapping, flags):
        base = dict(layers=4, feat=256, skips=(2,), siren=True,
                    mapping=mapping, n_classes=5, **flags)
        cfg_x = FieldConfig(variant=variant, trunk_impl="xla", **base)
        cfg_p = FieldConfig(variant=variant, trunk_impl="pallas", **base)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 300, cfg_x)
        if variant == "snerf":
            t_emb = None
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb)
        assert set(out_x) == set(out_p)
        for k in out_x:
            assert out_p[k].shape == out_x[k].shape
            err = float(jnp.max(jnp.abs(out_x[k] - out_p[k])))
            assert err < 5e-5, (k, err)

    def test_grads_match(self):
        base = dict(variant="rs_semantic", layers=4, feat=256, skips=(2,),
                    siren=True, mapping=True, n_classes=5)
        cfg_x = FieldConfig(trunk_impl="xla", **base)
        cfg_p = FieldConfig(trunk_impl="pallas", **base)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 260, cfg_x)

        def loss(cfg):
            def f(p, x):
                o = field_forward(p, cfg, x, sun_d=sun_d, t_emb=t_emb)
                return sum(jnp.sum(v ** 2) for v in o.values())
            return f

        gx = jax.grad(loss(cfg_x), argnums=(0, 1))(params, xyz)
        gp = jax.grad(loss(cfg_p), argnums=(0, 1))(params, xyz)
        fx, _ = ravel_pytree(gx)
        fp, _ = ravel_pytree(gp)
        fx, fp = np.asarray(fx), np.asarray(fp)
        cos = float(fx @ fp / (np.linalg.norm(fx) * np.linalg.norm(fp)))
        assert cos > 1.0 - 1e-6
        assert abs(np.linalg.norm(fx) - np.linalg.norm(fp)) < 1e-3 * np.linalg.norm(fx)

    def test_separate_semantic_embedding(self):
        base = dict(variant="rs_semantic", layers=2, feat=128, skips=(1,),
                    siren=True, mapping=True, n_classes=5,
                    use_tj_for_s=True, use_separate_tj_for_semantic=True)
        cfg_x = FieldConfig(trunk_impl="xla", **base)
        cfg_p = FieldConfig(trunk_impl="pallas", **base)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 150, cfg_x)
        t_s = jax.random.normal(jax.random.PRNGKey(5), t_emb.shape) * 0.1
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb,
                              t_s_emb=t_s)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb,
                              t_s_emb=t_s)
        for k in out_x:
            assert float(jnp.max(jnp.abs(out_x[k] - out_p[k]))) < 5e-5

    def test_unsupported_flags_fall_back(self):
        # use_separate_beta_for_s is not in the kernel -> must still work
        # (XLA fallback) and agree with the xla-impl config
        base = dict(variant="rs_semantic", layers=2, feat=128, skips=(1,),
                    siren=True, mapping=True, n_classes=5,
                    use_separate_beta_for_s=True)
        cfg_x = FieldConfig(trunk_impl="xla", **base)
        cfg_p = FieldConfig(trunk_impl="pallas", **base)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 100, cfg_x)
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb)
        assert "beta_semantic" not in out_x  # separate beta key name check
        for k in out_x:
            assert float(jnp.max(jnp.abs(out_x[k] - out_p[k]))) < 5e-5


class TestScAwareFusedField:
    """The sc-aware split (FieldSpec(heads_on=False) on the solar-correction
    half) must be numerically identical to the XLA path's n_full pruning."""

    BASE = dict(variant="rs_semantic", layers=4, feat=256, skips=(2,),
                siren=True, mapping=True, n_classes=5)

    def _setup(self, n=320, nf=192):
        cfg_x = FieldConfig(trunk_impl="xla", **self.BASE)
        cfg_p = FieldConfig(trunk_impl="pallas", **self.BASE)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), n, cfg_x)
        return cfg_x, cfg_p, params, xyz, sun_d, t_emb, nf

    def test_forward_matches_with_n_full(self):
        cfg_x, cfg_p, params, xyz, sun_d, t_emb, nf = self._setup()
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb,
                              n_full=nf)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb,
                              n_full=nf)
        assert set(out_x) == set(out_p)
        # heads restricted to the first nf points, sigma/sun over all
        assert out_p["rgb"].shape[0] == nf
        assert out_p["semantic"].shape[0] == nf
        assert out_p["sigma"].shape[0] == xyz.shape[0]
        assert out_p["sun_v"].shape[0] == xyz.shape[0]
        for k in out_x:
            err = float(jnp.max(jnp.abs(out_x[k] - out_p[k])))
            assert err < 5e-5, (k, err)

    def test_grads_match_with_n_full(self):
        cfg_x, cfg_p, params, xyz, sun_d, t_emb, nf = self._setup(n=256,
                                                                  nf=128)

        def loss(cfg):
            def f(p, x):
                o = field_forward(p, cfg, x, sun_d=sun_d, t_emb=t_emb,
                                  n_full=nf)
                return sum(jnp.sum(v ** 2) for v in o.values())
            return f

        gx = jax.grad(loss(cfg_x), argnums=(0, 1))(params, xyz)
        gp = jax.grad(loss(cfg_p), argnums=(0, 1))(params, xyz)
        fx, _ = ravel_pytree(gx)
        fp, _ = ravel_pytree(gp)
        fx, fp = np.asarray(fx), np.asarray(fp)
        cos = float(fx @ fp / (np.linalg.norm(fx) * np.linalg.norm(fp)))
        assert cos > 1.0 - 1e-6
        assert (
            abs(np.linalg.norm(fx) - np.linalg.norm(fp))
            < 1e-3 * np.linalg.norm(fx)
        )

    def test_renderer_solar_correction_equivalence(self):
        """End to end: fused render with sc pass, pallas vs xla."""
        from satnerf_tpu.render.renderer import RenderConfig, render_rays
        from satnerf_tpu.train.state import init_params

        cfg_x, cfg_p, params_f, _, _, _, _ = self._setup()
        params = {"field": params_f,
                  "t": jax.random.normal(jax.random.PRNGKey(3), (8, 4)) * 0.1}
        rng = np.random.default_rng(0)
        b = 24
        o = rng.uniform(-0.4, 0.4, (b, 3)).astype(np.float32)
        d = np.tile([[0.0, 0.0, -1.0]], (b, 1)).astype(np.float32)
        rays = jnp.asarray(np.concatenate(
            [o, d, np.zeros((b, 1), np.float32), np.ones((b, 1), np.float32)],
            axis=1,
        ))
        sun = np.tile([[0.3, 0.3, 0.9]], (b, 1)).astype(np.float32)
        sun /= np.linalg.norm(sun, axis=1, keepdims=True)
        extras = jnp.asarray(np.concatenate(
            [sun, (np.arange(b) % 8)[:, None].astype(np.float32)], axis=1
        ))
        rx = RenderConfig(field=cfg_x, n_samples=8, solar_correction=True)
        rp = RenderConfig(field=cfg_p, n_samples=8, solar_correction=True)
        ox = render_rays(params, rx, rays, extras, key=None)
        op = render_rays(params, rp, rays, extras, key=None)
        for k in ("rgb", "depth", "beta", "weights_sc", "sun_sc",
                  "transparency_sc", "semantic_logits"):
            err = float(jnp.max(jnp.abs(ox[k] - op[k])))
            assert err < 5e-5, (k, err)


class TestPoly5Kernels:
    """sin_impl="poly5" runs inside the Pallas kernels (TrunkSpec.sin5) and
    matches the XLA poly5 path to the same tolerance as the degree-7 pair."""

    def test_trunk_forward_matches_xla_poly5(self):
        cfg_x, cfg_p = _cfg_pair(
            layers=4, feat=256, skips=(2,), mapping=True, sin_impl="poly5"
        )
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 384, cfg_x)
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb)
        for k in out_x:
            err = float(jnp.max(jnp.abs(out_x[k] - out_p[k])))
            assert err < 5e-4, (k, err)

    def test_trunk_grads_match_xla_poly5(self):
        cfg_x, cfg_p = _cfg_pair(
            layers=3, feat=128, skips=(1,), mapping=True, sin_impl="poly5"
        )
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 256, cfg_x)

        def loss(cfg):
            def f(p, x):
                o = field_forward(p, cfg, x, sun_d=sun_d, t_emb=t_emb)
                return sum(jnp.sum(v ** 2) for v in o.values())
            return f

        gx = jax.grad(loss(cfg_x), argnums=(0, 1))(params, xyz)
        gp = jax.grad(loss(cfg_p), argnums=(0, 1))(params, xyz)
        fx, _ = ravel_pytree(gx)
        fp, _ = ravel_pytree(gp)
        fx, fp = np.asarray(fx), np.asarray(fp)
        cos_sim = float(fx @ fp / (np.linalg.norm(fx) * np.linalg.norm(fp)))
        assert cos_sim > 1.0 - 1e-5

    def test_fused_field_forward_matches_xla_poly5(self):
        base = dict(
            variant="rs_semantic", siren=True, layers=2, feat=128,
            skips=(1,), mapping=True, n_classes=5, sin_impl="poly5",
        )
        cfg_x = FieldConfig(trunk_impl="xla", **base)
        cfg_p = FieldConfig(trunk_impl="pallas", **base)
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 320, cfg_x)
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb)
        assert set(out_x) == set(out_p)
        for k in out_x:
            err = float(jnp.max(jnp.abs(out_x[k] - out_p[k])))
            assert err < 5e-4, (k, err)

    def test_sin_mode_specs_are_distinct_programs(self):
        # same shapes, different sine variant -> different (hashable) specs,
        # so the jit cache cannot alias the programs
        specs = [
            TrunkSpec(layers=2, feat=128, skips=(1,), c_in=63, sin_mode=m)
            for m in ("poly", "poly5", "poly7f")
        ]
        assert len(set(specs)) == 3 and len({hash(s) for s in specs}) == 3

    def test_trunk_forward_matches_xla_poly7f(self):
        cfg_x, cfg_p = _cfg_pair(
            layers=4, feat=256, skips=(2,), mapping=True, sin_impl="poly7f"
        )
        params = init_field_params(jax.random.PRNGKey(0), cfg_x)
        xyz, sun_d, t_emb = _inputs(jax.random.PRNGKey(1), 384, cfg_x)
        out_x = field_forward(params, cfg_x, xyz, sun_d=sun_d, t_emb=t_emb)
        out_p = field_forward(params, cfg_p, xyz, sun_d=sun_d, t_emb=t_emb)
        for k in out_x:
            err = float(jnp.max(jnp.abs(out_x[k] - out_p[k])))
            assert err < 5e-4, (k, err)
