"""Core math tests: encoding, sampling, compositing, rays, normalization.

Oracles: independent numpy re-derivations of the reference formulas
(SURVEY.md §4 test strategy) and geometric invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np

from satnerf_tpu.core import (
    SceneNormalization,
    build_rays_from_rpc,
    construct_sun_dir,
    convert_sigmas,
    extras_component,
    positional_encoding,
    ray_component,
    sample_pdf,
    sample_rays,
)
from satnerf_tpu.geo import CoordinateSystemECEF, RPCModel


class TestEncoding:
    def test_manual_small_case(self):
        # reference ordering: per-freq [sin(fx), cos(fx)] blocks, no identity
        x = jnp.array([[0.1, -0.4, 2.0]])
        out = positional_encoding(x, n_freqs=2)
        assert out.shape == (1, 12)
        expected = np.concatenate(
            [
                np.sin(1.0 * np.array([0.1, -0.4, 2.0])),
                np.cos(1.0 * np.array([0.1, -0.4, 2.0])),
                np.sin(2.0 * np.array([0.1, -0.4, 2.0])),
                np.cos(2.0 * np.array([0.1, -0.4, 2.0])),
            ]
        )
        np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-6)

    def test_zero_freqs(self):
        x = jnp.ones((5, 3))
        assert positional_encoding(x, 0).shape == (5, 0)


class TestCompositing:
    def test_against_manual_numpy(self):
        # Hand-rolled reference math (ref: framework/util/rendering.py:4-34)
        rng = np.random.default_rng(0)
        sigmas = rng.normal(size=(4, 6)).astype(np.float32)
        z_vals = np.sort(rng.uniform(0, 2, size=(4, 6)).astype(np.float32), axis=1)

        deltas = np.diff(z_vals, axis=1)
        deltas = np.concatenate([deltas, np.full((4, 1), 1e10, np.float32)], axis=1)
        alphas = 1 - np.exp(-deltas * np.maximum(sigmas, 0))
        shifted = np.concatenate(
            [np.ones((4, 1), np.float32), 1 - alphas + 1e-10], axis=1
        )
        T = np.cumprod(shifted, axis=1)[:, :-1]
        w_ref = alphas * T
        depth_ref = np.sum(w_ref * z_vals, axis=1)

        w, depth, T2, a2 = convert_sigmas(jnp.asarray(sigmas), jnp.asarray(z_vals))
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(T2), T, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a2), alphas, atol=1e-6)

    def test_opaque_first_sample(self):
        # huge sigma at the first sample -> all weight on it, depth = z[0]
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (2, 8))
        sig = jnp.zeros((2, 8)).at[:, 0].set(1e8)
        w, depth, T, _ = convert_sigmas(sig, z)
        np.testing.assert_allclose(np.asarray(w[:, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), 1.0, atol=1e-5)

    def test_weights_sum_le_one(self):
        rng = np.random.default_rng(1)
        sig = jnp.asarray(rng.uniform(0, 5, (16, 64)).astype(np.float32))
        z = jnp.broadcast_to(jnp.linspace(0, 1, 64), (16, 64))
        w, *_ = convert_sigmas(sig, z)
        assert float(jnp.max(jnp.sum(w, axis=-1))) <= 1.0 + 1e-5


def _dummy_rays(n=32):
    rng = np.random.default_rng(2)
    o = rng.normal(size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    near = np.zeros((n, 1))
    far = rng.uniform(1.0, 2.0, size=(n, 1))
    return jnp.asarray(
        np.concatenate([o, d, near, far], axis=1).astype(np.float32)
    )


class TestSampling:
    def test_bounds_and_shape(self):
        rays = _dummy_rays()
        xyz, z = sample_rays(rays, 64, key=jax.random.PRNGKey(0))
        assert xyz.shape == (32, 64, 3)
        near = np.asarray(ray_component(rays, "near"))
        far = np.asarray(ray_component(rays, "far"))
        z = np.asarray(z)
        assert (z >= near - 1e-6).all() and (z <= far + 1e-6).all()
        # strictly increasing per ray
        assert (np.diff(z, axis=1) > 0).all()

    def test_deterministic_without_key(self):
        rays = _dummy_rays()
        _, z1 = sample_rays(rays, 16, key=None)
        _, z2 = sample_rays(rays, 16, key=None)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
        near = np.asarray(ray_component(rays, "near"))[:, 0]
        far = np.asarray(ray_component(rays, "far"))[:, 0]
        np.testing.assert_allclose(np.asarray(z1)[:, 0], near, atol=1e-6)
        np.testing.assert_allclose(np.asarray(z1)[:, -1], far, atol=1e-5)

    def test_points_on_ray(self):
        rays = _dummy_rays(8)
        xyz, z = sample_rays(rays, 4, key=jax.random.PRNGKey(1))
        o = np.asarray(ray_component(rays, "origins"))
        d = np.asarray(ray_component(rays, "directions"))
        expected = o[:, None] + d[:, None] * np.asarray(z)[..., None]
        np.testing.assert_allclose(np.asarray(xyz), expected, atol=1e-6)

    def test_sample_pdf_concentrates_mass(self):
        # all weight in one bin -> samples land in that bin
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
        weights = jnp.zeros((4, 8)).at[:, 3].set(100.0)
        s = sample_pdf(bins, weights, 32, key=jax.random.PRNGKey(2))
        s = np.asarray(s)
        frac_in_bin = ((s >= 3 / 8) & (s <= 4 / 8)).mean()
        assert frac_in_bin > 0.9

    def test_sample_pdf_det_uniform(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (2, 5))
        weights = jnp.ones((2, 4))
        s = np.asarray(sample_pdf(bins, weights, 5, det=True))
        np.testing.assert_allclose(s[0], np.linspace(0, 1, 5), atol=1e-5)


class TestRays:
    def _camera(self):
        rpc = RPCModel(
            row_offset=100.0, col_offset=100.0,
            lat_offset=30.33, lon_offset=-81.66, alt_offset=20.0,
            row_scale=100.0, col_scale=100.0,
            lat_scale=0.01, lon_scale=0.01, alt_scale=80.0,
        )
        rpc.col_num[1] = 1.0
        rpc.col_num[3] = 0.05
        rpc.row_num[2] = -1.0
        rpc.row_num[3] = 0.04
        return rpc

    def test_ray_geometry(self):
        cam = self._camera()
        cs = CoordinateSystemECEF()
        cols, rows = np.meshgrid(np.arange(0, 200, 37), np.arange(0, 200, 37))
        rays = build_rays_from_rpc(cam, cs, rows, cols, min_alt=-20.0, max_alt=60.0)
        assert rays.shape == (cols.size, 8)
        d = np.asarray(ray_component(rays, "directions"))
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
        assert (np.asarray(ray_component(rays, "near")) == 0).all()

        # origin must sit on the max-alt plane; origin + far*dir on min-alt
        from satnerf_tpu.geo import ecef_to_latlon

        o = np.asarray(ray_component(rays, "origins"), dtype=np.float64)
        far = np.asarray(ray_component(rays, "far"), dtype=np.float64)
        end = o + far * d
        _, _, alt_o = ecef_to_latlon(o[:, 0], o[:, 1], o[:, 2])
        _, _, alt_e = ecef_to_latlon(end[:, 0], end[:, 1], end[:, 2])
        np.testing.assert_allclose(alt_o, 60.0, atol=0.5)  # f32 packing
        np.testing.assert_allclose(alt_e, -20.0, atol=0.5)

    def test_sun_dir(self):
        sd = construct_sun_dir(90.0, 0.0, 4)
        assert sd.shape == (4, 3)
        np.testing.assert_allclose(sd[0], [0, 0, 1], atol=1e-7)
        sd = construct_sun_dir(0.0, 90.0, 1)
        np.testing.assert_allclose(sd[0], [1, 0, 0], atol=1e-7)

    def test_component_access(self):
        rays = _dummy_rays(4)
        assert ray_component(rays, "origin").shape == (4, 3)
        assert ray_component(rays, "dir").shape == (4, 3)
        assert ray_component(rays, "fars").shape == (4, 1)
        extras = jnp.zeros((4, 4))
        assert extras_component(extras, "sun_d").shape == (4, 3)
        assert extras_component(extras, "ts").shape == (4, 1)


class TestNormalization:
    def test_roundtrip_and_range(self, tmp_path):
        rays = np.asarray(_dummy_rays(128)) * 50.0
        norm = SceneNormalization.from_rays(rays)
        n_rays = norm.normalize_rays(rays.copy())

        o = ray_component(n_rays, "origins")
        d = ray_component(n_rays, "directions")
        f = ray_component(n_rays, "far")
        pts = np.concatenate([o, o + f * d], axis=0)
        assert np.abs(pts).max() <= 1.0 + 1e-5

        # xyz round trip
        xyz = np.asarray(ray_component(rays, "origins"))
        back = norm.denormalize_xyz(norm.normalize_xyz(xyz))
        np.testing.assert_allclose(back, xyz, atol=1e-4)  # f32 ray storage

        # json round trip
        fp = str(tmp_path / "norm" / "params.json")
        norm.save_json(fp)
        norm2 = SceneNormalization.from_json(fp)
        c1, r1 = norm.center_range()
        c2, r2 = norm2.center_range()
        np.testing.assert_allclose(c1, c2)
        assert r1 == r2


def test_sample_pdf_midpoint_matches_reference_sdf_sampler():
    """Our midpoint inverse-CDF sampler vs a torch transcription of the
    reference's sample_dists_from_pdf_sdf (framework/components/rendering.py:
    55-81, defined-but-unused SDF-style variant)."""
    import jax.numpy as jnp
    import numpy as np
    import torch
    import torch.nn.functional as torch_F

    from satnerf_tpu.core.sampling import sample_pdf_midpoint

    rng = np.random.default_rng(11)
    n, s, nf = 6, 8, 5
    edges = np.sort(rng.uniform(0, 1, (n, s + 1)).astype(np.float32), axis=1)
    w = rng.uniform(0.01, 1, (n, s)).astype(np.float32)

    ours = np.asarray(sample_pdf_midpoint(jnp.asarray(edges), jnp.asarray(w), nf))

    bin_t = torch.from_numpy(edges)[None]  # [1, R, S+1]
    w_t = torch.from_numpy(w)[None]
    pdf = torch_F.normalize(w_t, p=1, dim=-1)
    cdf = pdf.cumsum(dim=-1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], dim=-1)
    grid = torch.linspace(0, 1, nf + 1)
    unif = 0.5 * (grid[:-1] + grid[1:]).repeat(*cdf.shape[:-1], 1)
    idx = torch.searchsorted(cdf, unif, right=True)
    low = (idx - 1).clamp(min=0)
    high = idx.clamp(max=cdf.shape[-1] - 1)
    dist_min = bin_t.gather(dim=2, index=low)
    dist_max = bin_t.gather(dim=2, index=high)
    cdf_low = cdf.gather(dim=2, index=low)
    cdf_high = cdf.gather(dim=2, index=high)
    t = (unif - cdf_low) / (cdf_high - cdf_low + 1e-8)
    ref = (dist_min + t * (dist_max - dist_min))[0].numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-5)
