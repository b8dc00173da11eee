"""DSM subsystem tests: native build, registration recovers known shifts,
rasterizer correctness, and MAE on the synthetic scene with a known-perfect
prediction."""

import numpy as np
import pytest

from satnerf_tpu.ops import dsm_register, native
from satnerf_tpu.ops.rasterize import rasterize_mean, rasterize_mean_jax


class TestNative:
    def test_native_library_builds(self):
        assert native.get_lib() is not None, "C++ host kernels failed to build"


def _terrain(h=160, w=160, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    z = np.zeros((h, w))
    for _ in range(8):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        s, a = rng.uniform(5, 25), rng.uniform(3, 15)
        z += a * np.exp(-(((x - cx) ** 2 + (y - cy) ** 2) / (2 * s * s)))
    return z


class TestRegistration:
    def test_recovers_known_shift(self):
        z = _terrain()
        dx_true, dy_true, b_true = 3, -2, 1.7
        shifted = np.full_like(z, np.nan)
        # v(j, i) = u(j + dy, i + dx) + b  =>  apply_shift recovers u
        shifted[
            max(0, -dy_true) : z.shape[0] - max(0, dy_true),
            max(0, -dx_true) : z.shape[1] - max(0, dx_true),
        ] = z[
            max(0, dy_true) : z.shape[0] + min(0, dy_true),
            max(0, dx_true) : z.shape[1] + min(0, dx_true),
        ] - b_true
        dx, dy, a, b = dsm_register.compute_shift(z, shifted, scaling=False)
        assert (abs(dx), abs(dy)) == (abs(dx_true), abs(dy_true))
        assert a == 1.0
        assert abs(b - b_true) < 0.05
        out = dsm_register.apply_shift(shifted, dx, dy, a, b)
        m = np.isfinite(out)
        np.testing.assert_allclose(out[m], z[m], atol=0.05)

    def test_numpy_matches_native(self):
        z = _terrain(seed=1)
        v = np.roll(z, (2, -1), axis=(0, 1)) + 0.5
        lib = native.get_lib()
        assert lib is not None
        stats_native = dsm_register.mean_std(z, v, 1, 2)
        # force numpy fallback
        native._lib, saved = None, native._lib
        native._tried = True
        try:
            stats_np = dsm_register.mean_std(z, v, 1, 2)
        finally:
            native._lib = saved
        np.testing.assert_allclose(stats_native, stats_np, rtol=1e-10)

    def test_downsample_nan_aware(self):
        z = _terrain()
        z[10:20, 10:20] = np.nan
        d = dsm_register.downsample2x(z)
        assert d.shape == (80, 80)
        assert np.isnan(d[7, 7])  # fully-nan block
        assert np.isfinite(d[0, 0])


class TestRasterize:
    def test_mean_of_cell_points(self):
        # two points in one cell, radius 0 semantics via radius=0
        cloud = np.array([[10.2, 99.8, 5.0], [10.3, 99.7, 7.0]])
        grid = rasterize_mean(cloud, 10.0, 100.0, 1.0, 4, 4, radius=0)
        assert grid[0, 0] == 6.0
        assert np.isnan(grid[3, 3])

    def test_radius_splat(self):
        cloud = np.array([[10.5, 99.5, 4.0]])
        grid = rasterize_mean(cloud, 10.0, 100.0, 1.0, 5, 5, radius=1)
        # centre + 4-neighbourhood covered
        assert grid[0, 0] == 4.0
        assert grid[0, 1] == 4.0 and grid[1, 0] == 4.0
        assert np.isnan(grid[3, 3])

    def test_numpy_fallback_matches_native(self):
        rng = np.random.default_rng(2)
        cloud = np.stack(
            [rng.uniform(0, 50, 500), rng.uniform(0, 50, 500), rng.uniform(0, 10, 500)],
            axis=1,
        )
        g1 = rasterize_mean(cloud, 0.0, 50.0, 1.0, 50, 50, radius=1)
        native._lib, saved = None, native._lib
        try:
            g2 = rasterize_mean(cloud, 0.0, 50.0, 1.0, 50, 50, radius=1)
        finally:
            native._lib = saved
        np.testing.assert_allclose(g1, g2, equal_nan=True, atol=1e-12)

    def test_huge_finite_coords_rejected(self):
        """Finite-but-absurd coordinates (corrupt cloud / wrong CRS) must not
        reach the C++ double->int64 cast (UB outside int64 range): the point
        is simply dropped, identically in the native and numpy paths."""
        cloud = np.array(
            [
                [1e300, 25.0, 5.0],   # col overflows int64
                [25.0, -1e300, 5.0],  # row overflows int64
                [-1e18, 25.0, 5.0],   # far outside but castable
                [25.0, 25.0, 7.0],    # in-grid control point
            ]
        )
        g1 = rasterize_mean(cloud, 0.0, 50.0, 1.0, 50, 50, radius=1)
        native._lib, saved = None, native._lib
        try:
            g2 = rasterize_mean(cloud, 0.0, 50.0, 1.0, 50, 50, radius=1)
        finally:
            native._lib = saved
        np.testing.assert_allclose(g1, g2, equal_nan=True, atol=1e-12)
        assert g1[25, 25] == 7.0  # the sane point still lands

    def test_jax_scatter_matches_radius0(self):
        rng = np.random.default_rng(3)
        cloud = np.stack(
            [rng.uniform(0, 20, 300), rng.uniform(0, 20, 300), rng.uniform(0, 5, 300)],
            axis=1,
        )
        g_host = rasterize_mean(cloud, 0.0, 20.0, 1.0, 20, 20, radius=0)
        import jax.numpy as jnp

        g_dev = np.asarray(
            rasterize_mean_jax(jnp.asarray(cloud), 0.0, 20.0, 1.0, 20, 20)
        )
        np.testing.assert_allclose(g_dev, g_host, equal_nan=True, atol=1e-5)


class TestMaeEndToEnd:
    def test_perfect_prediction_gives_small_mae(self, tmp_path):
        """Back-project the TRUE surface of the synthetic scene -> MAE ~ 0."""
        from satnerf_tpu.configs import MainConfig, RSSemanticConfig, RunConfig
        from satnerf_tpu.datasets import SatNeRFDataset
        from satnerf_tpu.datasets.synthetic import generate_scene
        from satnerf_tpu.eval.dsm import compute_dsm_and_mae

        scene_dp = tmp_path / "ds" / "SYN_MAE"
        generate_scene(str(scene_dp), n_train=2, n_test=1, img_size=64)
        run = RunConfig(
            dataset_name="SYN_MAE", datasets_dp=str(tmp_path / "ds"),
            cache_dp=str(tmp_path / "cache"), workspace_dp=str(tmp_path / "train"),
        )
        cfg = MainConfig(run, RSSemanticConfig())
        ds = SatNeRFDataset(cfg, "rgb", "train")
        ds.load()
        ds.initialize_normalization(ds.combined["rays"])
        ds.normalize()

        # ground-truth depth: intersect each ray with the true heightfield by
        # brute-force sampling along the ray
        item = ds.data[0]
        rays = item["rays"]
        lats0, lons0, alts0 = ds.get_latlonalt_from_nerf_prediction(
            rays, np.zeros(rays.shape[0])
        )
        fars = rays[:, 7].astype(np.float64)
        # sample along each ray, pick first point below surface
        from satnerf_tpu.datasets.synthetic import SceneModel, _make_utm_frame

        scene = SceneModel(seed=0)
        e0, n0, zs, xy2ll, ll2xy = _make_utm_frame()
        n_s = 96
        ts = np.linspace(0, 1, n_s)
        depths = np.zeros(rays.shape[0])
        lat, lon, alt = ds.get_latlonalt_from_nerf_prediction(rays, fars * 0)
        for i in range(0, rays.shape[0], 4096):
            sl = slice(i, min(i + 4096, rays.shape[0]))
            r = rays[sl]
            zcand = r[:, None, 7] * ts[None, :]
            flat = np.repeat(r, n_s, axis=0)
            lats, lons, alts = ds.get_latlonalt_from_nerf_prediction(
                flat, zcand.reshape(-1)
            )
            x, y = ll2xy(lons, lats)
            h = scene.height(x, y)
            below = (alts <= h).reshape(-1, n_s)
            first = np.argmax(below, axis=1)
            none = ~below.any(axis=1)
            first[none] = n_s - 1
            depths[sl] = zcand[np.arange(zcand.shape[0]), first]

        mae = compute_dsm_and_mae(
            ds, rays, depths, str(tmp_path / "out"), "SYN", 0
        )
        assert float(mae["mean"]) < 1.0, mae
