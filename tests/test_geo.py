"""Geo foundation tests: ECEF, UTM, RPC.

Oracles: closed-form round trips, known UTM reference vectors, and RPC
projection/localization consistency on synthetic rational cameras.
"""

import numpy as np
import pytest

from satnerf_tpu.geo import (
    RPCModel,
    ecef_to_latlon,
    latlon_to_ecef,
    latlon_from_utm,
    latlon_to_zone_string,
    rescale_rpc,
    split_zone_string,
    utm_from_latlon,
    zonestring_to_hemisphere,
)
from satnerf_tpu.geo.rpc import fit_rpc_from_projections


class TestEcef:
    def test_roundtrip_jacksonville(self):
        # DFC2019 Jacksonville area
        lat = np.array([30.3322, 30.30, 30.35])
        lon = np.array([-81.6557, -81.70, -81.60])
        alt = np.array([0.0, 35.0, -10.0])
        x, y, z = latlon_to_ecef(lat, lon, alt)
        lat2, lon2, alt2 = ecef_to_latlon(x, y, z)
        # the reference inverse is a single-pass approximation: centimetre-level
        np.testing.assert_allclose(lat2, lat, atol=1e-7)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(alt2, alt, atol=1e-2)

    def test_known_point_equator(self):
        x, y, z = latlon_to_ecef(0.0, 0.0, 0.0)
        assert abs(x - 6378137.0) < 1e-6
        assert abs(y) < 1e-6
        assert abs(z) < 1e-6

    def test_known_point_pole(self):
        x, y, z = latlon_to_ecef(90.0, 0.0, 0.0)
        # WGS84 polar radius b = a*(1-f)
        b = 6378137.0 * (1 - 1 / 298.257223563)
        assert abs(z - b) < 1e-5
        assert abs(x) < 1e-3


class TestUtm:
    def test_known_vector(self):
        # utm package doctest vector: (51.2, 7.5) -> 395201.31, 5673135.24, 32U
        e, n, zs = utm_from_latlon(np.array([51.2]), np.array([7.5]))
        assert zs == "32U"
        assert abs(e[0] - 395201.31) < 0.05
        assert abs(n[0] - 5673135.24) < 0.05

    def test_roundtrip_jacksonville(self):
        lat = np.linspace(30.30, 30.36, 50)
        lon = np.linspace(-81.71, -81.59, 50)
        e, n, zs = utm_from_latlon(lat, lon)
        assert zs == "17R"
        lat2, lon2 = latlon_from_utm(e, n, zs)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)

    def test_southern_hemisphere_roundtrip(self):
        lat = np.array([-33.9, -33.95])
        lon = np.array([18.4, 18.5])
        e, n, zs = utm_from_latlon(lat, lon)
        assert (n > 0).all()  # false northing applied
        lat2, lon2 = latlon_from_utm(e, n, zs)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)

    def test_zone_edge_roundtrip_submillimetre(self):
        # the D6 latitude series term must carry the correct sign; at ~3 deg
        # from the central meridian the wrong sign shows up at the mm level
        lat = np.linspace(31.9, 32.1, 9)
        lon = np.linspace(-78.3, -78.1, 9)
        e, n, zs = utm_from_latlon(lat, lon)
        lat2, lon2 = latlon_from_utm(e, n, zs)
        assert np.abs(lat2 - lat).max() * 110540.0 < 1e-4  # < 0.1 mm
        # longitude series is truncated at d5: sub-millimetre, not sub-0.1mm
        assert np.abs(lon2 - lon).max() * 94000.0 < 1e-3

    def test_zone_helpers(self):
        assert split_zone_string("17R") == (17, "R")
        assert zonestring_to_hemisphere("17R") == "17N"
        assert zonestring_to_hemisphere("34H") == "34S"
        assert latlon_to_zone_string(30.33, -81.66) == "17R"


def _synthetic_rpc():
    """A well-conditioned synthetic RPC with nontrivial nonlinear terms."""
    rng = np.random.default_rng(0)
    rpc = RPCModel(
        row_offset=512.0,
        col_offset=512.0,
        lat_offset=30.33,
        lon_offset=-81.66,
        alt_offset=20.0,
        row_scale=512.0,
        col_scale=512.0,
        lat_scale=0.05,
        lon_scale=0.05,
        alt_scale=100.0,
    )
    # near-affine with small higher-order perturbations (realistic RPC regime)
    rpc.col_num[1] = 1.0  # ~ lon
    rpc.col_num[2] = 0.02
    rpc.col_num[3] = 0.08
    rpc.row_num[2] = -1.0  # ~ -lat (rows grow southwards)
    rpc.row_num[1] = 0.015
    rpc.row_num[3] = 0.06
    for idx in range(4, 10):
        rpc.col_num[idx] = rng.normal() * 1e-4
        rpc.row_num[idx] = rng.normal() * 1e-4
        rpc.col_den[idx] = rng.normal() * 1e-5
        rpc.row_den[idx] = rng.normal() * 1e-5
    return rpc


class TestRpc:
    def test_projection_localization_roundtrip(self):
        rpc = _synthetic_rpc()
        rng = np.random.default_rng(1)
        lon = rpc.lon_offset + rng.uniform(-0.9, 0.9, 200) * rpc.lon_scale
        lat = rpc.lat_offset + rng.uniform(-0.9, 0.9, 200) * rpc.lat_scale
        alt = rpc.alt_offset + rng.uniform(-0.9, 0.9, 200) * rpc.alt_scale
        col, row = rpc.projection(lon, lat, alt)
        lon2, lat2 = rpc.localization(col, row, alt)
        np.testing.assert_allclose(lon2, lon, atol=1e-10)
        np.testing.assert_allclose(lat2, lat, atol=1e-10)

    def test_dict_roundtrip(self):
        rpc = _synthetic_rpc()
        d = rpc.to_dict()
        rpc2 = RPCModel.from_dict(d)
        col, row = rpc.projection(-81.66, 30.33, 25.0)
        col2, row2 = rpc2.projection(-81.66, 30.33, 25.0)
        assert col == col2 and row == row2

    def test_geotiff_tag_roundtrip(self):
        rpc = _synthetic_rpc()
        tag = rpc.to_geotiff_tag()
        assert tag.shape == (92,)
        rpc2 = RPCModel.from_geotiff_tag(tag)
        col, row = rpc.projection(-81.64, 30.34, 10.0)
        col2, row2 = rpc2.projection(-81.64, 30.34, 10.0)
        np.testing.assert_allclose([col, row], [col2, row2], rtol=0, atol=0)

    def test_rescale(self):
        # ref: framework/util/sat_utils.py:6-24 — projecting through a
        # half-resolution RPC halves pixel coordinates.
        rpc = _synthetic_rpc()
        half = rescale_rpc(rpc, 0.5)
        col, row = rpc.projection(-81.65, 30.34, 30.0)
        colh, rowh = half.projection(-81.65, 30.34, 30.0)
        np.testing.assert_allclose(colh, col * 0.5, rtol=1e-12)
        np.testing.assert_allclose(rowh, row * 0.5, rtol=1e-12)

    def test_fit_rpc(self):
        rpc = _synthetic_rpc()
        rng = np.random.default_rng(2)
        lon = rpc.lon_offset + rng.uniform(-0.8, 0.8, 500) * rpc.lon_scale
        lat = rpc.lat_offset + rng.uniform(-0.8, 0.8, 500) * rpc.lat_scale
        alt = rpc.alt_offset + rng.uniform(-0.8, 0.8, 500) * rpc.alt_scale
        col, row = rpc.projection(lon, lat, alt)
        fitted = fit_rpc_from_projections(lon, lat, alt, col, row)
        col2, row2 = fitted.projection(lon, lat, alt)
        # sub-0.1px fit on the (nearly rational-linear) synthetic camera
        assert np.abs(col2 - col).max() < 0.1
        assert np.abs(row2 - row).max() < 0.1


class TestRpcJax:
    def test_localization_matches_numpy_under_jnp(self):
        import jax.numpy as jnp

        rpc = _synthetic_rpc()
        rng = np.random.default_rng(3)
        col = rpc.col_offset + rng.uniform(-0.5, 0.5, 64) * rpc.col_scale
        row = rpc.row_offset + rng.uniform(-0.5, 0.5, 64) * rpc.row_scale
        alt = np.full(64, rpc.alt_offset)
        lon_np, lat_np = rpc.localization(col, row, alt)
        lon_j, lat_j = rpc.localization(
            jnp.asarray(col), jnp.asarray(row), jnp.asarray(alt), xp=jnp
        )
        # f32 on device vs f64 host
        np.testing.assert_allclose(np.asarray(lon_j), lon_np, atol=2e-5)
        np.testing.assert_allclose(np.asarray(lat_j), lat_np, atol=2e-5)
