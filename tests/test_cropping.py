"""RPC-aware cropping test: crop to an AOI polygon, RPC offsets shifted so
ground points project to the same content."""

import numpy as np

from satnerf_tpu.data_prep.geo_utils import crop_geotiff_to_lonlat_aoi
from satnerf_tpu.geo.rpc import RPCModel
from satnerf_tpu.io.tiff import GeoProfile, read_geotiff, write_geotiff


def _rpc():
    rpc = RPCModel(
        row_offset=64, col_offset=64, lat_offset=30.33, lon_offset=-81.66,
        alt_offset=20, row_scale=64, col_scale=64, lat_scale=0.01,
        lon_scale=0.01, alt_scale=80,
    )
    rpc.col_num[1] = 1.0
    rpc.row_num[2] = -1.0
    return rpc


def test_crop_shifts_rpc(tmp_path):
    rpc = _rpc()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (3, 128, 128)).astype(np.uint8)
    src = str(tmp_path / "full.tif")
    write_geotiff(src, img, GeoProfile(128, 128, 3, "uint8", rpc=rpc))

    # polygon covering the central quarter of the image at alt=20
    cols = np.array([40.0, 90.0, 90.0, 40.0])
    rows = np.array([30.0, 30.0, 80.0, 80.0])
    lon, lat = rpc.localization(cols, rows, np.full(4, 20.0))
    poly = np.stack([lon, lat], axis=1)

    out = str(tmp_path / "crop.tif")
    c0, r0, w, h = crop_geotiff_to_lonlat_aoi(src, out, poly, alt=20.0)
    arr, prof = read_geotiff(out)

    assert (w, h) == (arr.shape[2], arr.shape[1])
    np.testing.assert_array_equal(arr, img[:, r0 : r0 + h, c0 : c0 + w])

    # a ground point projects to shifted pixel coordinates in the crop
    test_lon, test_lat, test_alt = lon[0], lat[0], 20.0
    c_full, r_full = rpc.projection(test_lon, test_lat, test_alt)
    c_crop, r_crop = prof.rpc.projection(test_lon, test_lat, test_alt)
    np.testing.assert_allclose(c_crop, c_full - c0, atol=1e-9)
    np.testing.assert_allclose(r_crop, r_full - r0, atol=1e-9)
