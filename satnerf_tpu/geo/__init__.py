"""Geodesy foundation: WGS84 ellipsoid, UTM projection, RPC camera models.

Self-contained (no rpcm/utm/pymap3d dependency) and available in both numpy
(float64 host path, used for dataset construction) and jax.numpy (device path,
used for on-device ray generation / back-projection).
"""

from satnerf_tpu.geo.ellipsoid import (  # noqa: F401
    ecef_to_latlon,
    latlon_to_ecef,
)
from satnerf_tpu.geo.utm import (  # noqa: F401
    latlon_from_utm,
    latlon_to_zone_string,
    lonlat_from_utm,
    split_zone_string,
    utm_from_latlon,
    utm_from_lonlat,
    zonestring_to_hemisphere,
)
from satnerf_tpu.geo.rpc import RPCModel, rescale_rpc  # noqa: F401
from satnerf_tpu.geo.coordinate_systems import (  # noqa: F401
    BaseCoordinateSystem,
    CoordinateSystemECEF,
    CoordinateSystemUTM,
    make_coordinate_system,
)
