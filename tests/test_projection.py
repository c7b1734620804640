"""REAL projection math (functions/projection.py) pinned against the
EPSG DEFINING invariants — the verification strategy that needs no
pyproj: a Lambert Conformal Conic implementation that (a) maps the
false origin to (FE, FN) exactly, (b) has point scale factor 1.0 on
both standard parallels, and (c) round-trips forward∘inverse to
machine precision, is the EPSG:2272 projection (those three
properties determine the mapping uniquely for the parameter set).
Pure numpy, no Ray session."""

import numpy as np

from cityofphiladelphia_databridge_etl_tools_ray.functions.projection import (
    PA_SOUTH,
    REAL_SRIDS,
    US_FT,
    to_wgs84,
    webmercator_forward,
    webmercator_inverse,
)


def test_lcc_false_origin_maps_exactly():
    x, y = PA_SOUTH.forward(-(77 + 45 / 60), 39 + 20 / 60)
    assert float(x) == 600000.0 and abs(float(y)) < 1e-9


def test_lcc_unit_scale_on_standard_parallels():
    k = PA_SOUTH.point_scale([40 + 58 / 60, 39 + 56 / 60])
    assert np.allclose(k, 1.0, atol=1e-12)
    # strictly > 1 outside the parallels, < 1 between them
    assert PA_SOUTH.point_scale(41.5) > 1.0
    assert PA_SOUTH.point_scale(40.4) < 1.0


def test_lcc_roundtrip_machine_precision():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-80.6, -74.6, 500)
    lat = rng.uniform(39.2, 41.2, 500)
    x, y = PA_SOUTH.forward(lon, lat)
    lon2, lat2 = PA_SOUTH.inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_epsg2272_known_locations():
    """State-plane coordinates of well-known Philadelphia-area points
    land where they should (±0.01° ≈ 1 km tolerance — the coordinates
    here are round numbers near the landmarks, not survey marks)."""
    # near Philadelphia City Hall
    lon, lat = to_wgs84(2272, 2694000.0, 236000.0)
    assert abs(lon - (-75.1619)) < 0.01 and abs(lat - 39.9520) < 0.01
    # the ftUS unit is the exact rational
    assert US_FT == 1200.0 / 3937.0
    # 6565 (NAD83(2011) realization) is the same projection
    assert to_wgs84(6565, 2694000.0, 236000.0) == (lon, lat)


def test_webmercator_invariants_and_roundtrip():
    x, y = webmercator_forward(0.0, 0.0)
    assert (float(x), float(y)) == (0.0, 0.0)
    x180, _ = webmercator_forward(180.0, 0.0)
    assert abs(float(x180) - np.pi * 6378137.0) < 1e-6
    rng = np.random.default_rng(8)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    lon2, lat2 = webmercator_inverse(*webmercator_forward(lon, lat))
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_to_wgs84_registry():
    assert REAL_SRIDS == {4326, 4269, 2272, 6565, 3857}
    # geographic CRSs pass through
    lon, lat = to_wgs84(4269, np.array([-75.0]), np.array([40.0]))
    assert lon[0] == -75.0 and lat[0] == 40.0
    try:
        to_wgs84(27700, 0.0, 0.0)
        raise AssertionError("unregistered SRID must raise")
    except KeyError:
        pass
