"""REAL map projection math, pure numpy — the pyproj seam made
genuine for the CRS set the reference actually uses.

The reference reprojects every geometry to EPSG:4326 with pyproj
(``opendata/opendata.py:206-238``; per-worker cached Transformer,
``ago/ago.py:347-354``), and its bad-SRID correction map routes
everything to four real CRSs: EPSG:2272 / 6565 (NAD83 Pennsylvania
South State Plane, US survey feet — Lambert Conformal Conic 2SP on
GRS80), EPSG:3857 (spherical Web Mercator) and EPSG:4269 (NAD83
geographic).  All four have closed-form published math (Snyder, *Map
Projections — A Working Manual*, USGS PP 1395, pp. 107-109; EPSG
Guidance Note 7-2), implemented here vectorized over numpy arrays —
no external library, no network, and bit-stable across workers.

Accuracy contract (pinned in tests/test_projection.py):
- forward∘inverse round-trips to < 1e-9 degrees (≈ 0.1 µm);
- the projection's defining invariants hold: the false origin maps
  to (FE, FN) exactly, and the point scale factor equals 1.0 on both
  standard parallels to < 1e-12 (these pin the implementation to the
  EPSG parameter set without needing pyproj to compare against);
- Web Mercator maps (0°, 0°) → (0, 0) and 180° → πR exactly.

Datum note: NAD83 ↔ WGS84 differ by ≤ ~2 m; like the standard
pyproj pipeline without a datum-shift grid, this module treats them
as identical (the reference's own Transformer does the same unless a
grid is installed).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (NAD83)
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = 2.0 * _F - _F * _F
_E = float(np.sqrt(_E2))

#: US survey foot in meters (exact rational 1200/3937)
US_FT = 1200.0 / 3937.0

_PHI_ITERS = 8  # t→φ fixed-point iterations (converges < 1e-14 by 5)


def _m(phi: np.ndarray | float) -> np.ndarray | float:
    return np.cos(phi) / np.sqrt(1.0 - _E2 * np.sin(phi) ** 2)


def _t(phi: np.ndarray | float) -> np.ndarray | float:
    es = _E * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - es) / (1.0 + es)) ** (_E / 2.0)


class LambertConformal2SP:
    """Ellipsoidal Lambert Conformal Conic, two standard parallels
    (EPSG method 9802).  Angles in degrees at the API, meters on the
    projected plane (callers convert feet)."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 fe: float, fn: float):
        p1, p2, p0 = np.radians(lat1), np.radians(lat2), np.radians(lat0)
        m1, m2 = _m(p1), _m(p2)
        t1, t2, t0 = _t(p1), _t(p2), _t(p0)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.rho0 = _A * self.F * t0 ** self.n
        self.lon0 = np.radians(lon0)
        self.fe = fe
        self.fn = fn

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees → (easting, northing) meters."""
        lam = np.radians(np.asarray(lon_deg, np.float64))
        phi = np.radians(np.asarray(lat_deg, np.float64))
        rho = _A * self.F * _t(phi) ** self.n
        theta = self.n * (lam - self.lon0)
        x = self.fe + rho * np.sin(theta)
        y = self.fn + self.rho0 - rho * np.cos(theta)
        return x, y

    def inverse(self, x, y):
        """(easting, northing) meters → (lon, lat) degrees."""
        dx = np.asarray(x, np.float64) - self.fe
        dy = self.rho0 - (np.asarray(y, np.float64) - self.fn)
        rho = np.sign(self.n) * np.hypot(dx, dy)
        tp = (rho / (_A * self.F)) ** (1.0 / self.n)
        theta = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        lam = theta / self.n + self.lon0
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(_PHI_ITERS):
            es = _E * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tp * ((1.0 - es) / (1.0 + es)) ** (_E / 2.0)
            )
        return np.degrees(lam), np.degrees(phi)

    def point_scale(self, lat_deg):
        """Point scale factor k along a parallel — exactly 1.0 on the
        standard parallels (the defining invariant)."""
        phi = np.radians(np.asarray(lat_deg, np.float64))
        rho = _A * self.F * _t(phi) ** self.n
        return self.n * rho / (_A * _m(phi))


#: EPSG:2272 / EPSG:6565 — NAD83 Pennsylvania South, ftUS.
#: Parameters from the EPSG registry: φ1=40°58', φ2=39°56',
#: φF=39°20', λF=-77°45', EF=1,968,500 ftUS (= 600,000 m exactly),
#: NF=0.  6565 is the NAD83(2011) realization — identical math.
PA_SOUTH = LambertConformal2SP(
    lat1=40.0 + 58.0 / 60.0,
    lat2=39.0 + 56.0 / 60.0,
    lat0=39.0 + 20.0 / 60.0,
    lon0=-(77.0 + 45.0 / 60.0),
    fe=600000.0,
    fn=0.0,
)

_R_MERC = 6378137.0  # Web Mercator sphere radius


def webmercator_inverse(x, y):
    """EPSG:3857 meters → (lon, lat) degrees (spherical)."""
    lon = np.degrees(np.asarray(x, np.float64) / _R_MERC)
    lat = np.degrees(
        2.0 * np.arctan(np.exp(np.asarray(y, np.float64) / _R_MERC)) - np.pi / 2.0
    )
    return lon, lat


def webmercator_forward(lon_deg, lat_deg):
    lam = np.radians(np.asarray(lon_deg, np.float64))
    phi = np.radians(np.asarray(lat_deg, np.float64))
    return _R_MERC * lam, _R_MERC * np.log(np.tan(np.pi / 4.0 + phi / 2.0))


def to_wgs84(srid: int, x, y):
    """REAL transform of projected coordinates to (lon, lat) EPSG:4326
    for the reference's CRS set; raises ``KeyError`` for SRIDs outside
    it (callers decide whether to fall back or fail)."""
    if srid in (4326, 4269):  # NAD83 geographic ≈ WGS84 (no-grid contract)
        return np.asarray(x, np.float64), np.asarray(y, np.float64)
    if srid in (2272, 6565):  # PA South state plane, US survey feet
        return PA_SOUTH.inverse(np.asarray(x, np.float64) * US_FT,
                                np.asarray(y, np.float64) * US_FT)
    if srid == 3857:
        return webmercator_inverse(x, y)
    raise KeyError(srid)


REAL_SRIDS = frozenset({4326, 4269, 2272, 6565, 3857})
