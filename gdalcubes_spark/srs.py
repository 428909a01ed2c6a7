"""Coordinate reference transforms: WGS84 geographic ↔ UTM (WGS84 ellipsoid),
vectorized in numpy.

Replaces the gdalwarp/PROJ dependency of the reference for the SRS mix the
fixtures exercise (EPSG:4326 + UTM zones, FIXTURES.md §1). Implementation is
the standard Transverse Mercator series (Krüger/Snyder, public formulas as in
USGS Professional Paper 1395), k0=0.9996, accurate to ≪1 m in-zone — far
below a cube cell. The per-(src,dst) transformer object is tiny and pickles
into Spark closures (the analogue of the reference's warp transformation
cache, warp.h:58-80).

EPSG conventions: 4326 = (lon, lat) here as (x, y); 326NN = UTM north zone NN;
327NN = south.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)
_K0 = 0.9996


def _zone_central_meridian(zone: int) -> float:
    return np.deg2rad(-183.0 + 6.0 * zone)


def geodetic_to_utm(lon, lat, zone: int, south: bool = False):
    """(lon, lat) degrees → (easting, northing) meters. Vectorized."""
    lon = np.asarray(lon, dtype="float64")
    lat = np.asarray(lat, dtype="float64")
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon) - _zone_central_meridian(zone)
    sp, cp, tp = np.sin(phi), np.cos(phi), np.tan(phi)
    N = _A / np.sqrt(1 - _E2 * sp**2)
    T = tp**2
    C = _EP2 * cp**2
    Aq = lam * cp
    e2 = _E2
    M = _A * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    E = _K0 * N * (Aq + (1 - T + C) * Aq**3 / 6
                   + (5 - 18 * T + T**2 + 72 * C - 58 * _EP2) * Aq**5 / 120) + 500000.0
    Nn = _K0 * (M + N * tp * (Aq**2 / 2 + (5 - T + 9 * C + 4 * C**2) * Aq**4 / 24
                              + (61 - 58 * T + T**2 + 600 * C - 330 * _EP2) * Aq**6 / 720))
    if south:
        Nn = Nn + 10000000.0
    return E, Nn


def utm_to_geodetic(easting, northing, zone: int, south: bool = False):
    """(easting, northing) meters → (lon, lat) degrees. Vectorized."""
    E = np.asarray(easting, dtype="float64") - 500000.0
    Nn = np.asarray(northing, dtype="float64")
    if south:
        Nn = Nn - 10000000.0
    e2 = _E2
    M = Nn / _K0
    mu = M / (_A * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
            + (151 * e1**3 / 96) * np.sin(6 * mu)
            + (1097 * e1**4 / 512) * np.sin(8 * mu))
    sp, cp, tp = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = _EP2 * cp**2
    T1 = tp**2
    N1 = _A / np.sqrt(1 - e2 * sp**2)
    R1 = _A * (1 - e2) / (1 - e2 * sp**2) ** 1.5
    D = E / (N1 * _K0)
    phi = phi1 - (N1 * tp / R1) * (
        D**2 / 2 - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * _EP2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * _EP2 - 3 * C1**2) * D**6 / 720
    )
    lam = (D - (1 + 2 * T1 + C1) * D**3 / 6
           + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * _EP2 + 24 * T1**2) * D**5 / 120) / cp
    lat = np.rad2deg(phi)
    lon = np.rad2deg(lam + _zone_central_meridian(zone))
    return lon, lat


_WEBMERC_R = 6378137.0  # WGS84 semi-major axis (spherical Web Mercator)


def geodetic_to_webmercator(lon, lat):
    """EPSG:3857 forward (the published spherical formulas — the web-tile
    CRS): x = R·λ, y = R·ln(tan(π/4 + φ/2)), |lat| clamped to the standard
    ±85.051129° validity bound."""
    lon = np.asarray(lon, dtype="float64")
    lat = np.clip(np.asarray(lat, dtype="float64"), -85.051128779807, 85.051128779807)
    x = _WEBMERC_R * np.radians(lon)
    y = _WEBMERC_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_geodetic(x, y):
    """EPSG:3857 inverse: λ = x/R, φ = 2·atan(exp(y/R)) − π/2."""
    x = np.asarray(x, dtype="float64")
    y = np.asarray(y, dtype="float64")
    lon = np.degrees(x / _WEBMERC_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _WEBMERC_R)) - np.pi / 2.0)
    return lon, lat


def parse_epsg(srs) -> int:
    if isinstance(srs, int):
        return srs
    s = str(srs).upper().strip()
    if s.startswith("EPSG:"):
        return int(s.split(":")[1])
    return int(s)


class Transformer:
    """Picklable point transformer between EPSG:4326 and UTM codes."""

    def __init__(self, src_epsg, dst_epsg):
        self.src = parse_epsg(src_epsg)
        self.dst = parse_epsg(dst_epsg)

    @staticmethod
    def _utm(code: int):
        if 32601 <= code <= 32660:
            return code - 32600, False
        if 32701 <= code <= 32760:
            return code - 32700, True
        return None

    def transform(self, x, y):
        """x,y in src CRS → (x,y) in dst CRS. Identity if same code."""
        if self.src == self.dst:
            return np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
        if self.src == 4326 and self._utm(self.dst):
            zone, south = self._utm(self.dst)
            return geodetic_to_utm(x, y, zone, south)
        if self.dst == 4326 and self._utm(self.src):
            zone, south = self._utm(self.src)
            return utm_to_geodetic(x, y, zone, south)
        if self.src == 4326 and self.dst == 3857:
            return geodetic_to_webmercator(x, y)
        if self.src == 3857 and self.dst == 4326:
            return webmercator_to_geodetic(x, y)
        if self.src == 3857 or self.dst == 3857:  # 3857 ↔ UTM via 4326
            lon, lat = Transformer(self.src, 4326).transform(x, y)
            return Transformer(4326, self.dst).transform(lon, lat)
        if self._utm(self.src) and self._utm(self.dst):
            lon, lat = self.transform_via(x, y)
            return lon, lat
        raise ValueError(f"unsupported CRS pair {self.src}->{self.dst}")

    def transform_via(self, x, y):
        z1, s1 = self._utm(self.src)
        lon, lat = utm_to_geodetic(x, y, z1, s1)
        z2, s2 = self._utm(self.dst)
        return geodetic_to_utm(lon, lat, z2, s2)
