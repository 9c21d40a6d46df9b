"""WGS84 geodetic conversions: lat/lon/alt <-> ECEF <-> local ENU.

Reference: gtsam/navigation/GPSFactor.h consumes positions already projected
to a local cartesian frame via GeographicLib (SURVEY.md §2.9 prescribes a
small pure-numpy port of the needed subset); the KITTI examples
(IMUKittiExampleGPS.cpp) ship pre-converted local XYZ.  This module is that
subset: ellipsoidal <-> ECEF (closed-form Vermeille/Ferrari inverse) and a
``LocalCartesian`` origin-anchored ENU projection mirroring
GeographicLib::LocalCartesian's API, so GPS workflows can consume raw
lat/lon/alt fixes directly.

Pure numpy (host-side preprocessing — runs once per fix, not in the solver
hot path).
"""

import numpy as np

# WGS84 ellipsoid
WGS84_A = 6378137.0                  # semi-major axis [m]
WGS84_F = 1.0 / 298.257223563        # flattening
WGS84_B = WGS84_A * (1.0 - WGS84_F)  # semi-minor axis
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)             # first eccentricity^2
WGS84_EP2 = WGS84_E2 / (1.0 - WGS84_E2)          # second eccentricity^2


def geodetic_to_ecef(lat_deg, lon_deg, alt=0.0):
    """(lat, lon) degrees + altitude [m] -> ECEF (..., 3).  Vectorized."""
    lat = np.deg2rad(np.asarray(lat_deg, dtype=float))
    lon = np.deg2rad(np.asarray(lon_deg, dtype=float))
    alt = np.asarray(alt, dtype=float)
    s, c = np.sin(lat), np.cos(lat)
    N = WGS84_A / np.sqrt(1.0 - WGS84_E2 * s * s)   # prime-vertical radius
    x = (N + alt) * c * np.cos(lon)
    y = (N + alt) * c * np.sin(lon)
    z = (N * (1.0 - WGS84_E2) + alt) * s
    return np.stack([x, y, z], axis=-1)


def ecef_to_geodetic(ecef):
    """ECEF (..., 3) -> (lat_deg, lon_deg, alt).  Vermeille (2002) closed
    form — exact to sub-mm for terrestrial points, no iteration."""
    ecef = np.asarray(ecef, dtype=float)
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    a2 = WGS84_A * WGS84_A
    e4 = WGS84_E2 * WGS84_E2
    p = (x * x + y * y) / a2
    q = (1.0 - WGS84_E2) * z * z / a2
    r = (p + q - e4) / 6.0
    s = e4 * p * q / (4.0 * r ** 3 + 1e-300)
    t = np.cbrt(1.0 + s + np.sqrt(np.maximum(s * (2.0 + s), 0.0)))
    u = r * (1.0 + t + 1.0 / np.maximum(t, 1e-300))
    v = np.sqrt(np.maximum(u * u + e4 * q, 0.0))
    w = WGS84_E2 * (u + v - q) / (2.0 * v + 1e-300)
    k = np.sqrt(np.maximum(u + v + w * w, 0.0)) - w
    D = k * np.sqrt(x * x + y * y) / (k + WGS84_E2)
    hyp = np.sqrt(D * D + z * z)
    lat = 2.0 * np.arctan2(z, D + hyp)
    alt = (k + WGS84_E2 - 1.0) / k * hyp
    lon = np.arctan2(y, x)
    return np.rad2deg(lat), np.rad2deg(lon), alt


def _enu_rotation(lat_deg, lon_deg):
    """Rotation taking ECEF deltas to ENU at the given origin."""
    lat = np.deg2rad(float(lat_deg))
    lon = np.deg2rad(float(lon_deg))
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    return np.array([
        [-so, co, 0.0],
        [-sl * co, -sl * so, cl],
        [cl * co, cl * so, sl],
    ])


class LocalCartesian:
    """ENU frame anchored at a geodetic origin (GeographicLib analog).

    forward(lat, lon, alt) -> local ENU xyz; reverse(xyz) -> (lat, lon, alt).
    """

    def __init__(self, lat0, lon0, alt0=0.0):
        self.origin = (float(lat0), float(lon0), float(alt0))
        self._ecef0 = geodetic_to_ecef(lat0, lon0, alt0)
        self._R = _enu_rotation(lat0, lon0)

    def forward(self, lat_deg, lon_deg, alt=0.0):
        d = geodetic_to_ecef(lat_deg, lon_deg, alt) - self._ecef0
        return d @ self._R.T

    def reverse(self, enu):
        enu = np.asarray(enu, dtype=float)
        ecef = enu @ self._R + self._ecef0
        return ecef_to_geodetic(ecef)


def geodetic_to_enu(lat_deg, lon_deg, alt, lat0, lon0, alt0=0.0):
    return LocalCartesian(lat0, lon0, alt0).forward(lat_deg, lon_deg, alt)


def enu_to_geodetic(enu, lat0, lon0, alt0=0.0):
    return LocalCartesian(lat0, lon0, alt0).reverse(enu)
