"""Local transverse-Mercator projection, vectorized NumPy.

The reference builds a custom local TM CRS centered on the AOI and
reprojects all layers into it so geometry math happens in meters
(``generic_functions.py:566-616`` ``custom_local_projection``,
``reproject_layer_localTM`` ``:619-665``; the headless path uses UTM
zones, ``full_sidewalkreator_bbox_algorithm.py:1157-1187``).

We implement the closed-form *spherical* transverse Mercator (Gauss
sphere radius) — deterministic, dependency-free, and exactly invertible,
which is what the engine needs (internal consistency, not geodetic
agreement with proj4). Error vs ellipsoidal TM is irrelevant here because
every stage, including the final inverse back to EPSG:4326, uses the same
formulas.
"""

from __future__ import annotations

import numpy as np

EARTH_R = 6_371_008.8  # mean Earth radius, m


def tm_forward(lon: np.ndarray, lat: np.ndarray, lon0: float, lat0: float
               ) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> local TM meters centered at (lon0, lat0)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    phi0 = np.radians(lat0)
    b = np.cos(phi) * np.sin(lam)
    x = EARTH_R * np.arctanh(np.clip(b, -1 + 1e-15, 1 - 1e-15))
    y = EARTH_R * (np.arctan2(np.tan(phi), np.cos(lam)) - phi0)
    return x, y


def tm_inverse(x: np.ndarray, y: np.ndarray, lon0: float, lat0: float
               ) -> tuple[np.ndarray, np.ndarray]:
    """Local TM meters -> EPSG:4326 degrees."""
    x = np.asarray(x, dtype=np.float64) / EARTH_R
    y = np.asarray(y, dtype=np.float64) / EARTH_R + np.radians(lat0)
    lam = np.arctan2(np.sinh(x), np.cos(y))
    phi = np.arcsin(np.clip(np.sin(y) / np.cosh(x), -1.0, 1.0))
    return np.degrees(lam) + lon0, np.degrees(phi)
