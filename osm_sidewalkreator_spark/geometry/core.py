"""Vectorized coordinate math (lengths, areas, interpolation, PIP,
point-segment distance).

Reference semantics anchors:
- length/area/perimeter columns: ``generic_functions.py:518-557``
- interpolate along line: ``generic_functions.py:1330-1335``
- perpendicular vector: ``osm_sidewalkreator.py:1421-1429``
- duplicate-vertex removal: ``generic_functions.py:98-105`` (tol
  ``duplicate_points_tol=0.1``, parameters.py:163)
"""

from __future__ import annotations

import numpy as np


def polyline_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def segment_lengths(segs: np.ndarray) -> np.ndarray:
    """segs: (n,4) [x1,y1,x2,y2] -> (n,) lengths."""
    return np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])


def _next1(a: np.ndarray) -> np.ndarray:
    """a shifted left by one with wraparound (np.roll(a, -1) without its
    per-call dispatch overhead — these run once per ring)."""
    return np.concatenate((a[1:], a[:1]))


def ring_signed_area(coords: np.ndarray) -> float:
    """Shoelace; positive = CCW. Ring may or may not repeat first point."""
    x, y = coords[:, 0], coords[:, 1]
    return 0.5 * float(np.dot(x, _next1(y)) - np.dot(y, _next1(x)))


def ring_perimeter(coords: np.ndarray) -> float:
    d = np.diff(np.vstack([coords, coords[:1]]), axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def ring_centroid(coords: np.ndarray) -> tuple[float, float]:
    """Area-weighted polygon centroid of a single ring."""
    x, y = coords[:, 0], coords[:, 1]
    xn, yn = _next1(x), _next1(y)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:  # degenerate: fall back to vertex mean
        return float(x.mean()), float(y.mean())
    cx = float(((x + xn) * cross).sum() / (6.0 * a))
    cy = float(((y + yn) * cross).sum() / (6.0 * a))
    return cx, cy


def interpolate_along(coords: np.ndarray, dist: float) -> np.ndarray:
    """Point at ``dist`` meters along a polyline (clamped to ends).

    Mirrors QgsGeometry.interpolate used at osm_sidewalkreator.py:1365.
    """
    seg = np.diff(coords, axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    total = cum[-1]
    d = min(max(dist, 0.0), total)
    i = int(np.searchsorted(cum, d, side="right") - 1)
    i = min(i, len(seglen) - 1)
    if seglen[i] == 0:
        return coords[i].copy()
    t = (d - cum[i]) / seglen[i]
    return coords[i] + t * seg[i]


def dedup_vertices(coords: np.ndarray, tol: float = 0.1) -> np.ndarray:
    """Drop consecutive vertices closer than ``tol`` (keep endpoints).

    Mirrors native:removeduplicatevertices (generic_functions.py:98-105).
    """
    if len(coords) <= 2:
        return coords
    keep = [0]
    for i in range(1, len(coords) - 1):
        p = coords[keep[-1]]
        if np.hypot(coords[i, 0] - p[0], coords[i, 1] - p[1]) >= tol:
            keep.append(i)
    keep.append(len(coords) - 1)
    return coords[keep]


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray-casting PIP: many points vs one ring. Vectorized over
    points x edges. Boundary points are not guaranteed either way."""
    x1, y1 = ring[:, 0], ring[:, 1]
    x2, y2 = _next1(x1), _next1(y1)
    px = px[:, None]
    py = py[:, None]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = (cond & (px < xint)).sum(axis=1)
    return (crossings % 2) == 1


def points_in_polygon(px: np.ndarray, py: np.ndarray,
                      rings: list[np.ndarray]) -> np.ndarray:
    """PIP for polygon with holes: in shell XOR in any hole (even-odd over
    all rings is equivalent)."""
    inside = np.zeros(len(px), dtype=bool)
    for r in rings:
        inside ^= points_in_ring(px, py, r)
    return inside


def point_segment_distance(px: np.ndarray, py: np.ndarray,
                           segs: np.ndarray) -> np.ndarray:
    """Pairwise distance: points (n,) vs segments (n,4) elementwise."""
    ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / ll
    t = np.where(ll == 0, 0.0, np.clip(t, 0.0, 1.0))
    cx, cy = ax + t * dx, ay + t * dy
    return np.hypot(px - cx, py - cy)


def min_dist_points_to_segs(px: np.ndarray, py: np.ndarray,
                            segs: np.ndarray, chunk: int = 256) -> np.ndarray:
    """Min distance from each point to ANY segment: (n_points,).

    Chunked (points x segments) broadcast; used for coverage predicates in
    the morphology pipeline and for building-distance width shrink
    (osm_sidewalkreator.py:1843-1893).
    """
    n = len(px)
    out = np.full(n, np.inf)
    if len(segs) == 0 or n == 0:
        return out
    ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    ll_safe = np.where(ll == 0, 1.0, ll)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        pxx = px[s:e, None]
        pyy = py[s:e, None]
        t = ((pxx - ax) * dx + (pyy - ay) * dy) / ll_safe
        t = np.where(ll == 0, 0.0, np.clip(t, 0.0, 1.0))
        cx, cy = ax + t * dx, ay + t * dy
        out[s:e] = np.hypot(pxx - cx, pyy - cy).min(axis=1)
    return out


def explode_polyline_to_segments(coords: np.ndarray) -> np.ndarray:
    """(n,2) polyline -> (n-1,4) segment array, zero-length dropped."""
    a = coords[:-1]
    b = coords[1:]
    segs = np.hstack([a, b])
    keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
    return segs[keep]


def angle_between_three_points(a, b, c) -> float:
    """Angle ABC in radians (at vertex b), in [0, 2pi) measured like
    QgsGeometryUtils.angleBetweenThreePoints (generic_functions.py:1215)."""
    a1 = np.arctan2(a[1] - b[1], a[0] - b[0])
    a2 = np.arctan2(c[1] - b[1], c[0] - b[0])
    return float((a2 - a1) % (2 * np.pi))
