"""Voronoi cells by half-plane intersection, pure NumPy.

Reference uses ``native:voronoipolygons`` for road-intersection cells
(``generic_functions.py:373-378``, used at osm_sidewalkreator.py:836-845)
and per-protoblock POI splitting (``voronoi_splitting``
osm_sidewalkreator.py:3493-3557). Seed counts are small (POIs within one
block, intersections within one tile), so the O(n) half-plane clip per
cell is the right construction: cell_i = envelope ∩_{j≠i} {p : |p-s_i| ≤
|p-s_j|}, each clip a Sutherland–Hodgman pass against the perpendicular
bisector.
"""

from __future__ import annotations

import numpy as np


def clip_halfplane(poly: np.ndarray, a: float, b: float, c: float
                   ) -> np.ndarray:
    """Keep {(x,y) : a*x + b*y <= c} of a convex polygon (k,2)."""
    if len(poly) == 0:
        return poly
    d = a * poly[:, 0] + b * poly[:, 1] - c
    inside = d <= 0
    if inside.all():
        return poly
    if not inside.any():
        return np.empty((0, 2))
    out = []
    k = len(poly)
    for i in range(k):
        j = (i + 1) % k
        if inside[i]:
            out.append(poly[i])
        if inside[i] != inside[j]:
            t = d[i] / (d[i] - d[j])
            out.append(poly[i] + t * (poly[j] - poly[i]))
    return np.array(out)


def voronoi_cells(seeds: np.ndarray, envelope: np.ndarray
                  ) -> list[np.ndarray]:
    """One convex cell polygon per seed, clipped to a convex envelope.

    seeds (n,2); envelope (k,2) CCW convex polygon (e.g. block bbox).
    """
    seeds = np.asarray(seeds, dtype=np.float64)
    cells = []
    for i in range(len(seeds)):
        cell = envelope.copy()
        si = seeds[i]
        for j in range(len(seeds)):
            if j == i or len(cell) == 0:
                continue
            sj = seeds[j]
            # bisector half-plane: points closer to si than sj
            a, b = sj - si
            mid = (si + sj) / 2
            c = a * mid[0] + b * mid[1]
            cell = clip_halfplane(cell, a, b, c)
        cells.append(cell)
    return cells


def envelope_bbox(points: np.ndarray, pad: float = 0.0) -> np.ndarray:
    """CCW rectangle envelope of a point set (+pad), for bounded cells —
    the analog of the reference's 300% buffer envelope
    (generic_functions.py:373-378)."""
    x0, y0 = points.min(axis=0) - pad
    x1, y1 = points.max(axis=0) + pad
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
