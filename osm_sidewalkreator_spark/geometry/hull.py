"""Convex hull (G9, ``native:convexhull`` via ``convex_hulls``
``generic_functions.py:220-227``). Andrew monotone chain, pure NumPy.

The reference declares the op but the golden pipeline never calls it;
the engine exposes it per-feature (kernel) and per-group (Spark op in
``operators/predicates.py``).
"""

from __future__ import annotations

import numpy as np


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """CCW convex hull vertices of (n,2) points (no repeated endpoint).

    Collinear boundary points are dropped (matches GEOS convexhull's
    minimal hull). Degenerate inputs (<3 distinct points or collinear
    sets) return the 2-point extent or single point.
    """
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 0:
        return pts.reshape(0, 2)
    pts = np.unique(pts, axis=0)          # sorts lexicographically
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return ((a[:, 0] - o[:, 0]) * (b[:, 1] - o[:, 1])
                - (a[:, 1] - o[:, 1]) * (b[:, 0] - o[:, 0]))

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) \
                        - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 3:                     # all collinear
        return np.array([pts[0], pts[-1]])
    return hull
