"""Sidewalk refinement kernels: splitting, snapping, small-stretch
merging (SURVEY.md §2 G12/G13/G14, J11, J12, P18, G10/G11).

These are the post-processing stages the reference runs between raw
sidewalk extraction and export (``sidewalks_splitting``
osm_sidewalkreator.py:963-1184). All pure NumPy over per-tile arrays.
"""

from __future__ import annotations

import numpy as np

from .. import params as P
from ..geometry import core, noding, voronoi
from . import kernels


def polygon_corners(ring: np.ndarray, lo_deg: float = 160.0,
                    hi_deg: float = 200.0) -> np.ndarray:
    """Polygon corner vertices with straight vertices removed (P18,
    ``select_vertex_pol_nodes`` generic_functions.py:1348-1387: interior
    angles in (160°, 200°) are dropped)."""
    n = len(ring)
    if n < 3:
        return ring
    prev = np.concatenate((ring[-1:], ring[:-1]))
    nxt = np.concatenate((ring[1:], ring[:1]))
    ang = np.degrees(np.abs(np.arctan2(
        np.cross(ring - prev, nxt - ring),
        ((ring - prev) * (nxt - ring)).sum(axis=1))))
    interior = 180.0 - ang  # deviation-from-straight -> interior angle
    keep = ~((interior > lo_deg) & (interior < hi_deg))
    return ring[keep]


def corner_spokes(ring: np.ndarray) -> np.ndarray:
    """Centroid→corner spoke segments for protoblock-corner splitting
    (G13, ``split_sidewalks_by_protoblocks``
    osm_sidewalkreator.py:3177-3246)."""
    corners = polygon_corners(ring)
    cx, cy = core.ring_centroid(ring)
    if len(corners) == 0:
        return np.empty((0, 4))
    return np.column_stack([
        np.full(len(corners), cx), np.full(len(corners), cy),
        corners[:, 0], corners[:, 1]])


def split_lines_with_lines(lines: list[np.ndarray], cutters: np.ndarray,
                           tiny_tol: float = P.TINY_SEGMENTS_TOL
                           ) -> list[np.ndarray]:
    """Split polylines at intersections with cutter segments (J5 applied
    to refinement; drop pieces shorter than ``tiny_segments_tol``,
    osm_sidewalkreator.py:3225-3246)."""
    if not lines:
        return []
    line_segs = np.concatenate([core.explode_polyline_to_segments(ln)
                                for ln in lines if len(ln) > 1])
    allseg = np.vstack([line_segs, cutters]) if len(cutters) else line_segs
    noded, parent = noding.node_segments(allseg)
    own = parent < len(line_segs)
    # cut locations (shared vertices with cutter pieces) must stay ends
    cut_pts = np.vstack([noded[~own][:, :2], noded[~own][:, 2:]]) \
        if (~own).any() else None
    pieces = kernels.merge_touching_lines(noded[own], break_at=cut_pts)
    return [p for p in pieces if core.polyline_length(p) >= tiny_tol]


def split_polyline_by_max_len(line: np.ndarray, max_len: float,
                              percent_add: float = 0.01) -> list[np.ndarray]:
    """Split a polyline into equal pieces no longer than ``max_len``
    (G12, ``split_lines_by_max_len`` generic_functions.py:108-121 with
    the anti-float-drift ``percent_add``)."""
    total = core.polyline_length(line)
    if total <= max_len:
        return [line]
    n = int(np.ceil(total / max_len))
    piece = total / n * (1 + percent_add / 100.0)
    cuts = [piece * k for k in range(1, n)]
    return split_polyline_at_distances(line, cuts)


def split_polyline_at_distances(line: np.ndarray, dists: list[float]
                                ) -> list[np.ndarray]:
    seg = np.diff(line, axis=0)
    seglen = np.hypot(seg[:, 0], seg[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seglen)])
    out = []
    cur = [line[0]]
    di = 0
    dists = sorted(d for d in dists if 0 < d < cum[-1])
    for i in range(len(seg)):
        s0, s1 = cum[i], cum[i + 1]
        while di < len(dists) and s0 < dists[di] <= s1:
            t = (dists[di] - s0) / (s1 - s0)
            p = line[i] + t * seg[i]
            cur.append(p)
            out.append(np.array(cur))
            cur = [p]
            di += 1
        cur.append(line[i + 1])
    out.append(np.array(cur))
    return [np.asarray(o) for o in out if len(o) > 1]


def snap_lines_to_reference(lines: list[np.ndarray], ref_segs: np.ndarray,
                            tol: float = P.SNAP_DISJOINTED_TOL
                            ) -> list[np.ndarray]:
    """Snap vertices onto nearby reference geometry (J11,
    ``snap_layers`` generic_functions.py:230-305, tolerance 0.1-0.51 m):
    each vertex within ``tol`` of a reference segment is projected onto
    the closest point of the nearest one."""
    if len(ref_segs) == 0:
        return lines
    out = []
    ax, ay = ref_segs[:, 0], ref_segs[:, 1]
    dx = ref_segs[:, 2] - ax
    dy = ref_segs[:, 3] - ay
    ll = dx * dx + dy * dy
    ll_safe = np.where(ll == 0, 1.0, ll)
    for ln in lines:
        px = ln[:, 0][:, None]
        py = ln[:, 1][:, None]
        t = ((px - ax) * dx + (py - ay) * dy) / ll_safe
        t = np.where(ll == 0, 0.0, np.clip(t, 0.0, 1.0))
        cx = ax + t * dx
        cy = ay + t * dy
        d = np.hypot(px - cx, py - cy)
        k = np.argmin(d, axis=1)
        rows = np.arange(len(ln))
        best = d[rows, k]
        snapped = ln.copy()
        hit = best <= tol
        snapped[hit, 0] = cx[rows, k][hit]
        snapped[hit, 1] = cy[rows, k][hit]
        out.append(snapped)
    return out


def merge_small_stretches(lines: list[np.ndarray],
                          min_len: float = P.MIN_STRETCH_SIZE,
                          tol: float = 1e-6, max_iter: int = 50
                          ) -> list[np.ndarray]:
    """Merge stretches shorter than ``min_stretch_size`` into a touching
    neighbor (J12, ``try_to_merge_small_stretches``
    osm_sidewalkreator.py:3940-4068). Endpoint-shared lines are
    concatenated; unmatched short orphans are kept (reference keeps
    them too when no neighbor touches)."""
    lines = [ln.copy() for ln in lines if len(ln) > 1]
    for _ in range(max_iter):
        lens = [core.polyline_length(ln) for ln in lines]
        small = [i for i, l in enumerate(lens) if l < min_len]
        if not small:
            break
        merged_any = False
        for i in small:
            if lines[i] is None:
                continue
            found = None
            for j in range(len(lines)):
                if j == i or lines[j] is None:
                    continue
                for end_i in (0, -1):
                    for end_j in (0, -1):
                        if np.hypot(*(lines[i][end_i] - lines[j][end_j])) <= tol:
                            found = (j, end_i, end_j)
                            break
                    if found:
                        break
                if found:
                    break
            if not found:
                continue
            j, ei, ej = found
            a = lines[i] if ei == -1 else lines[i][::-1]
            bl = lines[j] if ej == 0 else lines[j][::-1]
            lines[j] = np.vstack([a, bl[1:]])
            lines[i] = None
            merged_any = True
        lines = [ln for ln in lines if ln is not None]
        if not merged_any:
            break
    return lines


def voronoi_split_block(sidewalk_lines: list[np.ndarray],
                        pois: np.ndarray, block_ring: np.ndarray,
                        min_pois: int = 3) -> list[np.ndarray]:
    """Voronoi POI splitting within one protoblock (G11,
    ``voronoi_splitting`` osm_sidewalkreator.py:3493-3557): cells of the
    block's POIs cut the block's sidewalk lines."""
    if len(pois) < min_pois:
        return sidewalk_lines
    env = voronoi.envelope_bbox(np.vstack([block_ring, pois]), pad=50.0)
    cells = voronoi.voronoi_cells(pois, env)
    cutters = []
    for c in cells:
        if len(c) >= 2:
            nxt = np.roll(c, -1, axis=0)
            cutters.append(np.hstack([c, nxt]))
    cut = np.concatenate(cutters) if cutters else np.empty((0, 4))
    return split_lines_with_lines(sidewalk_lines, cut)
