"""Per-tile geometry kernels: the sidewalk/crossing/kerb pipeline on raw
NumPy arrays (no Spark). Each function mirrors a reference stage; the
Spark layer calls ``tile_pipeline`` inside ``groupBy(tile).applyInPandas``.

Reference anchors (headless Processing path — the one that produced the
golden fixtures under ``assets/test_outputs/``):

- street self-split: ``generic_functions.py:462-470`` via
  qgis:splitwithlines, used at ``osm_sidewalkreator.py:794-800``
- dead-end removal: ``generic_functions.py:1647-1675``
- polygonize -> protoblocks: ``generic_functions.py:195-217``,
  ``osm_sidewalkreator.py:724``
- sidewalk buffer/close/donut: ``sidewalk_generation_logic.py:292-430``
- crossings + kerbs: ``full_sidewalkreator_bbox_algorithm.py:515-938``
"""

from __future__ import annotations

import numpy as np

from .. import params as P
from ..geometry import core, faces, morph, noding


# ---------- street network cleaning ----------

def split_streets(segs: np.ndarray, widths: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Self-split street segments at all mutual intersections (J5).

    Returns (noded_segs (m,4), widths (m,)). Width (and any other parent
    attribute) is inherited through the parent index.
    """
    noded, parent = noding.node_segments(segs)
    noded, parent = noding.dedup_undirected(noded, parent)
    return noded, np.asarray(widths, dtype=np.float64)[parent]


def endpoint_degrees(segs: np.ndarray, snap: float = noding.SNAP
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Vertex degree of each segment endpoint over the noded set (J6).

    Returns (deg_start (n,), deg_end (n,)) — the number of segments
    incident to each endpoint, including the segment itself.
    """
    verts, evi = faces.build_vertices(segs, snap)
    deg = np.bincount(evi.ravel(), minlength=len(verts))
    return deg[evi[:, 0]], deg[evi[:, 1]]


def remove_dangles(segs: np.ndarray, attrs: np.ndarray | None = None,
                   tol: float = 1e-6, max_iter: int = 100):
    """Iteratively drop segments with an unconnected endpoint (G15,
    ``remove_unconnected_lines_v2`` ``generic_functions.py:1647-1675``).

    An endpoint is connected iff it lies within ``tol`` of any *other*
    segment (the reference tests geometric ``intersects`` after an R-tree
    prefilter), so T-junction contacts count even before self-splitting.
    """
    keep_idx = np.arange(len(segs))
    cur = np.asarray(segs, dtype=np.float64)
    for _ in range(max_iter):
        n = len(cur)
        if n == 0:
            break
        keep = np.ones(n, dtype=bool)
        for i in range(n):
            others = np.delete(np.arange(n), i)
            if len(others) == 0:
                keep[i] = False
                break
            osegs = cur[others]
            for ep in (cur[i, :2], cur[i, 2:]):
                d = core.min_dist_points_to_segs(
                    np.array([ep[0]]), np.array([ep[1]]), osegs)
                if d[0] > tol:
                    keep[i] = False
                    break
        if keep.all():
            break
        cur = cur[keep]
        keep_idx = keep_idx[keep]
    if attrs is None:
        return cur, keep_idx
    return cur, np.asarray(attrs)[keep_idx]


def protoblocks(noded_segs: np.ndarray, min_area: float = 1.0
                ) -> list[np.ndarray]:
    """Polygonize the noded street network into city-block rings (G6).

    Dangles never form faces, so pre-removal is not required for
    correctness (the reference removes them for performance).
    """
    return faces.polygonize(noded_segs, min_area=min_area)


# ---------- sidewalk generation ----------

def sidewalk_rings(noded_segs: np.ndarray, widths: np.ndarray,
                   d_to_add: float = P.D_TO_ADD_TO_EACH_SIDE,
                   curve_radius: float = P.DEFAULT_CURVE_RADIUS,
                   min_ratio: float = P.MIN_AREA_PERIMETER_RATIO,
                   nseg: int = P.ARC_SEGMENTS_PER_QUADRANT
                   ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Street network -> sidewalk axis rings.

    buffer(width/2 + d_to_add/2, round) -> dissolve -> close(curve_radius)
    -> hole rings -> drop area/perimeter < min_ratio
    (sidewalk_generation_logic.py:292-430 + filter at :44-77).

    Returns (sidewalk_rings, closed_exterior_rings). The exterior rings
    are returned for the protoblock-disjoint filter and zone logic.
    """
    radii = np.asarray(widths, dtype=np.float64) / 2 + d_to_add / 2
    u_sets, ext_u, holes_u = morph.buffer_union(noded_segs, radii, nseg)
    ext_c, holes_c = morph.morphological_close(u_sets, ext_u + holes_u,
                                               curve_radius, nseg)
    out = []
    for h in holes_c:
        area = core.ring_signed_area(h)
        perim = core.ring_perimeter(h)
        if perim > 0 and area / perim >= min_ratio:
            out.append(h)
    return out, ext_c


# ---------- crossings + kerbs ----------

def _seg_interpolate(a: np.ndarray, b: np.ndarray, d: float) -> np.ndarray:
    ln = float(np.hypot(*(b - a)))
    if ln == 0:
        return a.copy()
    t = min(max(d / ln, 0.0), 1.0)
    return a + t * (b - a)


def _ray_hits(pA: np.ndarray, pE: np.ndarray, side_segs: np.ndarray
              ) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Intersect segment pA->pE with sidewalk segments; return the hit
    nearest pA among A-side hits and nearest pE among E-side hits
    (full_sidewalkreator_bbox_algorithm.py:855-878)."""
    if len(side_segs) == 0:
        return None, None
    a1 = pA
    d1 = pE - pA
    a2 = side_segs[:, :2]
    d2 = side_segs[:, 2:] - a2
    denom = d1[0] * d2[:, 1] - d1[1] * d2[:, 0]
    ok = np.abs(denom) > 1e-12
    e = a2 - a1
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (e[:, 0] * d2[:, 1] - e[:, 1] * d2[:, 0]) / denom
        u = (e[:, 0] * d1[1] - e[:, 1] * d1[0]) / denom
    hit = ok & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    if not hit.any():
        return None, None
    pts = a1 + t[hit][:, None] * d1
    dA = np.hypot(pts[:, 0] - pA[0], pts[:, 1] - pA[1])
    dE = np.hypot(pts[:, 0] - pE[0], pts[:, 1] - pE[1])
    a_side = dA < dE
    best_a = pts[a_side][np.argmin(dA[a_side])] if a_side.any() else None
    best_e = pts[~a_side][np.argmin(dE[~a_side])] if (~a_side).any() else None
    return best_a, best_e


def crossings_and_kerbs(noded_segs: np.ndarray, widths: np.ndarray,
                        sidewalk_segs: np.ndarray,
                        search_buffer: float = P.ENDPOINT_SEARCH_BUFFER,
                        min_seg_len: float = P.MIN_SEG_LEN_FOR_CROSSING,
                        kerb_perc: float = P.KERB_PERC,
                        curve_radius: float = P.DEFAULT_CURVE_RADIUS,
                        d_to_add: float = P.D_TO_ADD_TO_EACH_SIDE):
    """Crossing 5-point polylines + kerb points at street endpoints.

    Mirrors ``generate_crossings_and_kerbs``
    (full_sidewalkreator_bbox_algorithm.py:515-938): for each split street
    segment endpoint with >=1 other street within ``search_buffer``,
    interpolate a crossing center inward, cast a perpendicular ray of
    half-span (max_w/2 + curve + d_to_add + 0.5) both ways, take the
    nearest sidewalk intersections as A/E, kerbs B/D at ``kerb_perc``
    along A->C and E->C.

    Returns (crossings, kerbs):
    - crossings: list of dicts {coords (5,2), length, center (2,)}
    - kerbs: list of dicts {xy (2,), crossing_index}
    Ids are assigned by the caller (deterministic per-tile ordering).
    """
    n = len(noded_segs)
    crossings: list[dict] = []
    kerbs: list[dict] = []
    if n == 0:
        return crossings, kerbs
    widths = np.asarray(widths, dtype=np.float64)
    lens = core.segment_lengths(noded_segs)

    # endpoint adjacency via distance (endpoint within search_buffer of
    # another segment) — the reference buffers the endpoint and tests
    # polygon intersection (:683-701)
    starts = noded_segs[:, :2]
    ends = noded_segs[:, 2:]

    centers = []
    for si in range(n):
        seg = noded_segs[si]
        a, b = seg[:2], seg[2:]
        ln = lens[si]
        if ln == 0:
            continue
        for endpoint_type, ep in (("P0", a), ("PF", b)):
            d = core.point_segment_distance(
                np.full(n, ep[0]), np.full(n, ep[1]), noded_segs)
            near = (d <= search_buffer)
            near[si] = False
            if not near.any():
                continue
            inter_widths = widths[near]
            max_w = float(inter_widths.max()) if len(inter_widths) else float(widths[si])
            d_interp = max_w * 0.5 + curve_radius + d_to_add
            if d_interp > 0.5 * ln:
                d_interp = ln * 0.1  # :742-744
            if endpoint_type == "P0":
                center = _seg_interpolate(a, b, d_interp)
                sd = min(d_interp + 1.0, max(0.0, ln - 1e-6))
                dirpt = _seg_interpolate(a, b, sd)
            else:
                center = _seg_interpolate(a, b, ln - d_interp)
                sd = max(0.0, ln - d_interp - 1.0)
                dirpt = _seg_interpolate(a, b, sd)
            dx, dy = dirpt - center
            norm = float(np.hypot(dx, dy))
            if norm == 0:
                continue
            half_span = max_w * 0.5 + curve_radius + d_to_add + 0.5
            perp = np.array([-dy, dx]) / norm * half_span
            centers.append({"seg": si, "end": endpoint_type,
                            "center": center, "perp": perp, "len": ln})

    # deterministic order: by (center_x, center_y, seg, end)
    centers.sort(key=lambda c: (round(c["center"][0], 6),
                                round(c["center"][1], 6), c["seg"], c["end"]))

    for c in centers:
        if c["len"] < min_seg_len:  # :827
            continue
        center = c["center"]
        pA0 = center - c["perp"]
        pE0 = center + c["perp"]
        A, E = _ray_hits(pA0, pE0, sidewalk_segs)
        if A is None or E is None:
            continue
        B = A + (center - A) * kerb_perc
        D = E + (center - E) * kerb_perc
        coords = np.vstack([A, B, center, D, E])
        length = core.polyline_length(coords)
        ci = len(crossings)
        crossings.append({"coords": coords, "length": length,
                          "center": center})
        kerbs.append({"xy": B, "crossing_index": ci})
        kerbs.append({"xy": D, "crossing_index": ci})
    return crossings, kerbs


# ---------- assembled per-tile pipeline ----------

def tile_pipeline(segs: np.ndarray, widths: np.ndarray) -> dict:
    """Full geometry pipeline for one tile's street segments (local TM).

    Returns dict with protoblock rings, sidewalk rings, crossings, kerbs.
    """
    noded, w = split_streets(segs, widths)
    blocks = protoblocks(noded)
    sw_rings, _ext = sidewalk_rings(noded, w)
    sw_segs = morph.rings_to_edges(sw_rings)
    crossings, kerbs = crossings_and_kerbs(noded, w, sw_segs)
    return {"protoblocks": blocks, "sidewalks": sw_rings,
            "crossings": crossings, "kerbs": kerbs,
            "noded": noded, "noded_widths": w}
