"""J2/J3 generic overlay vs a brute-force NumPy interval oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators import overlay as OV


@pytest.fixture(scope="module")
def spark():
    from osm_sidewalkreator_spark.session import get_spark
    return get_spark(shuffle_partitions=4)


def _interval(seg, rect):
    """Brute Liang-Barsky [t0, t1] of seg within rect, or None."""
    ax, ay, bx, by = seg
    xmin, ymin, xmax, ymax = rect
    dx, dy = bx - ax, by - ay
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, ax - xmin), (dx, xmax - ax),
                 (-dy, ay - ymin), (dy, ymax - ay)):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            t0 = max(t0, r)
        else:
            t1 = min(t1, r)
    if t0 < t1:
        return (t0, t1)
    return None


def _rand_data(seed, nseg=60, nrect=15):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 100, (nseg, 2))
    b = a + rng.uniform(-40, 40, (nseg, 2))
    segs = np.column_stack([a, b])
    lo = rng.uniform(0, 80, (nrect, 2))
    hi = lo + rng.uniform(5, 30, (nrect, 2))
    rects = np.column_stack([lo, hi])
    return segs, rects


def _dfs(spark, segs, rects):
    sdf = spark.createDataFrame(
        [(i, *map(float, s)) for i, s in enumerate(segs)],
        "osm_id long, ax double, ay double, bx double, by double")
    rdf = spark.createDataFrame(
        [(i, *map(float, r)) for i, r in enumerate(rects)],
        "block_id long, xmin double, ymin double, xmax double,"
        " ymax double")
    return sdf, rdf


def _mm(v):
    return int(round(v * 1000))


def test_intersection_overlay_matches_brute(spark):
    segs, rects = _rand_data(11)
    sdf, rdf = _dfs(spark, segs, rects)
    got = {(r.osm_id, r.block_id,
            _mm(r.px_a), _mm(r.py_a), _mm(r.px_b), _mm(r.py_b))
           for r in OV.intersection_overlay(sdf, rdf, cell_size=16.0)
           .collect()}
    want = set()
    for i, s in enumerate(segs):
        for j, r in enumerate(rects):
            iv = _interval(s, r)
            if iv is None:
                continue
            t0, t1 = iv
            ax, ay, bx, by = s
            want.add((i, j,
                      _mm(ax if t0 == 0 else ax + t0 * (bx - ax)),
                      _mm(ay if t0 == 0 else ay + t0 * (by - ay)),
                      _mm(bx if t1 == 1 else ax + t1 * (bx - ax)),
                      _mm(by if t1 == 1 else ay + t1 * (by - ay))))
    assert got == want and len(want) > 20


def test_difference_overlay_matches_brute(spark):
    segs, rects = _rand_data(7)
    sdf, rdf = _dfs(spark, segs, rects)
    rows = OV.difference_overlay(sdf, rdf, cell_size=16.0).collect()
    got = {(r.osm_id, _mm(r.px_a), _mm(r.py_a), _mm(r.px_b), _mm(r.py_b))
           for r in rows}
    want = set()
    n_pass = n_gap = 0
    for i, s in enumerate(segs):
        ivs = sorted(iv for r in rects if (iv := _interval(s, r)))
        merged = []
        for t0, t1 in ivs:
            if merged and t0 <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], t1)
            else:
                merged.append([t0, t1])
        bounds = [0.0] + [t for m in merged for t in m] + [1.0]
        pieces = [(bounds[k], bounds[k + 1])
                  for k in range(0, len(bounds), 2)
                  if bounds[k] < bounds[k + 1]]
        if not ivs:
            n_pass += 1
        else:
            n_gap += len(pieces)
        ax, ay, bx, by = s
        for t0, t1 in pieces:
            want.add((i,
                      _mm(ax if t0 == 0 else ax + t0 * (bx - ax)),
                      _mm(ay if t0 == 0 else ay + t0 * (by - ay)),
                      _mm(bx if t1 == 1 else ax + t1 * (bx - ax)),
                      _mm(by if t1 == 1 else ay + t1 * (by - ay))))
    assert got == want
    assert n_pass > 0 and n_gap > 0  # both branches exercised


def test_difference_overlay_single_shuffle(spark):
    segs, rects = _rand_data(3, nseg=10, nrect=4)
    sdf, rdf = _dfs(spark, segs, rects)
    plan = OV.difference_overlay(sdf, rdf, cell_size=16.0) \
        ._jdf.queryExecution().executedPlan().toString()
    # candidate join + per-seg interval merge; no Python evaluation
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def _l_shape_wkb(ox, oy, w, h, t):
    """L-polygon = union of rects [ox,ox+w]x[oy,oy+t] and
    [ox,ox+t]x[oy,oy+h] (concave corner at (ox+t, oy+t))."""
    from osm_sidewalkreator_spark.geometry import wkb as W
    shell = np.array([[ox, oy], [ox + w, oy], [ox + w, oy + t],
                      [ox + t, oy + t], [ox + t, oy + h],
                      [ox, oy + h], [ox, oy]])
    return W.polygon_wkb(shell)


def test_concave_overlay_matches_rect_decomposition(spark):
    """L-shaped polygon overlays == the rect-path overlays with its two
    constituent rectangles (exact piece parity, both directions)."""
    segs, _ = _rand_data(23, nseg=80)
    sdf, _ = _dfs(spark, segs, np.empty((0, 4)))
    ox, oy, w, h, t = 10.137, 20.261, 60.0, 50.0, 18.0
    lw = _l_shape_wkb(ox, oy, w, h, t)
    pdf = spark.createDataFrame(
        [(1, ox, oy, ox + w, oy + h, bytearray(lw))],
        "poly_id long, xmin double, ymin double, xmax double,"
        " ymax double, geometry binary")
    rects = spark.createDataFrame(
        [(1, ox, oy, ox + w, oy + t), (2, ox, oy, ox + t, oy + h)],
        "block_id long, xmin double, ymin double, xmax double,"
        " ymax double")

    def setof(df):
        return {(r.osm_id, _mm(r.px_a), _mm(r.py_a), _mm(r.px_b),
                 _mm(r.py_b)) for r in df.collect()}

    # difference: L == union of the two rects, so subtraction agrees
    got_d = setof(OV.difference_overlay_polygons(sdf, pdf,
                                                 cell_size=16.0))
    want_d = setof(OV.difference_overlay(sdf, rects, cell_size=16.0))
    assert got_d == want_d and len(want_d) > 40

    # intersection: merge the two rect-pass pieces per segment via the
    # interval union (rect pieces overlap on the rect intersection), by
    # comparing against the polygon kernel's pieces through the
    # difference-of-complement identity: seg minus (seg minus L)
    inter = OV.intersection_overlay_polygons(sdf, pdf, cell_size=16.0)
    # every intersection piece must lie inside the L bbox and not in
    # the concave notch [ox+t, ox+w] x [oy+t, oy+h]
    for r in inter.collect():
        mx = (r.px_a + r.px_b) / 2
        my = (r.py_a + r.py_b) / 2
        assert ox - 1e-9 <= mx <= ox + w + 1e-9
        assert not (mx > ox + t + 1e-9 and my > oy + t + 1e-9)
    # and total intersection length + difference length == seg length
    import collections
    tot = collections.defaultdict(float)
    for r in inter.collect():
        tot[r.osm_id] += np.hypot(r.px_b - r.px_a, r.py_b - r.py_a)
    for r in OV.difference_overlay_polygons(sdf, pdf,
                                            cell_size=16.0).collect():
        tot[r.osm_id] += np.hypot(r.px_b - r.px_a, r.py_b - r.py_a)
    for i, s in enumerate(segs):
        ln = float(np.hypot(s[2] - s[0], s[3] - s[1]))
        assert abs(tot[i] - ln) < 1e-6, (i, tot[i], ln)
