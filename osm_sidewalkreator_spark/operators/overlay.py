"""Generic overlay operators (J2/J3): line-layer x polygon-layer
``native:intersection`` / ``native:difference`` as first-class DataFrame
ops (reference: ``generic_functions.py:124-143``, used at
``osm_sidewalkreator.py:3553-3555`` (Voronoi split), ``:1925``,
``:2250-2259`` (exclusion zones), ``sidewalk_generation_logic.py:369-376``).

Shape chosen for 100 TB: a bounded cell equi-join produces candidate
(segment, polygon) pairs, the clip is pure column algebra (Liang-Barsky
interval, JVM whole-stage codegen), and the difference merges covered
t-intervals per segment with ONE groupBy on the segment id — no Python
in the hot path, no per-feature loops, no cartesian.

Two polygon tiers share the same downstream interval algebra:

- axis-aligned rectangles (`intersection_overlay`/`difference_overlay`)
  stay 100% JVM (Liang-Barsky columns);
- arbitrary (multi)polygons with holes, concave included
  (`*_overlay_polygons`), get their inside-intervals from an
  Arrow-batched even-odd clipping kernel, then reuse the same JVM
  piece/subtraction plans. (The Voronoi split kernel in
  ``plans/refine.py`` remains the tile-local convex path.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .predicates import _clip_interval
from .tiling import cover_cells

_IV = "array<struct<t0:double,t1:double>>"


def _candidates(segs: DataFrame, rects: DataFrame, cell_size: float,
                seg_id: str, rect_id: str) -> DataFrame:
    """Distinct (segment, rect) candidate pairs sharing a grid cell,
    with the clip interval columns attached."""
    s = segs.withColumn("cell", F.explode(cover_cells(
        F.least("ax", "bx"), F.least("ay", "by"),
        F.greatest("ax", "bx"), F.greatest("ay", "by"), cell_size)))
    r = rects.withColumn("cell", F.explode(cover_cells(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        cell_size)))
    j = (s.join(r, "cell").drop("cell")
          .dropDuplicates([seg_id, rect_id]))
    t0, t1, outside = _clip_interval()
    return (j.withColumn("_t0", t0).withColumn("_t1", t1)
             .filter(~outside & (t0 < t1)))


def _piece_coords(t0col, t1col):
    """Clipped endpoint columns; untouched endpoints stay bit-identical
    (t=0/1 interpolation would drift by an ULP)."""
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    return [
        F.when(t0col == 0.0, F.col("ax"))
         .otherwise(F.col("ax") + t0col * dx).alias("px_a"),
        F.when(t0col == 0.0, F.col("ay"))
         .otherwise(F.col("ay") + t0col * dy).alias("py_a"),
        F.when(t1col == 1.0, F.col("bx"))
         .otherwise(F.col("ax") + t1col * dx).alias("px_b"),
        F.when(t1col == 1.0, F.col("by"))
         .otherwise(F.col("ay") + t1col * dy).alias("py_b"),
    ]


def intersection_overlay(segs: DataFrame, rects: DataFrame,
                         cell_size: float = 128.0,
                         seg_id: str = "osm_id",
                         rect_id: str = "block_id") -> DataFrame:
    """J2 ``native:intersection``: one output row per (segment, polygon)
    pair that truly overlaps, geometry cut to the overlap, attributes of
    BOTH inputs carried (QGIS keeps input+overlay fields). Zero-length
    touches are dropped (line output)."""
    cand = _candidates(segs, rects, cell_size, seg_id, rect_id)
    keep = [c for c in cand.columns if c not in
            ("_t0", "_t1", "ax", "ay", "bx", "by")]
    return cand.select(*keep,
                       *_piece_coords(F.col("_t0"), F.col("_t1")))


def difference_overlay(segs: DataFrame, rects: DataFrame,
                       cell_size: float = 128.0,
                       seg_id: str = "osm_id",
                       rect_id: str = "block_id") -> DataFrame:
    """J3 ``native:difference``: each segment minus the UNION of all
    overlapping polygons; segments touching nothing pass through whole.

    One shuffle: candidates groupBy(seg_id) -> sorted interval list ->
    JVM fold merges overlapping/touching intervals -> complement pieces
    explode. Segment attrs ride along via first() (seg_id is unique in
    the input layer)."""
    cand = _candidates(segs, rects, cell_size, seg_id, rect_id) \
        .select(seg_id, "_t0", "_t1")
    return _subtract_intervals(segs, cand, seg_id)


def _subtract_intervals(segs: DataFrame, cand: DataFrame,
                        seg_id: str) -> DataFrame:
    """Each segment minus the union of covered [t0, t1] intervals in
    ``cand`` (seg_id, _t0, _t1); untouched segments pass through whole.
    One groupBy(seg_id) shuffle + a JVM interval-merge fold."""
    attrs = [c for c in segs.columns
             if c not in (seg_id, "ax", "ay", "bx", "by")]
    iv = (cand.groupBy(seg_id)
          .agg(F.sort_array(F.collect_list(
              F.struct(F.col("_t0").alias("t0"),
                       F.col("_t1").alias("t1")))).alias("_iv")))
    covered = segs.join(iv, seg_id, "inner")
    merged = F.aggregate(
        F.col("_iv"),
        F.expr(f"CAST(array() AS {_IV})"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (x["t0"] <= F.element_at(acc, -1)["t1"]),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1)["t0"].alias("t0"),
                    F.greatest(F.element_at(acc, -1)["t1"],
                               x["t1"]).alias("t1"))))
        ).otherwise(F.concat(acc, F.array(x))))
    starts = F.concat(F.array(F.lit(0.0)),
                      F.transform(merged, lambda m: m["t1"]))
    ends = F.concat(F.transform(merged, lambda m: m["t0"]),
                    F.array(F.lit(1.0)))
    pieces = F.filter(
        F.zip_with(starts, ends,
                   lambda s, e: F.struct(s.alias("t0"), e.alias("t1"))),
        lambda p: p["t0"] < p["t1"])
    gaps = (covered.withColumn("_p", F.explode(pieces))
            .select(seg_id, *attrs, "ax", "ay", "bx", "by",
                    F.col("_p.t0").alias("_t0"),
                    F.col("_p.t1").alias("_t1"))
            .select(seg_id, *attrs,
                    *_piece_coords(F.col("_t0"), F.col("_t1"))))
    whole = (segs.join(iv.select(seg_id), seg_id, "left_anti")
             .select(seg_id, *attrs,
                     F.col("ax").alias("px_a"), F.col("ay").alias("py_a"),
                     F.col("bx").alias("px_b"), F.col("by").alias("py_b")))
    return gaps.unionByName(whole)


def polygon_clip_intervals(segs: DataFrame, polys: DataFrame,
                           cell_size: float = 128.0,
                           seg_id: str = "osm_id",
                           poly_id: str = "poly_id") -> DataFrame:
    """Inside-intervals of segments vs ARBITRARY (multi)polygons with
    holes (concave allowed): even-odd interval clipping.

    ``polys``: (poly_id, xmin, ymin, xmax, ymax, geometry WKB). Cell
    equi-join bounds the candidate pairs; an Arrow-batched kernel
    computes, per pair, the parametric t of every transversal edge
    crossing and classifies the midpoints of consecutive pieces by
    even-odd ray casting (vectorized per distinct polygon in the
    batch). Returns (seg_id, poly_id, ax, ay, bx, by, _t0, _t1) rows —
    one per inside-piece. Boundary-collinear segments are undefined
    (same as GEOS within float noise); callers at grid-aligned data
    should offset the overlay layer off the lattice.
    """
    import numpy as np
    import pandas as pd

    from ..geometry import core, wkb

    s = segs.select(seg_id, "ax", "ay", "bx", "by").withColumn(
        "cell", F.explode(cover_cells(
            F.least("ax", "bx"), F.least("ay", "by"),
            F.greatest("ax", "bx"), F.greatest("ay", "by"), cell_size)))
    p = polys.select(poly_id, "xmin", "ymin", "xmax", "ymax",
                     "geometry").withColumn(
        "cell", F.explode(cover_cells(
            F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
            cell_size)))
    j = (s.join(p, "cell").drop("cell")
         .dropDuplicates([seg_id, poly_id])
         .filter((F.greatest("ax", "bx") >= F.col("xmin"))
                 & (F.least("ax", "bx") <= F.col("xmax"))
                 & (F.greatest("ay", "by") >= F.col("ymin"))
                 & (F.least("ay", "by") <= F.col("ymax"))))

    sid_t = segs.schema[seg_id].dataType.simpleString()
    pid_t = polys.schema[poly_id].dataType.simpleString()
    out_schema = (f"{seg_id} {sid_t}, {poly_id} {pid_t}, "
                  "ax double, ay double, bx double, by double, "
                  "_t0 double, _t1 double")

    def kernel(it):
        for pdf in it:
            rows = []
            for blob, grp in pdf.groupby("geometry", sort=False):
                rings = [r for po in wkb.decode_polygons(bytes(blob))
                         for r in po]
                edges = np.vstack([np.column_stack(
                    [r[:, 0], r[:, 1],
                     np.roll(r[:, 0], -1), np.roll(r[:, 1], -1)])
                    for r in rings])
                S = grp[["ax", "ay", "bx", "by"]].to_numpy(np.float64)
                dxs = (S[:, 2] - S[:, 0])[:, None]
                dys = (S[:, 3] - S[:, 1])[:, None]
                ex = (edges[:, 2] - edges[:, 0])[None, :]
                ey = (edges[:, 3] - edges[:, 1])[None, :]
                qx = edges[None, :, 0] - S[:, 0:1]
                qy = edges[None, :, 1] - S[:, 1:2]
                denom = dxs * ey - dys * ex
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = (qx * ey - qy * ex) / denom
                    u = (qx * dys - qy * dxs) / denom
                # u half-open: a crossing at a shared ring vertex
                # counts once
                ok = (np.abs(denom) > 1e-12) \
                    & (t > 0) & (t < 1) & (u >= 0) & (u < 1)
                si, _ = np.nonzero(ok)
                ts = t[ok]
                for k in range(len(S)):
                    row_ts = np.sort(ts[si == k])
                    bounds = np.concatenate([[0.0], row_ts, [1.0]])
                    mids_t = (bounds[:-1] + bounds[1:]) / 2
                    mx = S[k, 0] + mids_t * (S[k, 2] - S[k, 0])
                    my = S[k, 1] + mids_t * (S[k, 3] - S[k, 1])
                    inside = core.points_in_polygon(mx, my, rings)
                    for b0, b1, ins in zip(bounds[:-1], bounds[1:],
                                           inside):
                        if ins and b0 < b1:
                            r = grp.iloc[k]
                            rows.append((r[seg_id], r[poly_id],
                                         r["ax"], r["ay"], r["bx"],
                                         r["by"], float(b0), float(b1)))
            cols = [seg_id, poly_id, "ax", "ay", "bx", "by",
                    "_t0", "_t1"]
            yield pd.DataFrame(rows, columns=cols)

    return j.mapInPandas(kernel, out_schema)


def intersection_overlay_polygons(segs: DataFrame, polys: DataFrame,
                                  cell_size: float = 128.0,
                                  seg_id: str = "osm_id",
                                  poly_id: str = "poly_id") -> DataFrame:
    """J2 for arbitrary polygons: one row per truly-overlapping
    (segment, polygon) inside-piece, geometry cut to the piece."""
    iv = polygon_clip_intervals(segs, polys, cell_size, seg_id, poly_id)
    return iv.select(seg_id, poly_id,
                     *_piece_coords(F.col("_t0"), F.col("_t1")))


def difference_overlay_polygons(segs: DataFrame, polys: DataFrame,
                                cell_size: float = 128.0,
                                seg_id: str = "osm_id",
                                poly_id: str = "poly_id") -> DataFrame:
    """J3 for arbitrary polygons: each segment minus the union of all
    overlapping polygons (shared JVM interval-merge fold)."""
    iv = polygon_clip_intervals(segs, polys, cell_size, seg_id,
                                poly_id).select(seg_id, "_t0", "_t1")
    return _subtract_intervals(segs, iv, seg_id)
