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

Polygons here are the axis-aligned-rectangle fast path (the synthetic
blocks / exclusion zones / AOI are rects; the engine's convex-polygon
clip lives in the Voronoi split kernel, ``plans/refine.py``). The same
interval algebra applies per convex edge; rects need exactly the four
halfplanes `_clip_interval` already encodes.
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
    attrs = [c for c in segs.columns
             if c not in (seg_id, "ax", "ay", "bx", "by")]
    cand = _candidates(segs, rects, cell_size, seg_id, rect_id) \
        .select(seg_id, "_t0", "_t1")
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
