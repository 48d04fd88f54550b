"""Spatial joins as cell equi-joins + exact refinement (SURVEY.md §2.3).

Design for 100 TB: every join here is a Catalyst-planned equi-join on an
int64 ``cell`` column — shuffle partitioning, broadcast decisions, and
AQE skew splitting all come for free. The exact predicate refinement is
either pure column math (point-segment distance, rectangle containment —
JVM codegen) or a batched PIP test in ``applyInPandas`` grouped by
polygon (decode each polygon once per group, vectorized ray casting).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry import core, wkb
from .tiling import cell_id, cover_cells, neighbor_cells


def knn_join_points_segments(points: DataFrame, segments: DataFrame,
                             k: int = 1, max_dist: float = 50.0,
                             cell_size: float = 128.0,
                             point_id: str = "url") -> DataFrame:
    """k nearest segments per point within ``max_dist`` (J7/W1).

    The reference's ``QgsSpatialIndex.nearestNeighbor`` with
    ``knn_max_dist=50`` (osm_sidewalkreator.py:1727-1757, parameters.py:157).

    points: (point_id, x, y); segments: (seg_id, ax, ay, bx, by).
    Distance math is closed-form Spark column algebra (JVM), candidates
    via 3x3 cell ring; ``cell_size`` must be >= max_dist for the ring to
    be a superset of the true neighborhood.
    """
    if cell_size < max_dist:
        raise ValueError("cell_size must be >= max_dist for ring coverage")
    # The 3x3 ring covers every segment within one grid pitch of the
    # point, so correctness needs pitch >= max_dist — nothing more. A
    # caller-sized pitch (e.g. 128 m for a 50 m query) scans a
    # (3*pitch)^2 neighborhood; shrinking the pitch to max_dist cuts
    # the candidate-pair count quadratically (measured 41M -> ~7M at
    # sf0.1) while the exact distance refine keeps results identical.
    g = min(cell_size, max_dist) if max_dist > 0 else cell_size
    p = points.withColumn(
        "cell", F.explode(neighbor_cells(F.col("x"), F.col("y"), g)))
    # project to the join's needed columns: callers may carry extra
    # attributes (the bench's segment table has fid) and an equi-join
    # would shuffle them into every candidate pair (guide §2.3)
    s = segments.select("seg_id", "ax", "ay", "bx", "by").withColumn(
        "cell", F.explode(cover_cells(
            F.least("ax", "bx"), F.least("ay", "by"),
            F.greatest("ax", "bx"), F.greatest("ay", "by"), g)))
    # SHUFFLE_HASH (§3.1): the planner broadcasts the exploded segment
    # side when its estimate fits (452k rows at sf0.1) and the
    # single-threaded broadcast build then dominates the join (measured
    # 0.85 s of the 1.15 s query; shuffled-hash per-partition builds cut
    # the full query to 0.80 s). It is also the scale-correct shape: the
    # exploded segment table is corpus-sized at target scale, far over
    # any broadcast bound, while both sides shuffled by cell stay
    # AQE-coalesced/skew-split. Row set is unchanged (same equi-key),
    # and min(struct) below is order-independent, so results are
    # identical under either strategy.
    j = p.join(s.hint("SHUFFLE_HASH"), "cell")
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    ll = dx * dx + dy * dy
    t = ((F.col("x") - F.col("ax")) * dx + (F.col("y") - F.col("ay")) * dy) / ll
    tc = F.when(ll == 0, F.lit(0.0)).otherwise(
        F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0)))
    cx = F.col("ax") + tc * dx
    cy = F.col("ay") + tc * dy
    dist = F.sqrt(F.pow(F.col("x") - cx, 2) + F.pow(F.col("y") - cy, 2))
    j = j.withColumn("dist", dist).filter(F.col("dist") <= max_dist)
    if k == 1:
        # single-aggregation fast path: min(struct(dist, seg_id)) IS the
        # rank-1 row under (dist asc, seg_id asc), duplicates from
        # multiple shared cells collapse inside the same min — one
        # shuffle instead of the dedup-groupBy + window pair (the double
        # shuffle measured 4x slower and anti-scaling at sf0.1)
        best = j.groupBy(point_id).agg(
            F.min(F.struct("dist", "seg_id")).alias("b"))
        return best.select(point_id, F.col("b.seg_id").alias("seg_id"),
                           F.col("b.dist").alias("dist"),
                           F.lit(1).alias("knn_rank"))
    # a segment can reach a point from several candidate cells
    j = j.groupBy(point_id, "seg_id").agg(F.min("dist").alias("dist"))
    w = Window.partitionBy(point_id).orderBy(F.col("dist").asc(),
                                             F.col("seg_id").asc())
    return (j.withColumn("knn_rank", F.row_number().over(w))
             .filter(F.col("knn_rank") <= k))


def pip_join_points_rects(points: DataFrame, rects: DataFrame,
                          cell_size: float = 128.0) -> DataFrame:
    """Point-in-axis-aligned-rectangle containment join (J9 fast path).

    rects: (block_id, xmin, ymin, xmax, ymax). Pure column predicates.
    """
    p = points.withColumn("cell", cell_id(F.col("x"), F.col("y"), cell_size))
    r = rects.withColumn("cell", F.explode(cover_cells(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        cell_size)))
    return (p.join(r, "cell")
             .filter((F.col("x") >= F.col("xmin")) & (F.col("x") < F.col("xmax"))
                     & (F.col("y") >= F.col("ymin")) & (F.col("y") < F.col("ymax")))
             .drop("cell"))


def incidence_length_join(rects: DataFrame, segments: DataFrame,
                          cell_size: float = 128.0) -> DataFrame:
    """J8 summed-length incidence (``create_incidence_field_layers_A_B``
    with ``total_length_instead=True``, generic_functions.py:1408-1465,
    used for the A10 protoblock filter at osm_sidewalkreator.py:733-762).

    rects: (block_id, xmin, ymin, xmax, ymax); segments: (way_id,
    way_len, ax, ay, bx, by) — ways intersecting a rect contribute their
    FULL ``way_len`` once. Exact segment-vs-rect predicate is the
    separating-axis test in pure column algebra (JVM codegen): bbox
    overlap on x/y plus the rect's corners not strictly on one side of
    the segment line. Cell equi-join candidates keep it shuffle-bounded.
    """
    r = rects.withColumn("cell", F.explode(cover_cells(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        cell_size)))
    s = segments.withColumn("cell", F.explode(cover_cells(
        F.least("ax", "bx"), F.least("ay", "by"),
        F.greatest("ax", "bx"), F.greatest("ay", "by"), cell_size)))
    j = r.join(s, "cell")
    bbox_ok = ((F.greatest("ax", "bx") >= F.col("xmin"))
               & (F.least("ax", "bx") <= F.col("xmax"))
               & (F.greatest("ay", "by") >= F.col("ymin"))
               & (F.least("ay", "by") <= F.col("ymax")))
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")

    def side(cx, cy):
        return dx * (cy - F.col("ay")) - dy * (cx - F.col("ax"))

    s1 = side(F.col("xmin"), F.col("ymin"))
    s2 = side(F.col("xmax"), F.col("ymin"))
    s3 = side(F.col("xmax"), F.col("ymax"))
    s4 = side(F.col("xmin"), F.col("ymax"))
    not_separated = ~((s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)) \
        & ~((s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0))
    return (j.filter(bbox_ok & not_separated)
            .groupBy("block_id", "way_id")
            .agg(F.first("way_len").alias("way_len"))
            .groupBy("block_id")
            .agg(F.sum("way_len").alias("inc_len")))


def incidence_ids_join(rects: DataFrame, segments: DataFrame,
                       cell_size: float = 128.0) -> DataFrame:
    """J8 id-list incidence (``create_incidence_field_layers_A_B``
    default mode, generic_functions.py:1408-1465 — writes the incident
    feature ids as a space-joined string field, used for sidewalk ids
    per protoblock at osm_sidewalkreator.py:988).

    Same candidate join and exact separating-axis predicate as
    ``incidence_length_join``; emits per rect the sorted distinct
    incident way ids as ``"id1 id2 ..."`` plus their count."""
    r = rects.withColumn("cell", F.explode(cover_cells(
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
        cell_size)))
    s = segments.withColumn("cell", F.explode(cover_cells(
        F.least("ax", "bx"), F.least("ay", "by"),
        F.greatest("ax", "bx"), F.greatest("ay", "by"), cell_size)))
    j = r.join(s, "cell")
    bbox_ok = ((F.greatest("ax", "bx") >= F.col("xmin"))
               & (F.least("ax", "bx") <= F.col("xmax"))
               & (F.greatest("ay", "by") >= F.col("ymin"))
               & (F.least("ay", "by") <= F.col("ymax")))
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")

    def side(cx, cy):
        return dx * (cy - F.col("ay")) - dy * (cx - F.col("ax"))

    s1 = side(F.col("xmin"), F.col("ymin"))
    s2 = side(F.col("xmax"), F.col("ymin"))
    s3 = side(F.col("xmax"), F.col("ymax"))
    s4 = side(F.col("xmin"), F.col("ymax"))
    not_separated = ~((s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)) \
        & ~((s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0))
    return (j.filter(bbox_ok & not_separated)
            .groupBy("block_id")
            .agg(F.array_sort(F.collect_set("way_id")).alias("_ids"))
            .select("block_id",
                    F.array_join("_ids", " ").alias("inc_ids"),
                    F.size("_ids").alias("n_inc")))


def pip_join_points_polygons(points: DataFrame, polys: DataFrame,
                             cell_size: float = 128.0,
                             point_id: str = "url",
                             poly_id: str = "poly_id",
                             keep_cols: tuple = ()) -> DataFrame:
    """Generic point-in-polygon join (J9): cell candidates + grouped
    vectorized ray-casting refinement.

    points: (point_id, x, y); polys: (poly_id, geometry WKB in the same
    CRS). Each polygon is decoded once per group; the PIP test is a
    vectorized even-odd crossing count (``core.points_in_polygon``).
    """
    # bbox via a light pandas UDF (decode once here, once in refine)
    @F.pandas_udf(T.StructType([
        T.StructField("xmin", T.DoubleType()),
        T.StructField("ymin", T.DoubleType()),
        T.StructField("xmax", T.DoubleType()),
        T.StructField("ymax", T.DoubleType())]))
    def poly_bbox(col: pd.Series) -> pd.DataFrame:
        a = np.empty((len(col), 4))
        for i, blob in enumerate(col):
            rings = wkb.decode_polygons(blob)
            allc = np.vstack([r for rr in rings for r in rr])
            a[i] = [allc[:, 0].min(), allc[:, 1].min(),
                    allc[:, 0].max(), allc[:, 1].max()]
        return pd.DataFrame(
            {"xmin": a[:, 0], "ymin": a[:, 1], "xmax": a[:, 2], "ymax": a[:, 3]})

    pl = (polys.withColumn("_bb", poly_bbox("geometry"))
               .select(poly_id, "geometry",
                       F.explode(cover_cells(
                           F.col("_bb.xmin"), F.col("_bb.ymin"),
                           F.col("_bb.xmax"), F.col("_bb.ymax"),
                           cell_size)).alias("cell")))
    p = points.withColumn("cell", cell_id(F.col("x"), F.col("y"), cell_size))
    cand = p.join(pl, "cell").drop("cell")

    out_fields = [T.StructField(point_id, T.StringType()),
                  T.StructField(poly_id, T.LongType())]
    for c in keep_cols:
        out_fields.append(T.StructField(c, T.DoubleType()))
    schema = T.StructType(out_fields)

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = wkb.decode_polygons(pdf["geometry"].iloc[0])[0]
        inside = core.points_in_polygon(pdf["x"].to_numpy(),
                                        pdf["y"].to_numpy(), rings)
        cols = {point_id: pdf[point_id][inside],
                poly_id: pdf[poly_id][inside]}
        for c in keep_cols:
            cols[c] = pdf[c][inside]
        return pd.DataFrame(cols)

    # salted refine groups: a Zipf-hot polygon's candidates split across
    # n_salt tasks instead of one straggler (PIP is per-point, so the
    # split changes nothing semantically; each group re-decodes the
    # polygon once — bytes per group stay bounded)
    n_salt = 8
    cand = cand.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(point_id)), F.lit(n_salt)))
    return cand.groupBy(poly_id, "_salt").applyInPandas(refine, schema)


def dedup_geometries(df: DataFrame, geom_col: str = "geometry",
                     order_col: str | None = None,
                     canonical: bool = False) -> DataFrame:
    """Duplicate-geometry removal (A9, ``generic_functions.py:92-95``):
    keep one row per identical WKB (deterministic winner by order_col).

    ``canonical=True`` normalizes LineString orientation first
    (Arrow-batched UDF), so a way and its reverse count as the SAME
    geometry — matching ``native:deleteduplicategeometries``'s
    geometric equality rather than byte equality."""
    key = geom_col
    if canonical:
        from ..functions.geo import st_canonical_wkb
        df = df.withColumn("_ckey", st_canonical_wkb(F.col(geom_col)))
        key = "_ckey"
    if order_col is None:
        return df.dropDuplicates([key]).drop("_ckey") if canonical \
            else df.dropDuplicates([key])
    w = Window.partitionBy(key).orderBy(F.col(order_col).asc())
    out = (df.withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") == 1).drop("_rn"))
    return out.drop("_ckey") if canonical else out
