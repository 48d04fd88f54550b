"""GeoJSON export (S4) and multi-layer merge (S5).

Reference: per-layer reproject-to-4326 + OGR write
(``generic_functions.py:404-413`` used at
``osm_sidewalkreator.py:3737-3755``) and dict-level FeatureCollection
merge (``merge_geojsons`` ``generic_functions.py:1589-1606``). Here each
feature row becomes a GeoJSON Feature string built JVM-side-adjacent
(pandas UDF for coordinate extraction, ``to_json``-style assembly), and
the merged JOSM-ready file is the union of the per-kind layers —
executor-written sorted text parts streamed into one document, the
Spark analog of the reference's features-array concat.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geometry import wkb

# final OSM tags per kind (osm_sidewalkreator.py:1149-1173)
KIND_TAGS = {
    "sidewalk": {"highway": "footway", "footway": "sidewalk"},
    "crossing": {"highway": "footway", "footway": "crossing"},
    "kerb": {"barrier": "kerb"},
    "protoblock": {},
}


@F.pandas_udf(T.StringType())
def _geom_geojson(col: pd.Series) -> pd.Series:
    out = []
    for blob in col:
        t, parts = wkb.decode(blob)
        if t == wkb.POINT:
            g = {"type": "Point",
                 "coordinates": [round(float(parts[0][0, 0]), 7),
                                 round(float(parts[0][0, 1]), 7)]}
        elif t == wkb.LINESTRING:
            g = {"type": "LineString",
                 "coordinates": [[round(float(x), 7), round(float(y), 7)]
                                 for x, y in parts[0]]}
        elif t in (wkb.POLYGON, wkb.MULTIPOLYGON):
            rings = wkb.decode_polygons(blob)[0]
            g = {"type": "Polygon",
                 "coordinates": [[[round(float(x), 7), round(float(y), 7)]
                                  for x, y in r] for r in rings]}
        else:
            g = {"type": "GeometryCollection", "geometries": []}
        out.append(json.dumps(g, separators=(",", ":")))
    return pd.Series(out)


def features_to_geojson_rows(features_4326: DataFrame) -> DataFrame:
    """One GeoJSON Feature string per row, tagged per kind."""
    tag_map = F.create_map(*[
        F.lit(x) for kind, tags in KIND_TAGS.items()
        for x in (kind, json.dumps(tags, separators=(",", ":")))])
    return features_4326.select(
        "kind", "fid",
        F.concat(
            F.lit('{"type":"Feature","id":'), F.col("fid").cast("string"),
            F.lit(',"properties":'),
            F.coalesce(tag_map[F.col("kind")], F.lit("{}")),
            F.lit(',"geometry":'), _geom_geojson("geometry"),
            F.lit("}")).alias("feature_json"))


def write_merged_geojson(features_4326: DataFrame, path: str,
                         kinds: tuple = ("sidewalk", "crossing", "kerb"),
                         keep_parts: bool = False):
    """JOSM-ready merged FeatureCollection (S5 semantics): the union of
    the requested layers in one file.

    Scale path: the feature rows are range-partitioned and sorted by
    (kind, fid) and written as text parts by the EXECUTORS
    (``df.write.text``); the driver then streams the part files into
    the single merged document line-by-line — O(1) driver memory, no
    ``collect()`` of features. Concatenating range partitions in part
    order preserves the global (kind, fid) sort, so the output is
    byte-identical to the reference's features-array concat
    (``merge_geojsons`` generic_functions.py:1589-1606). At true scale
    the part directory itself is the artifact (pass
    ``keep_parts=True`` to retain it as a manifest next to the merged
    file)."""
    import glob
    import shutil

    rows = (features_to_geojson_rows(features_4326)
            .filter(F.col("kind").isin(*kinds))
            .repartitionByRange(F.col("kind"), F.col("fid"))
            .sortWithinPartitions("kind", "fid")
            .select("feature_json"))
    parts_dir = path + ".parts"
    rows.write.mode("overwrite").text(parts_dir)
    # The glob below reads the driver-local filesystem; on a cluster
    # without shared storage (or after a write failure) it can come up
    # empty — fail loudly instead of emitting a valid-but-empty
    # FeatureCollection. Sessions configured with
    # marksuccessfuljobs=false commit without a marker, so the marker
    # alone is not required — but with NEITHER marker nor part files
    # the write cannot have committed here, and without the marker the
    # streamed line count is verified against the DataFrame below.
    has_marker = os.path.exists(os.path.join(parts_dir, "_SUCCESS"))
    if not has_marker and not glob.glob(parts_dir + "/part-*"):
        raise IOError(
            f"{parts_dir}: no _SUCCESS marker and no part files — the "
            "text write did not commit, or the parts are not on the "
            "driver's filesystem (shared storage required for the "
            "merged-file path)")
    n = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[\n')
        first = True
        for part in sorted(glob.glob(parts_dir + "/part-*")):
            with open(part) as pf:
                for line in pf:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    if not first:
                        f.write(",\n")
                    f.write(line)
                    first = False
                    n += 1
        f.write("\n]}")
    if n == 0 and rows.limit(1).count() > 0:
        raise IOError(
            f"{parts_dir}: part files held 0 features but the input is "
            "non-empty — refusing to emit an empty FeatureCollection")
    if not has_marker and n != (expected := rows.count()):
        raise IOError(
            f"{parts_dir}: no _SUCCESS marker and streamed {n} features "
            f"vs {expected} input rows — partial commit; refusing to "
            "emit a truncated FeatureCollection")
    if not keep_parts:
        shutil.rmtree(parts_dir)
    return n
