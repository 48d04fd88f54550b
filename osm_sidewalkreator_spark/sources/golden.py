"""Golden-fixture ingest: the reference repo's published test outputs
(``assets/test_outputs/*.geojson``, produced by its Docker smoke suite
``docker/tests/smoke_full_*.sh`` from live OSM pulls of the Curitiba
test bbox ``assets/test_data/bbox.json``).

The raw OSM input behind the goldens is not in the repo (the smoke
scripts fetch from Overpass), so exact end-to-end reproduction is
impossible offline. What the goldens DO pin down — and what the engine
is checked against (tests/test_golden_fixtures.py + the q_golden_*
queries) — is the reference's output **contract** on real-world data:

- crossings are 5-vertex LineStrings (A,B,C,D,E),
  full_sidewalkreator_bbox_algorithm.py:855-938
- kerbs come 2 per crossing and coincide EXACTLY with crossing
  vertices 1 and 3 (the kerb_perc=25% interpolation points),
  osm_sidewalkreator.py:1727-1764
- the ``length`` attribute equals the local-TM projected polyline
  length (generic_functions.py:518-557)
- protoblock boundaries re-polygonize to the same face set (G6)

Parsing is plain ``json`` (no GDAL in this container); geometry becomes
the engine's WKB. Everything ships to Spark as a regular DataFrame so
the parity checks run as declarative plans.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GOLDEN_DIR = Path("/root/reference/assets/test_outputs")

# layer -> (file stem, expected feature count) for the two smoke runs
SMOKE_LAYERS = {
    "protoblocks_bbox": ("protoblocks_bbox_smoke", 29),
    "protoblocks_polygon": ("protoblocks_polygon_smoke", 160),
    "crossings_polygon": ("crossings_polygon_smoke", 83),
    "kerbs_polygon": ("kerbs_polygon_smoke", 166),
    "sidewalks_bbox": ("sidewalks_bbox_smoke", 5),
    "sidewalks_polygon": ("sidewalks_polygon_smoke", 33),
}

_SCHEMA = T.StructType([
    T.StructField("layer", T.StringType()),
    T.StructField("fid", T.IntegerType()),
    T.StructField("gtype", T.StringType()),
    T.StructField("crossing_id", T.LongType()),
    T.StructField("kerb_id", T.LongType()),
    T.StructField("length_attr", T.DoubleType()),
    # all rings/parts flattened: for LineString/Point a single part
    T.StructField("coords", T.ArrayType(
        T.ArrayType(T.ArrayType(T.DoubleType())))),
])


def golden_path(layer: str) -> Path:
    stem, _ = SMOKE_LAYERS[layer]
    return GOLDEN_DIR / f"{stem}.geojson"


def available() -> bool:
    return GOLDEN_DIR.is_dir()


def _parts(geom: dict) -> list[list[list[float]]]:
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return [[c]]
    if t == "LineString":
        return [c]
    if t == "Polygon":
        return c
    if t == "MultiLineString":
        return c
    if t == "MultiPolygon":
        return [ring for poly in c for ring in poly]
    raise ValueError(f"unsupported geometry type {t}")


def load_layer(spark: SparkSession, layer: str) -> DataFrame:
    """One golden layer as a DataFrame (coords kept as nested arrays so
    downstream parity math runs JVM-side via higher-order functions)."""
    doc = json.loads(golden_path(layer).read_text())
    rows = []
    for i, ft in enumerate(doc["features"]):
        p = ft.get("properties") or {}
        rows.append((
            layer, i + 1, ft["geometry"]["type"],
            p.get("crossing_id"), p.get("kerb_id"),
            float(p["length"]) if p.get("length") is not None else None,
            _parts(ft["geometry"]),
        ))
    return spark.createDataFrame(rows, _SCHEMA)


def load_all(spark: SparkSession) -> DataFrame:
    out = None
    for layer in SMOKE_LAYERS:
        df = load_layer(spark, layer)
        out = df if out is None else out.unionByName(df)
    return out
