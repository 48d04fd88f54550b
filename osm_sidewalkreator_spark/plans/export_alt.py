"""G19 ALT_SCHEMA export split (osm_sidewalkreator.py:3593-3665).

Each 5-vertex crossing [v0 v1 v2 v3 v4] becomes, for the JOSM export:

- two sidewalk stubs  [v0-v1] and [v3-v4]  (highway=footway,
  footway=sidewalk)
- one crossing center [v1-v2-v3]           (highway=footway,
  footway=crossing)
- two kerbs at v1 and v3                   (barrier=kerb)

Pure DataFrame work over the crossing WKB: the vertex access reuses
``st_explode_segments`` (Arrow batch), the part assembly is JVM column
algebra, and the part geometries are rebuilt with one small pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.geo import st_explode_segments
from ..geometry import wkb


@pandas_udf(T.BinaryType())
def _line_wkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    import numpy as np
    out = []
    for x, y in zip(xs, ys):
        out.append(wkb.linestring_wkb(
            np.column_stack([np.asarray(x), np.asarray(y)])))
    return pd.Series(out)


@pandas_udf(T.BinaryType())
def _point_wkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    return pd.Series([wkb.point_wkb(float(x), float(y))
                      for x, y in zip(xs, ys)])


def alt_schema_features(features: DataFrame) -> DataFrame:
    """crossings -> ALT_SCHEMA parts.

    Returns (crossing_fid, part, highway, footway, barrier, geometry,
    length); kerb parts carry null length. Only 5-vertex crossings are
    split (the reference checks ``len(as_polyline) == 5``).
    """
    cr = (features.filter(F.col("kind") == "crossing")
          .withColumn("s", st_explode_segments("geometry"))
          .filter(F.size("s") == 4))
    s = F.col("s")

    def seg_len(i):
        return F.sqrt(F.pow(s[i]["bx"] - s[i]["ax"], 2)
                      + F.pow(s[i]["by"] - s[i]["ay"], 2))

    parts = []
    for name, xs, ys, length in (
        ("sidewalk_stub_1",
         F.array(s[0]["ax"], s[0]["bx"]), F.array(s[0]["ay"], s[0]["by"]),
         seg_len(0)),
        ("sidewalk_stub_2",
         F.array(s[3]["ax"], s[3]["bx"]), F.array(s[3]["ay"], s[3]["by"]),
         seg_len(3)),
        ("crossing_center",
         F.array(s[1]["ax"], s[1]["bx"], s[2]["bx"]),
         F.array(s[1]["ay"], s[1]["by"], s[2]["by"]),
         seg_len(1) + seg_len(2)),
    ):
        tags = ("footway", "sidewalk" if "stub" in name else "crossing",
                None)
        parts.append(cr.select(
            F.col("fid").alias("crossing_fid"), F.lit(name).alias("part"),
            F.lit(tags[0]).alias("highway"), F.lit(tags[1]).alias("footway"),
            F.lit(tags[2]).cast("string").alias("barrier"),
            _line_wkb(xs, ys).alias("geometry"), length.alias("length")))
    for name, kx, ky in (("kerb_1", s[1]["ax"], s[1]["ay"]),
                         ("kerb_2", s[2]["bx"], s[2]["by"])):
        parts.append(cr.select(
            F.col("fid").alias("crossing_fid"), F.lit(name).alias("part"),
            F.lit(None).cast("string").alias("highway"),
            F.lit(None).cast("string").alias("footway"),
            F.lit("kerb").alias("barrier"),
            _point_wkb(kx, ky).alias("geometry"),
            F.lit(None).cast("double").alias("length")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
