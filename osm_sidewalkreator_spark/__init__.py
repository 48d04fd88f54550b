"""osm_sidewalkreator_spark — a PySpark-native sidewalk-geometry and
spatial-join engine.

A from-scratch rebuild of the *capabilities* of the reference QGIS plugin
kauevestena/osm_sidewalkreator (see /root/repo/SURVEY.md) as an idiomatic
Spark library:

- geometry kernels are pure NumPy over WKB columns (no GEOS/shapely/h3
  native deps), exposed as Arrow-vectorized pandas UDFs;
- spatial joins (point-in-polygon, kNN, distance, overlay) are expressed
  as cell equi-joins (integer grid tiling) + vectorized exact refinement,
  so Catalyst handles shuffle planning / AQE skew;
- the sidewalk/crossing/kerb generation pipeline runs per-tile via
  ``groupBy(tile).applyInPandas`` with halo overlap + ownership dedup,
  which is the scale-out strategy for a 1000-executor cluster;
- page-side (Common-Crawl-style web pages) operators never rewrite the
  ``text`` column (byte-identity invariant, BASELINE.json input_hint).
"""

__version__ = "0.1.0"
