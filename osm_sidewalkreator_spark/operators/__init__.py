"""Spark-level operators: cell tiling, spatial joins, dedup, ANN."""
