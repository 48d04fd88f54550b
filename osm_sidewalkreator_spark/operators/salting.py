"""Explicit skew salting for hot-cell joins (BASELINE.json north_rule).

Zipf-geocoded pages concentrate on a few urban cells; when BOTH join
sides are too large to broadcast, a sort-merge join on ``cell`` puts a
hot cell's entire population in one task. The classic fix, expressed
declaratively so Catalyst still plans the join:

- fact side (pages): ``salt = pmod(xxhash64(id), S)`` — splits each hot
  cell into S shuffle keys;
- dimension side (geometry): replicate each row S times (one per salt).

AQE's skew-join splitting (enabled in the session) is the runtime
backstop; explicit salting is the planned-ahead version for joins whose
skew is known (hot urban cells), where it also helps the *aggregation*
that follows (partial aggregates per salted key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_fact(df: DataFrame, id_col: str, factor: int) -> DataFrame:
    """Add a deterministic salt column derived from the row id."""
    return df.withColumn("salt", F.pmod(F.xxhash64(id_col),
                                        F.lit(factor)).cast("int"))


def replicate_dim(df: DataFrame, factor: int) -> DataFrame:
    """Replicate the dimension side once per salt value."""
    return df.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))
                          .cast("array<int>")))


def salted_cell_join(fact: DataFrame, dim: DataFrame, factor: int,
                     fact_id: str, join_cols: list[str] | None = None,
                     how: str = "inner") -> DataFrame:
    """Equi-join on (cell, salt): hot cells fan out over ``factor``
    shuffle partitions. Both inputs must carry a ``cell`` column."""
    cols = (join_cols or ["cell"]) + ["salt"]
    return (salt_fact(fact, fact_id, factor)
            .join(replicate_dim(dim, factor), cols, how)
            .drop("salt"))


def top_hot_cells(df: DataFrame, cell_col: str = "cell",
                  k: int = 20) -> list[int]:
    """Sampled hot-cell histogram — pick the salting factor from the
    ratio of the hottest cell to the median (driver-side, tiny)."""
    rows = (df.groupBy(cell_col).count()
            .orderBy(F.col("count").desc()).limit(k).collect())
    return [r[cell_col] for r in rows]
