"""Integer-grid cell / tile encoding as JVM-side Spark columns.

The engine's H3/S2 analog (BASELINE.json north_rule): a cell id packs
``(floor(x/size), floor(y/size))`` into one int64. All encodings are
``pyspark.sql.functions`` expressions — whole-stage-codegen'd, no Python.
The cross-partition join pattern is: encode both sides to cells
(points: 1 cell; extended geometries: bbox cover, exploded), equi-join on
``cell``, then refine exactly. AQE + optional salting handle hot cells.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cell_id(x: Column, y: Column, size: float) -> Column:
    """Pack a point's grid cell into int64: (ix << 32) | (iy & 0xffffffff)."""
    ix = F.floor(x / F.lit(size)).cast("long")
    iy = F.floor(y / F.lit(size)).cast("long")
    return F.shiftleft(ix, 32).bitwiseOR(iy.bitwiseAND(F.lit(0xFFFFFFFF)))


def cover_cells(xmin: Column, ymin: Column, xmax: Column, ymax: Column,
                size: float, pad: float = 0.0) -> Column:
    """Array of cell ids covering a (padded) bbox — JVM-side via
    sequence + transform + flatten; explode downstream for the equi-join."""
    ix0 = F.floor((xmin - F.lit(pad)) / F.lit(size)).cast("long")
    ix1 = F.floor((xmax + F.lit(pad)) / F.lit(size)).cast("long")
    iy0 = F.floor((ymin - F.lit(pad)) / F.lit(size)).cast("long")
    iy1 = F.floor((ymax + F.lit(pad)) / F.lit(size)).cast("long")
    xs = F.sequence(ix0, ix1)
    ys = F.sequence(iy0, iy1)
    return F.flatten(F.transform(
        xs, lambda ix: F.transform(
            ys, lambda iy: F.shiftleft(ix, 32).bitwiseOR(
                iy.bitwiseAND(F.lit(0xFFFFFFFF))))))


def neighbor_cells(x: Column, y: Column, size: float) -> Column:
    """The 3x3 cell ring around a point (kNN candidate expansion, J7)."""
    return cover_cells(x, y, x, y, size, pad=size)
