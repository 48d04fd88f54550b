"""Spark-free scaling control: the tile kernel under multiprocessing.

Separates engine/Spark overhead from host limits when judging the
north-rule scaling number: whatever efficiency THIS shows from N to 4N
processes is the hardware/OS ceiling for the kernel workload on this
box (no shuffle, no Arrow, no JVM — just fork + NumPy).

Writes BENCH/MP_CONTROL.json, which scaling_run.py folds into
BENCH/BASELINE.md. Usage: python scripts/mp_control.py [sf_dir] [N]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault(
    "GLIBC_TUNABLES",
    "glibc.malloc.mmap_threshold=134217728"
    ":glibc.malloc.trim_threshold=134217728")

import pandas as pd  # noqa: E402

from osm_sidewalkreator_spark import params as P  # noqa: E402
from osm_sidewalkreator_spark.plans import pipeline as PL  # noqa: E402

_TILES = None


def _load_tiles(sf_dir: str):
    from pyspark.sql import functions as F
    from osm_sidewalkreator_spark.operators.tiling import cover_cells
    from osm_sidewalkreator_spark.session import get_spark
    spark = get_spark(app="mp_control_extract", shuffle_partitions=16)
    streets = PL.assign_widths(
        PL.clip_to_aoi(PL.load_streets(spark, sf_dir), spark, sf_dir))
    segs = PL.street_segments_tm(streets)
    tiled = segs.withColumn("tile", F.explode(cover_cells(
        F.least("ax", "bx"), F.least("ay", "by"),
        F.greatest("ax", "bx"), F.greatest("ay", "by"),
        P.TILE_SIZE_M, pad=P.TILE_HALO_M)))
    pdf = tiled.toPandas()
    spark.stop()
    return [(t, g.drop(columns=["tile"]))
            for t, g in pdf.groupby("tile")]


def _work(args):
    t, pdf = args
    kern = PL.make_tile_kernel(P.TILE_SIZE_M)
    return len(kern((t,), pdf, pd.DataFrame()))


def _run(tiles, n: int) -> float:
    with mp.Pool(n) as pool:
        pool.map(_work, tiles[:4 * n])           # warm imports
        t0 = time.time()
        pool.map(_work, tiles, chunksize=1)
        return time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tiles = _load_tiles(sf_dir)
    walls = {}
    for procs in (n, 4 * n):
        best = min(_run(tiles, procs) for _ in range(2))
        walls[procs] = round(best, 2)
        print(f"mp n={procs}: {walls[procs]}s", file=sys.stderr)
    eff = round((walls[n] / walls[4 * n]) / 4, 3)
    out = {"sf_dir": sf_dir, "n_low": n, "n_high": 4 * n,
           "n_tiles": len(tiles), "walls": walls, "efficiency": eff}
    bench = REPO / "BENCH"
    bench.mkdir(exist_ok=True)
    (bench / "MP_CONTROL.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
