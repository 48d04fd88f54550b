"""Deterministic partition-load evidence for the tile kernel.

Computes, for the sf-dir's tile census, the per-partition kernel load
under (a) plain hash placement and (b) the LPT bucket placement that
``generate_features`` uses. Pure function of the input data and
Spark's hash — immune to the sandbox VM's bursty steal, unlike
wall-clock. Writes BENCH/BALANCE.json; scaling_run.py folds it into
BENCH/BASELINE.md. Usage: python scripts/balance_stats.py [sf_dir] [n]
"""

from __future__ import annotations

import collections
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from osm_sidewalkreator_spark import params as P  # noqa: E402
from osm_sidewalkreator_spark.operators.tiling import cover_cells  # noqa: E402
from osm_sidewalkreator_spark.plans import pipeline as PL  # noqa: E402
from osm_sidewalkreator_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_part = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spark = get_spark(app="balance_stats", shuffle_partitions=16)
    segs = PL.street_segments_tm(PL.assign_widths(
        PL.clip_to_aoi(PL.load_streets(spark, sf_dir), spark, sf_dir)))
    tiled = segs.withColumn("tile", F.explode(cover_cells(
        F.least("ax", "bx"), F.least("ay", "by"),
        F.greatest("ax", "bx"), F.greatest("ay", "by"),
        P.TILE_SIZE_M, pad=P.TILE_HALO_M)))
    costs = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).alias("n"),
        F.pmod(F.hash(F.col("tile")), F.lit(n_part)).alias("p")).collect()
    hash_load: collections.Counter = collections.Counter()
    for r in costs:
        hash_load[r.p] += r.n + 20
    cost_by_tile = {r.tile: r.n for r in costs}
    lpt_load: collections.Counter = collections.Counter()
    for t, b in PL._lpt_bucket_map(spark, tiled, n_part):
        lpt_load[b] += cost_by_tile[t] + 20

    def stats(c):
        loads = sorted((c.get(k, 0) for k in c), reverse=True)
        loads += [0] * (n_part - len(loads))
        mean = sum(loads) / n_part
        return {"partitions_used": sum(1 for v in loads if v),
                "max": loads[0], "mean": round(mean, 1),
                "max_over_mean": round(loads[0] / mean, 3)}

    out = {"sf_dir": sf_dir, "n_part": n_part, "n_tiles": len(costs),
           "hash_placement": stats(hash_load),
           "lpt_placement": stats(lpt_load)}
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BALANCE.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
