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


def _steal():
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:]]
    return v[7], sum(v)


def main():
    from osm_sidewalkreator_spark import hostcond

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    tiles = _load_tiles(sf_dir)
    fault_pre = hostcond.stream_probe(1, mb=64, dur=1.0,
                                      alloc_deadline=5.0)
    walls, steals = {}, {}
    for procs in (n, 4 * n):
        s0, t0 = _steal()
        best = min(_run(tiles, procs) for _ in range(2))
        s1, t1 = _steal()
        walls[procs] = round(best, 2)
        steals[procs] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
        print(f"mp n={procs}: {walls[procs]}s steal {steals[procs]}%",
              file=sys.stderr)
    fault_post = hostcond.stream_probe(1, mb=64, dur=1.0,
                                       alloc_deadline=5.0)
    eff = round((walls[n] / walls[4 * n]) / 4, 3)
    sample = {
        "ts_utc": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "walls": walls, "efficiency": eff, "steal_pct": steals,
        "fault_pre": fault_pre, "fault_post": fault_post,
    }
    bench = REPO / "BENCH"
    bench.mkdir(exist_ok=True)
    path = bench / "MP_CONTROL.json"
    prev = json.loads(path.read_text()) if path.exists() else {}
    samples = prev.get("samples", [])
    if not samples and "walls" in prev:
        # migrate the pre-stamping single-sample format
        samples.append({"ts_utc": "pre-stamping",
                        "walls": prev["walls"],
                        "efficiency": prev["efficiency"]})
    samples.append(sample)
    # this control measures a CEILING (what the host can deliver to
    # the warmed kernel), so the headline is the best sample — but
    # only among steal-clean ones: steal slows whichever leg it lands
    # on, so a contaminated sample's ratio is noise in EITHER
    # direction (a steal-slowed narrow leg fakes high efficiency).
    # Legacy samples predate the stamps and were recorded under the
    # steal-gated runner, so they stay eligible. Every sample stays
    # listed with its own conditions.
    def _clean(s):
        sp = s.get("steal_pct")
        return sp is None or max(sp.values()) < 2.5

    eligible = [s for s in samples if _clean(s)] or samples
    best_s = max(eligible, key=lambda s: s["efficiency"])
    out = {"sf_dir": sf_dir, "n_low": n, "n_high": 4 * n,
           "n_tiles": len(tiles),
           "walls": best_s["walls"], "efficiency": best_s["efficiency"],
           "best_ts": best_s.get("ts_utc"), "samples": samples}
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
