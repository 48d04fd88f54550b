"""Per-tile checkpoint manifest: lineage, metrics, resume.

North-rule requirement: the job "checkpoints per-partition with lineage
+ metrics so it resumes mid-tile". Design (executor-side commit):

- Each tile's output parquet is written BY THE TASK that computed it
  (inside the cogrouped kernel), to ``tiles/tile_<id>.parquet`` via
  write-to-tmp + atomic rename — idempotent under retries and
  speculative duplicates (same tile -> same path, same content).
- The task then drops a commit marker ``markers/<id>.json`` (tile id,
  input fingerprint, per-kind counts, seconds, path), also via rename.
  A crash between parquet and marker re-does exactly one tile.
- The driver never materializes feature rows: it only compacts marker
  files into ``manifest.jsonl`` (idempotent, runs at start and end so a
  crashed run's markers are recovered) and reads the committed paths.
- Resume = anti-join the per-tile input fingerprints against the
  manifest: only missing or changed tiles recompute. Fingerprints are
  an order-independent ``bit_xor(xxhash64(...))`` aggregate — one
  shuffle of 8-byte values, no ``collect_list`` of row payloads.
- Tiles whose kernel emits zero rows still commit a marker (counts={}),
  so they are not recomputed forever.

On this single-node sandbox the tile store is the local FS; on a real
cluster the same protocol targets a task-writable shared store (object
store / DFS) — the rename-commit seam is the only thing to swap.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TileManifest:
    def __init__(self, job_dir: str):
        self.dir = Path(job_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "tiles").mkdir(exist_ok=True)
        (self.dir / "markers").mkdir(exist_ok=True)
        self.manifest_path = self.dir / "manifest.jsonl"

    def committed(self) -> dict[int, dict]:
        out = {}
        if self.manifest_path.exists():
            for line in self.manifest_path.read_text().splitlines():
                if line.strip():
                    row = json.loads(line)
                    out[row["tile"]] = row
        return out

    def compact_markers(self) -> int:
        """Fold executor-written commit markers into manifest.jsonl
        (idempotent: newest marker for a tile wins; markers removed)."""
        done = self.committed()
        moved = 0
        for mpath in sorted((self.dir / "markers").glob("*.json")):
            try:
                row = json.loads(mpath.read_text())
            except (json.JSONDecodeError, OSError):
                continue  # half-written stray; rename protocol makes
                # this unreachable for completed commits
            done[row["tile"]] = row
            mpath.unlink()
            moved += 1
        if moved:
            tmp = self.manifest_path.with_suffix(".tmp")
            with open(tmp, "w") as f:
                for row in done.values():
                    f.write(json.dumps(row) + "\n")
            os.replace(tmp, self.manifest_path)
        return moved


def _atomic_write_parquet(pdf: pd.DataFrame, path: Path, arrow_schema):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex}.tmp")
    # explicit schema: pandas infers float64/object for nullable int
    # columns, which would not round-trip through the Spark read schema
    table = pa.Table.from_pandas(pdf, schema=arrow_schema,
                                 preserve_index=False)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _atomic_write_json(obj: dict, path: Path):
    tmp = path.with_name(f".{path.name}.{uuid.uuid4().hex}.tmp")
    tmp.write_text(json.dumps(obj))
    os.replace(tmp, path)


_SUMMARY_SCHEMA = "tile long, n_rows long, seconds double"


def run_tiled_job(spark: SparkSession, segs_tiled: DataFrame,
                  kernel, schema, job_dir: str,
                  ctx_tiled: DataFrame | None = None,
                  n_part: int | None = None) -> DataFrame:
    """Resumable tiled execution with executor-side tile commit.

    ``segs_tiled`` must carry a ``tile`` column (plus osm_id/ax/ay/bx/by
    for the lineage fingerprint). ``kernel(key, pdf, ctx_pdf)`` is the
    cogrouped tile kernel (``ctx_pdf`` empty when ``ctx_tiled`` is None).
    Returns the union of all committed tile outputs.
    """
    man = TileManifest(job_dir)
    man.compact_markers()  # recover a crashed run's commits

    fp_df = segs_tiled.groupBy("tile").agg(
        F.expr("bit_xor(xxhash64(osm_id, ax, ay, bx, by))").alias("fp"))
    # The census is consumed twice (pending anti-join + the current
    # tile work-list below); persist so the upstream scan runs once.
    fp_df = fp_df.persist()
    # Current work-list: a tile whose last segment DISAPPEARED from the
    # input must not resurrect its stale committed output — the
    # fingerprint anti-join only catches changed tiles, not deleted
    # ones. Driver-side set is fine: the manifest itself is a
    # driver-side JSONL of the same cardinality (tile census, bounded).
    cur_tiles = {r["tile"] for r in fp_df.select("tile").collect()}
    done = man.committed()
    if done:
        man_df = spark.createDataFrame(
            [(r["tile"], r["input_fingerprint"]) for r in done.values()],
            "tile long, fp long")
        pend_df = fp_df.join(man_df, ["tile", "fp"], "left_anti")
    else:
        pend_df = fp_df

    tiles_dir = Path(job_dir) / "tiles"
    markers_dir = Path(job_dir) / "markers"
    out_cols = [f.name for f in schema.fields]
    from pyspark.sql.pandas.types import to_arrow_schema
    arrow_schema = to_arrow_schema(schema)

    def committing_kernel(key, pdf: pd.DataFrame, ctx: pd.DataFrame
                          ) -> pd.DataFrame:
        tile = int(key[0])
        t0 = time.time()
        if len(pdf) == 0:
            return pd.DataFrame(columns=["tile", "n_rows", "seconds"])
        fp = int(pdf["fp"].iloc[0])
        out = kernel(key, pdf.drop(columns=["fp"]), ctx)
        path = tiles_dir / f"tile_{tile}.parquet"
        counts: dict[str, int] = {}
        if len(out):
            _atomic_write_parquet(out, path, arrow_schema)
            if "kind" in out.columns:
                counts = {k: int(v) for k, v in
                          out.groupby("kind").size().items()}
        dt = time.time() - t0
        _atomic_write_json(
            {"tile": tile, "input_fingerprint": fp, "counts": counts,
             "seconds": round(dt, 3),
             "path": str(path) if len(out) else None,
             "committed_at": time.time()},
            markers_dir / f"{tile}.json")
        return pd.DataFrame([(tile, len(out), dt)],
                            columns=["tile", "n_rows", "seconds"])

    sub = segs_tiled.join(F.broadcast(pend_df), "tile")
    if n_part is None:
        n_part = int(os.environ.get("SPARK_GRAFT_NPART", "0")) \
            or max(spark.sparkContext.defaultParallelism * 4, 32)
    sub = sub.repartition(n_part, "tile")
    if ctx_tiled is not None:
        summary = (sub.groupBy("tile")
                   .cogroup(ctx_tiled.repartition(n_part, "tile")
                            .groupBy("tile"))
                   .applyInPandas(committing_kernel, _SUMMARY_SCHEMA))
    else:
        empty_ctx = pd.DataFrame(columns=["ckind", "ax", "ay", "bx", "by"])
        summary = sub.groupBy("tile").applyInPandas(
            lambda key, pdf: committing_kernel(key, pdf, empty_ctx),
            _SUMMARY_SCHEMA)
    summary.count()  # force execution; rows live executor-side only
    fp_df.unpersist()
    man.compact_markers()

    done = man.committed()
    paths = [r["path"] for t, r in done.items()
             if t in cur_tiles
             and r.get("path") and Path(r["path"]).exists()]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths).select(*out_cols)
