"""Structured Streaming over the events table.

The reference has no streaming operators (SURVEY.md §2.9); this is the
engine's forward-looking stream path: file-source readStream ->
watermarked tumbling-window aggregation -> sink. ``availableNow`` runs
the same query as an incremental batch, which is how the correctness
gate can compare it against a plain SQL oracle (a tumbling window over
bounded input is exactly GROUP BY date_trunc).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def minutely_event_counts_stream(spark: SparkSession, events_dir: str,
                                 query_name: str = "events_stream_agg",
                                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming tumbling-window count/sum per event_type.

    ``events_dir`` must be a directory of parquet files. Runs with
    Trigger.AvailableNow to completion and returns the materialized
    result (memory sink).
    """
    schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    # parquet NTZ timestamps need a tz-aware event-time column
    src = src.withColumn("ts", F.to_timestamp("ts"))
    agg = (src.withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
           .agg(F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("value_milli")))
    q = (agg.writeStream.format("memory").queryName(query_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    out = spark.table(query_name).select(
        "event_type",
        F.unix_timestamp(F.col("w.start")).alias("minute_epoch"),
        "n", "value_milli")
    return out


def run_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the single-file events table into a stream-source directory
    and run the windowed aggregation."""
    stage = Path(tempfile.gettempdir()) / "sidewalkreator_stream" \
        / Path(sf_dir).name
    stage.mkdir(parents=True, exist_ok=True)
    dst = stage / "events.parquet"
    if not dst.exists():
        shutil.copy(f"{sf_dir}/events.parquet", dst)
    name = f"events_stream_{Path(sf_dir).name.replace('.', '_')}"
    return minutely_event_counts_stream(spark, str(stage), name)
