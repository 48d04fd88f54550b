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


def sessionize_events(spark: SparkSession, sf_dir: str,
                      gap: str = "12 hours",
                      streaming: bool = False) -> DataFrame:
    """Per-user session windows (``F.session_window`` — Spark's native
    merging session windows, the engine's stateful-aggregation path for
    SURVEY.md §2.9).

    A session groups a user's events whose inter-event gap is < ``gap``;
    the window end extends ``gap`` past the last event ([start, end)
    semantics — an event landing exactly on the closing boundary opens
    a NEW session). Works identically as a batch aggregation (the
    oracle gate path) and as a watermarked stream (``streaming=True``
    runs availableNow over the staged file source).

    The streaming path uses ``outputMode("complete")``, which retains
    every session in state for the query's lifetime — correct and
    bounded ONLY for the one-shot availableNow run used here (it is
    what lets the bounded run emit sessions the final watermark has not
    passed, matching the batch result exactly). A continuous production
    stream must instead use ``outputMode("append")``, where the
    watermark evicts closed sessions but sessions newer than the
    watermark are withheld until it passes them.
    """
    if streaming:
        stage = Path(tempfile.gettempdir()) / "sidewalkreator_stream" \
            / Path(sf_dir).name
        stage.mkdir(parents=True, exist_ok=True)
        dst = stage / "events.parquet"
        if not dst.exists():
            shutil.copy(f"{sf_dir}/events.parquet", dst)
        schema = spark.read.parquet(str(stage)).schema
        ev = (spark.readStream.schema(schema).parquet(str(stage))
              .withColumn("ts", F.to_timestamp("ts")))
        ev = ev.withWatermark("ts", "10 minutes")
    else:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
            .withColumn("ts", F.to_timestamp("ts"))
    agg = (ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
           .agg(F.count("*").alias("n_events"),
                F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("value_milli")))
    out_cols = ["user_id",
                F.unix_timestamp(F.col("w.start")).alias("start_s"),
                F.unix_timestamp(F.col("w.end")).alias("end_s"),
                "n_events", "value_milli"]
    if not streaming:
        return agg.select(*out_cols)
    name = f"events_sessions_{Path(sf_dir).name.replace('.', '_')}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(name).select(*out_cols)
