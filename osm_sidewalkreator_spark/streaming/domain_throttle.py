"""Streaming per-domain admission cap (the ingest-side counterpart of
``operators/domains.cap_per_domain``).

A continuous crawl ingest can't window-rank a domain's documents the
way the batch cap does — rows arrive one micro-batch at a time. This
operator admits the first ``max_docs`` documents of each domain (in
event-time order within each micro-batch, counter carried across
batches in keyed state) and drops the rest: SEO floods and mega-hosts
are throttled at ingest, before they cost storage or downstream
curation work.

Shape: the domain key is a NARROW column expression
(``operators/domains.domain_expr``) so it legally precedes the
stateful operator; state per domain is ONE long (the admitted count)
— the cheapest possible keyed state, partitioned across executors by
domain hash. The event-time TTL (same batch-max anchoring as
``streaming/neardup.py``) resets a domain's budget after ``_TTL_MS``
of inactivity, making this a rolling budget rather than a forever
cap; the '' pseudo-domain (unparseable/null urls) is admitted
unconditionally and never counted — many unrelated documents sharing
a parse failure are not one domain (the batch caps' exemption
contract, kept bit-identical here).

Semantics note (documented, not hidden): "first N" is deterministic
per micro-batch composition — rows are ordered (ts, doc_id) inside a
batch, and the cross-batch counter makes the admitted SET independent
of how the stream is chopped into micro-batches whenever event time
respects arrival order (the replay parity test runs the same input
through one- and two-file stagings).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from osm_sidewalkreator_spark.operators.domains import domain_expr

_OUT_SCHEMA = "doc_id long, ts timestamp, url string, domain string"
_STATE_SCHEMA = "admitted long"
_TTL_MS = 7 * 24 * 3600 * 1000
_OUT_COLS = ["doc_id", "ts", "url", "domain"]


def _make_throttle_fn(max_docs: int):
    def _throttle(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values(["ts", "doc_id"])
        if key[0] == "":
            # unparseable/null urls: admitted unconditionally, never
            # counted (batch-cap exemption contract)
            yield batch[_OUT_COLS]
            return
        prior = state.get[0] if state.exists else 0
        room = max(0, max_docs - prior)
        admitted = batch.iloc[:room]
        state.update((prior + len(admitted),))
        batch_max_ms = int(pd.Timestamp(batch["ts"].max()).value
                           // 10**6)
        state.setTimeoutTimestamp(
            max(batch_max_ms, state.getCurrentWatermarkMs()) + _TTL_MS)
        if len(admitted):
            yield admitted[_OUT_COLS]
    return _throttle


def stream_domain_throttle(spark: SparkSession, pages_dir: str,
                           max_docs: int,
                           query_name: str = "domain_throttle_stream",
                           watermark: str = "10 minutes") -> DataFrame:
    """Admit at most ``max_docs`` docs per domain from a page stream.

    ``pages_dir`` parquet files need (doc_id, url, ts). Returns the
    admitted rows (memory sink, availableNow) with the domain for
    audit.
    """
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1: {max_docs}")
    schema = spark.read.parquet(pages_dir).schema
    src = (spark.readStream.schema(schema).parquet(pages_dir)
           .withColumn("ts", F.to_timestamp("ts"))
           .withWatermark("ts", watermark)
           .withColumn("domain", domain_expr("url"))
           .select("doc_id", "ts", "url", "domain"))
    out = (src.groupBy("domain")
           .applyInPandasWithState(
               _make_throttle_fn(max_docs), _OUT_SCHEMA, _STATE_SCHEMA,
               "append", GroupStateTimeout.EventTimeTimeout))
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(query_name)


def stage_pages_stream(sf_dir: str, n_files: int = 2,
                       docs_per_domain_hint: int = 50) -> str:
    """Stage the documents table as a deterministic page stream:
    synthesized urls (a few hosts, so the cap binds), event time from
    doc_id, split into ``n_files`` so availableNow exercises the
    cross-batch counter."""
    import duckdb

    stage = Path(tempfile.gettempdir()) \
        / "sidewalkreator_domain_throttle" / Path(sf_dir).name
    if stage.exists():
        shutil.rmtree(stage)
    stage.mkdir(parents=True)
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    per_file = (n + n_files - 1) // n_files
    for i in range(n_files):
        con.execute(f"""
            COPY (
              SELECT doc_id,
                     CASE WHEN doc_id % 11 = 7
                          THEN 'not a url ' || doc_id
                          ELSE 'https://host' || (doc_id % 6)
                               || '.example/p/' || doc_id END AS url,
                     TIMESTAMP '2026-01-01 00:00:00'
                       + INTERVAL (doc_id) SECOND AS ts
              FROM '{sf_dir}/documents.parquet'
              WHERE doc_id >= {i * per_file}
                AND doc_id < {(i + 1) * per_file}
              ORDER BY doc_id
            ) TO '{stage}/part{i}.parquet' (FORMAT PARQUET)
        """)
    con.close()
    return str(stage)
