"""Streaming corpus curation: the chain's narrow prefix on a live
ingest, with stateful near-dup suppression.

The batch chain (``plans/curate.py``) needs the whole corpus for its
MinHash/connected-components stage; a continuous ingest pipeline
instead applies every ROW-PURE stage the moment a document arrives —
normalize, PII scrub, quality/langid scoring, threshold + language
filters, deterministic weighted sampling (all narrow column algebra,
legal before a stateful operator) — and replaces the corpus-wide
near-dup resolution with the streaming SimHash suppression
(``streaming/neardup.py``): drop a doc on arrival iff a near-enough
doc was ALREADY admitted in its fingerprint bucket.

Composition order matters and is pinned by tests: filters run BEFORE
fingerprinting, so rejected documents never enter suppression state —
a quality-failing copy of a paragraph must not suppress a later
quality-passing one.

Output metadata (quality, lang) rides a STREAM-STATIC join against
the same files: stateless, no extra streaming state, and exactly the
pattern a production job uses against its bronze table. Everything
downstream of admission (chunking, packing, sharding) is narrow and
can be chained onto the sink batch-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from osm_sidewalkreator_spark.operators import sampling as SA
from osm_sidewalkreator_spark.operators import textops as TX
from osm_sidewalkreator_spark.streaming.neardup import (
    _OUT_SCHEMA, _STATE_SCHEMA, _neardup_fn)


def _narrow_prefix(df: DataFrame, *, normalize: bool, scrub_pii: bool,
                   min_quality: float, langs: tuple[str, ...] | None,
                   sample_fractions: dict[str, float] | None,
                   default_fraction: float) -> DataFrame:
    """The row-pure curation stages — shared verbatim between the
    stream side and the batch/static side so the two cannot diverge."""
    if normalize:
        df = df.withColumn("text", TX.normalize_text_expr())
    if scrub_pii:
        df = df.withColumn("text", TX.pii_scrub_expr())
    df = (df.withColumn("quality", TX.quality_expr())
          .withColumn("lang_pred", TX.langid_expr())
          .filter(F.col("quality") >= F.lit(min_quality)))
    if langs is not None:
        df = df.filter(F.col("lang_pred").isin(*langs))
    if sample_fractions is not None:
        df = SA.weighted_sample(df, sample_fractions,
                                group_col="lang_pred",
                                default_fraction=default_fraction)
    return df


def stream_curate_docs(spark: SparkSession, docs_dir: str, *,
                       normalize: bool = True, scrub_pii: bool = False,
                       min_quality: float = 0.0,
                       langs: tuple[str, ...] | None = None,
                       sample_fractions: dict[str, float] | None = None,
                       default_fraction: float = 0.0,
                       bucket_bits: int = 16,
                       watermark: str = "10 minutes",
                       query_name: str = "docs_curate_stream"
                       ) -> DataFrame:
    """Curate a document stream; returns the admitted rows
    (doc_id, ts, simhash, bucket, text, quality, lang_pred) from a
    memory sink run with availableNow (the test/bounded form; swap the
    sink + trigger for continuous production).

    ``docs_dir`` parquet files need (doc_id, text, ts).
    """
    schema = spark.read.parquet(docs_dir).schema
    src = (spark.readStream.schema(schema).parquet(docs_dir)
           .withColumn("ts", F.to_timestamp("ts")))
    kw = dict(normalize=normalize, scrub_pii=scrub_pii,
              min_quality=min_quality, langs=langs,
              sample_fractions=sample_fractions,
              default_fraction=default_fraction)
    curated = _narrow_prefix(src, **kw)
    fp = (curated.withWatermark("ts", watermark)
          .withColumn("simhash", TX.simhash_expr())
          .withColumn("bucket",
                      F.shiftrightunsigned("simhash", 64 - bucket_bits))
          .select("doc_id", "ts", "simhash", "bucket"))
    admitted = fp.groupBy("bucket").applyInPandasWithState(
        _neardup_fn, _OUT_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout)
    # stream-static metadata join: recompute the SAME narrow prefix on
    # the static files (one shared builder above), join on doc_id —
    # stateless, so it adds no streaming state
    static = _narrow_prefix(spark.read.parquet(docs_dir), **kw) \
        .select("doc_id", "text", "quality", "lang_pred")
    out = admitted.join(static, "doc_id")
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(query_name)
