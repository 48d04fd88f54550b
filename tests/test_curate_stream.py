"""Streaming curation template vs a Python replay of its semantics."""

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators import textops as TX
from osm_sidewalkreator_spark.session import get_spark
from osm_sidewalkreator_spark.streaming.curate_stream import (
    _narrow_prefix, stream_curate_docs)
from osm_sidewalkreator_spark.streaming.neardup import MAX_HAMMING

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark(shuffle_partitions=8)


@pytest.fixture(scope="module")
def stage(spark):
    """Documents with deterministic event times + a replayed slice of
    QUALITY-PASSING docs under new ids (must be suppressed) and one
    quality-FAILING near-dup carrier (must not poison state)."""
    import pandas as pd
    out = Path(tempfile.gettempdir()) / "sidewalkreator_curate_stream"
    if out.exists():
        import shutil
        shutil.rmtree(out)
    out.mkdir(parents=True)
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())
    base = int(docs.doc_id.max()) + 1
    t0 = pd.Timestamp("2026-01-01", tz="UTC")
    docs["ts"] = (t0 + pd.to_timedelta(docs.doc_id, unit="s")) \
        .astype("datetime64[ms, UTC]")
    docs.to_parquet(out / "part0.parquet", index=False)
    rep = docs.head(100).copy()
    rep["doc_id"] = rep.doc_id + base
    rep["ts"] = (t0 + pd.Timedelta(hours=1)
                 + pd.to_timedelta(rep.doc_id, unit="s")) \
        .astype("datetime64[ms, UTC]")
    rep.to_parquet(out / "part1.parquet", index=False)
    return str(out)


def test_stream_matches_python_replay(spark, stage):
    got = stream_curate_docs(
        spark, stage, min_quality=0.5, langs=("en", "pt"),
        query_name="curate_stream_t1")
    admitted = {r["doc_id"] for r in got.collect()}

    # replay: same narrow prefix batch-side, then first-wins
    # suppression in (ts, doc_id) order per bucket
    pre = (_narrow_prefix(
        spark.read.parquet(stage), normalize=True, scrub_pii=False,
        min_quality=0.5, langs=("en", "pt"), sample_fractions=None,
        default_fraction=0.0)
        .withColumn("simhash", TX.simhash_expr())
        .withColumn("bucket", F.shiftrightunsigned("simhash", 48))
        .select("doc_id", "ts", "simhash", "bucket")
        .orderBy("ts", "doc_id").collect())
    kept: dict = {}
    want = set()
    for r in pre:
        fps = kept.setdefault(r["bucket"], [])
        if any(((r["simhash"] ^ k) & (2**64 - 1)).bit_count()
               <= MAX_HAMMING for k in fps):
            continue
        fps.append(r["simhash"])
        want.add(r["doc_id"])
    assert admitted == want and len(admitted) > 0


def test_filters_precede_suppression_and_metadata_is_exact(spark, stage):
    got = stream_curate_docs(
        spark, stage, min_quality=0.5, langs=("en", "pt"),
        query_name="curate_stream_t2").collect()
    # every admitted row satisfies the filters, with metadata matching
    # an independent batch recompute
    q = {r["doc_id"]: (r["quality"], r["lang_pred"]) for r in
         _narrow_prefix(spark.read.parquet(stage), normalize=True,
                        scrub_pii=False, min_quality=0.0, langs=None,
                        sample_fractions=None, default_fraction=0.0)
         .select("doc_id", "quality", "lang_pred").collect()}
    for r in got:
        assert r["quality"] >= 0.5 and r["lang_pred"] in ("en", "pt")
        assert (r["quality"], r["lang_pred"]) == q[r["doc_id"]]
    # replays of ADMITTED docs are suppressed: no replayed id whose
    # base doc was admitted may appear
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    ids = {r["doc_id"] for r in got}
    assert not {i for i in ids if i >= n and (i - n) in ids}
