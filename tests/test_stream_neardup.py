"""Streaming SimHash near-dup suppression vs a pure-python oracle."""

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators.textops import simhash_expr
from osm_sidewalkreator_spark.session import get_spark
from osm_sidewalkreator_spark.streaming.neardup import (
    MAX_HAMMING, run_stream_neardup)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark(shuffle_partitions=8)


def test_stream_neardup_matches_python_oracle(spark):
    admitted = {r["doc_id"]
                for r in run_stream_neardup(spark, SF).collect()}

    stage = str(Path(tempfile.gettempdir())
                / "sidewalkreator_neardup_stream" / Path(SF).name)
    staged = (spark.read.parquet(stage)
              .withColumn("simhash", simhash_expr())
              .withColumn("bucket", F.shiftrightunsigned("simhash", 48))
              .select("doc_id", "ts", "simhash", "bucket")
              .orderBy("ts", "doc_id").collect())

    kept_by_bucket: dict = {}
    want = set()
    for r in staged:
        fps = kept_by_bucket.setdefault(r["bucket"], [])
        fp = r["simhash"]
        if any(((fp ^ k) & (2**64 - 1)).bit_count() <= MAX_HAMMING
               for k in fps):
            continue
        fps.append(fp)
        want.add(r["doc_id"])

    assert admitted == want
    # replays (re-issued texts under new ids) are always suppressed
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    base = n_docs  # doc_ids are 0..n-1; replays were rebased past max
    assert not any(d >= base for d in admitted)
    # the corpus's own near-dups got suppressed too
    assert len(admitted) < n_docs
