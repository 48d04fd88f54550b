"""Streaming SimHash near-dup suppression vs a pure-python oracle."""

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators.textops import simhash_expr
from osm_sidewalkreator_spark.session import get_spark
from osm_sidewalkreator_spark.streaming import neardup
from osm_sidewalkreator_spark.streaming.neardup import (
    MAX_HAMMING, MAX_STATE, _neardup_fn, _popcount64, run_stream_neardup)

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


class _FakeState:
    """Minimal GroupState stand-in for unit-testing _neardup_fn."""

    def __init__(self, value=None, watermark_ms=0):
        self._value = value
        self.hasTimedOut = False
        self._watermark_ms = watermark_ms
        self.timeout_set_to = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None

    def getCurrentWatermarkMs(self):
        return self._watermark_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_set_to = ms


def _mkbatch(fps, t0="2026-01-01"):
    n = len(fps)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "ts": pd.date_range(t0, periods=n, freq="s"),
        "simhash": np.asarray(fps, dtype=np.uint64).view(np.int64),
        "bucket": np.zeros(n, dtype=np.int64),
    })


def test_popcount64_matches_python():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    want = np.array([int(x).bit_count() for x in a])
    assert (_popcount64(a) == want).all()


def test_neardup_fn_ttl_anchored_to_batch_event_time():
    """First micro-batch: watermark is 0, so the timeout must come
    from the batch's own event time (+TTL), never epoch+TTL (1970)."""
    st = _FakeState(watermark_ms=0)
    batch = _mkbatch([0, 0xFF])  # hamming 8 apart: both admitted
    out = list(_neardup_fn((0,), [batch], st))
    assert len(out) == 1 and len(out[0]) == 2
    batch_max_ms = int(batch["ts"].max().value // 10**6)
    assert st.timeout_set_to == batch_max_ms + neardup._TTL_MS
    # and when the watermark is AHEAD of the batch, it wins (monotone)
    st2 = _FakeState(watermark_ms=batch_max_ms + 10**9)
    list(_neardup_fn((0,), [_mkbatch([1])], st2))
    assert st2.timeout_set_to == batch_max_ms + 10**9 + neardup._TTL_MS


def test_neardup_fn_state_cap_fifo():
    """A hot bucket's state is capped at MAX_STATE, evicting oldest."""
    rng = np.random.default_rng(11)
    # fingerprints far apart in hamming space (random 64-bit ~32 apart)
    fps = rng.integers(0, 2**64, size=MAX_STATE + 50, dtype=np.uint64)
    st = _FakeState()
    out = list(_neardup_fn((0,), [_mkbatch(fps)], st))
    kept = np.asarray(st.get[0], dtype=np.int64).view(np.uint64)
    assert len(kept) == MAX_STATE
    # FIFO: the newest MAX_STATE admitted fingerprints survive
    admitted = out[0]["simhash"].to_numpy(np.int64).view(np.uint64)
    assert (kept == admitted[-MAX_STATE:]).all()


def test_neardup_fn_vectorized_verify_parity():
    """Admission decisions match the per-row python oracle."""
    rng = np.random.default_rng(13)
    base = rng.integers(0, 2**64, size=200, dtype=np.uint64)
    # inject near-dups: flip <=MAX_HAMMING bits of earlier fps
    mut = []
    for fp in base[:80]:
        v = int(fp)
        for b in rng.integers(0, 64, size=MAX_HAMMING):
            v ^= 1 << int(b)
        mut.append(v)
    fps = np.concatenate([base, np.array(mut, dtype=np.uint64)])
    order = rng.permutation(len(fps))
    fps = fps[order]
    st = _FakeState()
    out = list(_neardup_fn((0,), [_mkbatch(fps)], st))
    got = set(out[0]["doc_id"].tolist()) if out else set()
    # python oracle over the same (ts, doc_id) order = doc_id order
    kept, want = [], set()
    for i, fp in enumerate(fps):
        if any((int(fp) ^ k).bit_count() <= MAX_HAMMING for k in kept):
            continue
        kept.append(int(fp))
        want.add(i)
    assert got == want
