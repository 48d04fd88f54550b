"""Streaming per-domain admission cap vs a python replay oracle, and
micro-batch-composition independence (1-file vs 2-file staging)."""

import duckdb
import pandas as pd
import pytest

from osm_sidewalkreator_spark.session import get_spark
from osm_sidewalkreator_spark.streaming import domain_throttle as DT

SF = "/root/testdata/sf0.001"
CAP = 30


@pytest.fixture(scope="module")
def spark():
    return get_spark(shuffle_partitions=8)


def _oracle(stage: str) -> pd.DataFrame:
    """Replay: first CAP docs per domain in (ts, doc_id) order;
    the '' junk pseudo-domain admitted unconditionally."""
    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT * FROM '{stage}/part*.parquet' ORDER BY ts, doc_id"
    ).df()
    con.close()
    import re
    doms = []
    for u in pdf.url:
        m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?"
                     r"([^/:?#]+)", u)
        d = m.group(1).lower() if m else ""
        doms.append(d[4:] if d.startswith("www.") else d)
    pdf["domain"] = doms
    keep = []
    seen: dict[str, int] = {}
    for _, r in pdf.iterrows():
        if r.domain == "":
            keep.append(True)
            continue
        c = seen.get(r.domain, 0)
        keep.append(c < CAP)
        seen[r.domain] = c + 1
    return pdf[pd.Series(keep, index=pdf.index)]


def test_throttle_matches_replay_oracle_and_batching_invariant(spark):
    got = {}
    for n_files in (1, 2):
        stage = DT.stage_pages_stream(SF, n_files=n_files)
        out = DT.stream_domain_throttle(
            spark, stage, CAP,
            query_name=f"thr_{n_files}").toPandas()
        want = _oracle(stage)
        assert sorted(out.doc_id) == sorted(want.doc_id), n_files
        got[n_files] = sorted(out.doc_id)
        # cap respected per real domain; '' passes through whole
        per = out.groupby("domain").size()
        for dom, n in per.items():
            if dom == "":
                assert n == (want.domain == "").sum()
            else:
                assert n <= CAP
    # the admitted SET is independent of micro-batch composition
    assert got[1] == got[2]


def test_throttle_rejects_bad_cap(spark):
    with pytest.raises(ValueError):
        DT.stream_domain_throttle(spark, "/tmp/nowhere", 0)
