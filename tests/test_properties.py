"""Property-based checks (hypothesis) for the round-4 text/vector ops.

One Spark job per example is expensive, so examples are small and
capped; the properties target the windowing arithmetic and the
quantizer's contract — the parts most likely to break on shapes the
parquet fixtures never produce (1-token docs, window == doc length,
all-zero vectors, single-element vectors).
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from osm_sidewalkreator_spark.operators.simsearch import quantize_embeddings
from osm_sidewalkreator_spark.operators.textops import chunk_documents
from osm_sidewalkreator_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(shuffle_partitions=4)


def _chunks_reference(tokens: list[str], chunk: int, overlap: int):
    stride = chunk - overlap
    n = max(len(tokens), 1)
    # a window is emitted only while it adds tokens beyond the
    # previous window's overlap region (start < n - overlap), with at
    # least one window per doc — matches the operator's final-window
    # containment rule
    last = max(n - overlap - 1, 0) // stride
    out = []
    for idx in range(last + 1):
        piece = tokens[idx * stride:idx * stride + chunk]
        out.append((idx, len(piece), " ".join(piece)))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_chunker_matches_python_reference(spark, data):
    chunk = data.draw(st.integers(2, 12), label="chunk")
    overlap = data.draw(st.integers(0, chunk - 1), label="overlap")
    docs = []
    for i in range(data.draw(st.integers(1, 6), label="n_docs")):
        n_tok = data.draw(st.integers(1, 40), label=f"tok{i}")
        docs.append((i, " ".join(f"w{j % 7}" for j in range(n_tok))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"],
            r["chunk_text"])
           for r in chunk_documents(df, chunk, overlap).collect()}
    want = set()
    for doc_id, text in docs:
        ref = _chunks_reference(text.split(" "), chunk, overlap)
        for idx, ln, body in ref:
            want.add((doc_id, idx, ln, body))
        # coverage strictly extends chunk-over-chunk: no final window
        # fully contained in its predecessor
        ends = [idx * (chunk - overlap) + ln for idx, ln, _ in ref]
        assert all(b > a for a, b in zip(ends, ends[1:]))
        assert ends[-1] == max(len(text.split(" ")), 1)
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=st.lists(
    st.lists(st.floats(-10, 10, allow_nan=False, width=32),
             min_size=1, max_size=8),
    min_size=1, max_size=6))
def test_quantizer_contract(spark, vecs):
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["scale"], r["qvec"])
           for r in quantize_embeddings(df).collect()}
    for i, v in rows:
        scale, q = out[i]
        v32 = [float(np.float32(x)) for x in v]
        amax = max(abs(x) for x in v32)
        assert scale > 0
        if amax == 0:
            assert scale == 1.0 and all(c == 0 for c in q)
            continue
        assert math.isclose(scale, amax / 127.0, rel_tol=1e-12)
        for x, c in zip(v32, q):
            assert -127 <= c <= 127
            assert c == max(-127, min(127, math.floor(x / scale + 0.5)))
            # reconstruction error bound: half a quantization step
            assert abs(x - c * scale) <= scale / 2 + 1e-12
