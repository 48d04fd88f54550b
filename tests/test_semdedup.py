"""SemDeDup (k-means-blocked semantic dedup) vs a NumPy oracle that
re-implements the whole keep rule independently: same centroids in,
argmax assignment, within-cell pairwise cosine, union-find grouping,
keep the member farthest from its centroid (ties by min vec_id)."""

import duckdb
import numpy as np
import pytest

from osm_sidewalkreator_spark.operators import simsearch as SS
from osm_sidewalkreator_spark.session import get_spark

SF = "/root/testdata/sf0.001"
THRESH = 0.35  # synth embeddings are isotropic; max pair cos ~0.48


@pytest.fixture(scope="module")
def spark():
    return get_spark(shuffle_partitions=8)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_emb():
    df = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id").df()
    ids = df.vec_id.to_numpy()
    V = np.array(df.embedding.tolist(), dtype=np.float64)
    return ids, V


def _oracle_kept(ids, V, centroids, threshold, max_cell):
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                        1e-300)
    C = np.asarray(centroids, dtype=np.float64)
    sims = Vn @ C.T
    cid = sims.argmax(axis=1)
    cent_sim = np.round(sims.max(axis=1), 9)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in np.unique(cid):
        m = np.flatnonzero(cid == c)
        if len(m) > max_cell:
            continue
        S = np.round(Vn[m] @ Vn[m].T, 9)
        ii, jj = np.triu_indices(len(m), 1)
        for a, b in zip(ii[S[ii, jj] >= threshold],
                        jj[S[ii, jj] >= threshold]):
            ra, rb = find(int(ids[m[a]])), find(int(ids[m[b]]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for i in ids:
        groups.setdefault(find(int(i)), []).append(int(i))
    pos = {int(v): k for k, v in enumerate(ids)}
    kept = set()
    for members in groups.values():
        members.sort(key=lambda v: (cent_sim[pos[v]], v))
        kept.add(members[0])          # farthest from centroid
        # everyone in a singleton group is trivially kept
        if len(members) == 1:
            continue
    # singletons never entered parent-merging; they are their own group
    return kept


def test_semdedup_matches_numpy_oracle(spark, emb, np_emb):
    ids, V = np_emb
    cents = SS.kmeans_fit_spherical(emb, n_centroids=8, iters=2)
    got = sorted(r.vec_id for r in
                 SS.semdedup(emb, threshold=THRESH, centroids=cents)
                 .select("vec_id").collect())
    want = sorted(_oracle_kept(ids, V, cents, THRESH, max_cell=4096))
    assert got == want
    # the dedup actually fired on this input
    assert len(got) < len(ids)
    assert len(got) > 0.7 * len(ids)  # CC chains ~0.2% of pairs into
    # groups, dropping ~17% of this input — most of the corpus stays


def test_semdedup_drop_evidence_and_idempotence(spark, emb, np_emb):
    ids, V = np_emb
    cents = SS.kmeans_fit_spherical(emb, n_centroids=8, iters=2)
    out = SS.semdedup(emb, threshold=THRESH, centroids=cents)
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    dropped = set(int(i) for i in ids) - kept
    assert dropped
    # every dropped vector genuinely had a near-dup: a DIRECT
    # same-cell neighbor at >= THRESH (groups are transitive, so the
    # kept rep may be farther — but the edge that pulled the doc into
    # a group must exist)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    pos = {int(v): k for k, v in enumerate(ids)}
    C = np.asarray(cents)
    cid = (Vn @ C.T).argmax(axis=1)
    for d in dropped:
        sims = np.round(Vn[pos[d]] @ Vn.T, 9)
        assert any(sims[j] >= THRESH and int(ids[j]) != d
                   and cid[j] == cid[pos[d]]
                   for j in np.flatnonzero(sims >= THRESH))
    # idempotence under the same blocking: group representatives of
    # distinct components are < THRESH apart by construction, so a
    # second pass drops nothing
    again = SS.semdedup(out, threshold=THRESH, centroids=cents)
    assert again.count() == out.count()


def test_semdedup_hot_cell_guard_drops_nothing(spark, emb):
    cents = SS.kmeans_fit_spherical(emb, n_centroids=2, iters=1)
    out = SS.semdedup(emb, threshold=THRESH, centroids=cents,
                      max_cell=10)  # every cell is 'hot' -> exempt
    assert out.count() == emb.count()


def test_semdedup_rejects_bad_threshold(spark, emb):
    with pytest.raises(ValueError):
        SS.semdedup(emb, threshold=0.0)
