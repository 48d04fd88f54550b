"""Distributed PCA vs the NumPy closed form + projection properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators import embed as EM
from osm_sidewalkreator_spark.session import get_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark(shuffle_partitions=8)


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def x(embs):
    pdf = embs.orderBy("vec_id").toPandas()
    return np.stack(pdf.embedding.to_numpy()).astype(np.float64)


def test_moments_match_numpy(embs, x):
    n, s, g = EM.embedding_moments(embs)
    assert n == len(x)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-12)


def test_fit_matches_numpy_closed_form(embs, x):
    m = EM.fit_pca(embs, k=8)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    np.testing.assert_allclose(
        m.explained_variance, w[order], rtol=1e-9)
    # same axes up to sign; the model's sign rule makes it exact
    ref = v[:, order].T
    flip = np.sign(ref[np.arange(8), np.abs(ref).argmax(axis=1)])
    np.testing.assert_allclose(m.components, ref * flip[:, None],
                               rtol=1e-8, atol=1e-10)


def test_components_orthonormal_and_sorted(embs):
    m = EM.fit_pca(embs, k=16)
    np.testing.assert_allclose(m.components @ m.components.T,
                               np.eye(16), atol=1e-10)
    ev = m.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))


def test_projection_variance_equals_eigenvalues(spark, embs, x):
    k = 4
    m = EM.fit_pca(embs, k=k)
    proj = EM.project(embs, m).select("pca").toPandas()
    p = np.stack(proj.pca.to_numpy())
    np.testing.assert_allclose(p.var(axis=0),
                               m.explained_variance, rtol=1e-9)
    # projections are centered
    np.testing.assert_allclose(p.mean(axis=0), 0.0, atol=1e-9)


def test_full_rank_projection_preserves_distances(embs, x):
    # k = d: the projection is a rotation, pairwise distances survive
    m = EM.fit_pca(embs, k=x.shape[1])
    p = np.stack(EM.project(embs, m).orderBy("vec_id")
                 .select("pca").toPandas().pca.to_numpy())
    a, b = x[:50], p[:50]
    da = np.linalg.norm(a[:, None] - a[None, :], axis=2)
    db = np.linalg.norm(b[:, None] - b[None, :], axis=2)
    np.testing.assert_allclose(da, db, rtol=1e-8, atol=1e-8)


def test_pca_space_preserves_neighbors_low_rank(spark):
    # the ANN pre-reduction use case: when the data HAS low-rank
    # structure (signal in 8 dims + small isotropic noise in 64), a
    # 64 -> 8 PCA keeps the top-5 euclidean neighborhoods. (On
    # isotropic data — like the synth embeddings table — no linear
    # projection can do this; eigenvalue flatness is the advertised
    # diagnostic, asserted below.)
    rng = np.random.default_rng(3)
    z = rng.normal(size=(400, 8))
    w = rng.normal(size=(8, 64))
    x = z @ w + 0.05 * rng.normal(size=(400, 64))
    d = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(len(x))],
        "vec_id long, embedding array<double>")
    m = EM.fit_pca(d, k=8)
    # planted rank shows up: 8th eigenvalue dwarfs the 9th
    m16 = EM.fit_pca(d, k=16)
    assert m16.explained_variance[7] > 50 * m16.explained_variance[8]
    p = np.stack(EM.project(d, m).orderBy("vec_id")
                 .select("pca").toPandas().pca.to_numpy())

    def top5(mat):
        dd = np.linalg.norm(mat[:, None] - mat[None, :], axis=2)
        np.fill_diagonal(dd, np.inf)
        return np.argsort(dd, axis=1)[:, :5]

    full, red = top5(x), top5(p)
    recall = np.mean([len(set(full[i]) & set(red[i])) / 5.0
                      for i in range(len(x))])
    assert recall > 0.9, recall


def test_projection_is_narrow(embs):
    m = EM.fit_pca(embs, k=4)
    plan = (EM.project(embs, m)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_fit_rejects_bad_k(embs, spark):
    with pytest.raises(ValueError):
        EM.fit_pca(embs, k=0)
    with pytest.raises(ValueError):
        EM.fit_pca(embs, k=65)
    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        EM.fit_pca(one, k=1)
