"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (random-hyperplane signatures from seeded xxhash64 — fully
deterministic, no RNG state) is the scale path. All math is Spark
column algebra over arrays (``aggregate``/``zip_with``): JVM-side,
no Python UDFs.

Embeddings schema (driver testdata): vec_id, embedding list<float>, label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk_bruteforce(emb: DataFrame, k: int = 5,
                           query_mod: int = 50) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Queries = vec_id % query_mod == 0 (deterministic subset). The
    candidate side is broadcast when small; at scale this becomes the
    block-nested-loop baseline you replace with the LSH variant.
    Ties broken by candidate id; similarity rounded to 9 decimals so an
    independent evaluator (the DuckDB oracle) ranks identically.
    """
    e = emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0) \
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    j = q.crossJoin(e).filter(F.col("vec_id") != F.col("query_id"))
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    j = j.withColumn("cosine", F.round(sim, 9))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cosine", "rank"))


def _hyperplane_sign(v, plane_seed: int, dim: int):
    """Deterministic random hyperplane: weight_i = centered xxhash64 of
    (plane_seed, i); sign of <v, w>."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    w = F.transform(idx, lambda i: (
        F.pmod(F.xxhash64(F.lit(plane_seed), i), F.lit(2001)).cast("double")
        - F.lit(1000.0)))
    return (F.aggregate(F.zip_with(v, w, lambda x, y: x * y),
                        F.lit(0.0), lambda a, b: a + b) > 0).cast("int")


def cosine_topk_lsh(emb: DataFrame, k: int = 5, query_mod: int = 50,
                    n_planes: int = 6, n_tables: int = 10,
                    dim: int = 64, max_bucket: int = 4096) -> DataFrame:
    """Multi-table LSH approximate top-k: ``n_tables`` independent
    random-hyperplane signatures of ``n_planes`` bits each -> one
    (table, bucket) equi-join -> candidate-pair dedup -> exact cosine ->
    top-k.

    Scale shape (the round-1 single-table version degenerated to
    ~N^2/2^planes with hot-bucket skew):

    - candidates come from the union of L tables, so recall is
      1-(1-p^b)^L per neighbor instead of p^b — measured >= 0.9 @ k=5
      on the driver embeddings (bench reports ``lsh_recall_at_k``);
    - buckets larger than ``max_bucket`` are dropped per table (a
      dense-cluster guard: the pair blowup of one megabucket is capped
      at max_bucket^2 while its members stay reachable through their
      other L-1 tables);
    - the expensive array math runs once per DISTINCT candidate pair,
      after an id-only dedup, not once per (table, pair).
    """
    e = emb.select("vec_id",
                   F.col("embedding").cast("array<double>").alias("v"))
    buckets = []
    for t in range(n_tables):
        sig = None
        for p in range(n_planes):
            s = _hyperplane_sign(F.col("v"), t * n_planes + p, dim)
            sig = s if sig is None else sig * 2 + s
        buckets.append(sig)
    banded = e.select("vec_id", F.posexplode(F.array(*buckets))
                      .alias("tbl", "bucket"))
    # per-table hot-bucket cap
    sizes = banded.groupBy("tbl", "bucket").agg(F.count("*").alias("bn"))
    banded = (banded.join(F.broadcast(
        sizes.filter(F.col("bn") > max_bucket)), ["tbl", "bucket"],
        "left_anti"))
    qb = banded.join(
        emb.filter(F.pmod(F.col("vec_id"), F.lit(query_mod)) == 0)
        .select(F.col("vec_id").alias("query_id")),
        banded.vec_id == F.col("query_id")).select(
            "query_id", "tbl", "bucket")
    cand = (qb.join(banded, ["tbl", "bucket"])
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "vec_id").distinct())
    qv = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    j = cand.join(qv, "query_id").join(e, "vec_id")
    sim = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    j = j.withColumn("cosine", F.round(sim, 9))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    "cosine", "rank"))


def lsh_recall_at_k(emb: DataFrame, k: int = 5, query_mod: int = 50,
                    **lsh_kwargs) -> float:
    """Measured recall@k of the LSH path vs the brute-force truth."""
    truth = cosine_topk_bruteforce(emb, k=k, query_mod=query_mod) \
        .select("query_id", "neighbor_id")
    approx = cosine_topk_lsh(emb, k=k, query_mod=query_mod, **lsh_kwargs) \
        .select("query_id", "neighbor_id")
    hit = truth.join(approx, ["query_id", "neighbor_id"], "left_semi")
    n_truth = truth.count()
    return (hit.count() / n_truth) if n_truth else 1.0
