"""End-to-end training-corpus curation as one declarative plan.

Composes the individually-gated operators into the standard web-text
curation chain (the RefinedWeb/CCNet shape):

    quality score -> language filter -> exact dedup ->
    near-dup cluster dedup (MinHash pairs -> connected components,
    keeper = highest quality) -> token-window chunking

Every stage is a DataFrame transformation on the same lazy plan — no
driver materialization between stages; Catalyst prunes the text column
into exactly the stages that read it.  Shuffle inventory for the whole
chain (the 100 TB question):

1. exact dedup — one groupBy on ``xxhash64(text)`` (8-byte key);
2. MinHash pairs — the band equi-join inside ``minhash_lsh_pairs``
   (hot-bucket capped);
3. connected components — O(log^2 n) node-keyed rounds over the PAIR
   set only (pairs << docs);
4. keeper election — one window over ``cluster_id``;
5. chunking — zero shuffles (narrow explode).

Filters run FIRST so every downstream shuffle moves only surviving
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.operators import graph as GR
from osm_sidewalkreator_spark.operators import textops as TX


def curate_corpus(docs: DataFrame, *, min_quality: float = 0.0,
                  langs: tuple[str, ...] | None = None,
                  jaccard: float = 0.5, chunk_tokens: int = 128,
                  overlap: int = 16) -> DataFrame:
    """Curated, deduplicated, chunked corpus ready for tokenization.

    Returns one row per chunk: (doc_id, lang, quality, cluster_id,
    cluster_size, chunk_idx, n_chunks, n_chunk_tokens, chunk_text).

    ``min_quality`` drops docs below the ``quality_score`` heuristic;
    ``langs`` (e.g. ``("en", "pt")``) keeps only those predicted
    languages (None keeps all); near-dup clusters keep their
    highest-quality member (ties -> lowest doc_id).
    """
    q = TX.quality_score(docs).select("doc_id", "quality")
    lg = TX.lang_id(docs).select("doc_id", "lang_pred")
    d = (docs.join(q, "doc_id").join(lg, "doc_id")
         .filter(F.col("quality") >= F.lit(min_quality)))
    if langs is not None:
        d = d.filter(F.col("lang_pred").isin(*langs))

    # exact dedup: keep the lowest doc_id per identical text
    d = (d.withColumn("_h", F.xxhash64("text"))
         .withColumn("_keep", F.min("doc_id").over(Window.partitionBy("_h")))
         .filter(F.col("doc_id") == F.col("_keep"))
         .drop("_h", "_keep"))

    # near-dup cluster dedup over the survivors
    pairs = TX.minhash_lsh_pairs(d, jaccard).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    labeled = GR.dedup_clusters(
        d.select("doc_id", "text", "lang_pred", "quality"),
        pairs, prefer="quality")
    kept = labeled.filter("is_keeper")

    chunks = TX.chunk_documents(
        kept.select("doc_id", "text"),
        chunk_tokens=chunk_tokens, overlap=overlap)
    return (chunks.join(
        kept.select("doc_id", F.col("lang_pred").alias("lang"),
                    "quality", "cluster_id", "cluster_size"),
        "doc_id")
        .select("doc_id", "lang", "quality", "cluster_id", "cluster_size",
                "chunk_idx", "n_chunks", "n_chunk_tokens", "chunk_text"))
