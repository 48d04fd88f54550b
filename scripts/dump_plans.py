"""Dump .explain('formatted') for the bench-timed query plans into
plans/r06/<name>_<tag>.txt (tag = before/after). Usage:
    python scripts/dump_plans.py before [name ...]
"""

import os
import sys
from contextlib import redirect_stdout

# SPARK_GRAFT_PLANS_REPO lets the "before" dump run against a worktree
# checked out at the round-start commit while writing into the main
# tree's plans/r06/.
sys.path.insert(0, os.environ.get("SPARK_GRAFT_PLANS_REPO", "/root/repo"))

from pyspark.sql import functions as F

from osm_sidewalkreator_spark.session import get_spark


def plans(spark, sf_dir):
    from osm_sidewalkreator_spark import params as P
    from osm_sidewalkreator_spark.operators import joins as J
    from osm_sidewalkreator_spark.operators import simsearch as SS
    from osm_sidewalkreator_spark.operators import textops as TX
    from osm_sidewalkreator_spark.operators import graph as GR
    from osm_sidewalkreator_spark.operators import lm as LM
    from osm_sidewalkreator_spark.operators import packing as PK
    from osm_sidewalkreator_spark.operators import sampling as SA
    from osm_sidewalkreator_spark.plans import pipeline as PL
    from osm_sidewalkreator_spark.plans.curate import curate_corpus
    from osm_sidewalkreator_spark.synth import ensure_synth
    synth = ensure_synth(sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages_geo = spark.read.parquet(str(synth / "pages_geo.parquet"))
    blocks = spark.read.parquet(str(synth / "blocks.parquet"))
    segs = spark.read.parquet(str(synth / "sidewalk_segments.parquet"))
    knn_pages = pages_geo.select("url", "x", "y") \
        .filter(F.col("url").endswith("0"))
    pairs = TX.minhash_lsh_pairs(docs, 0.5).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    return {
        "pipeline_features": lambda: PL.generate_features(spark, sf_dir),
        "pip_pages_blocks": lambda: J.pip_join_points_rects(
            pages_geo.select("url", "x", "y"), blocks,
            cell_size=P.CELL_SIZE_M),
        "knn_pages_sidewalks": lambda: J.knn_join_points_segments(
            knn_pages, segs, k=1, max_dist=P.KNN_MAX_DIST,
            cell_size=P.CELL_SIZE_M),
        "exact_dedup_docs": lambda: TX.exact_dedup(docs),
        "minhash_pairs": lambda: TX.minhash_lsh_pairs(docs, 0.5),
        "quality_tokens": lambda: TX.quality_score(docs),
        "cosine_topk": lambda: SS.cosine_topk_bruteforce(emb),
        "cosine_lsh": lambda: SS.cosine_topk_lsh(emb),
        "cosine_topk_int8": lambda: SS.cosine_topk_quantized(emb),
        "dedup_clusters": lambda: GR.dedup_clusters(
            docs.select("doc_id"), pairs),
        "chunk_documents": lambda: TX.chunk_documents(docs),
        "curate_corpus": lambda: curate_corpus(docs, min_quality=0.5),
        "remove_repeated_spans": lambda: TX.remove_repeated_spans(
            docs, span_tokens=8),
        "lm_bigram_nll": lambda: LM.bigram_nll(docs),
        "pack_sequences": lambda: PK.pack_sequences(
            TX.chunk_documents(SA.shard_corpus(docs, 8),
                               extra_cols=("shard",)), 512),
        # the two queries below are built inline in frozen bench.py;
        # their construction is replicated here verbatim so their
        # plans are on record too
        "lineitem_pricing": lambda: (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.count("*"))),
        "dem_kerb_slope": lambda: _dem_kerb_slope(spark, sf_dir, P),
    }


def _dem_kerb_slope(spark, sf_dir, P):
    from osm_sidewalkreator_spark.synth import ensure_synth
    synth = ensure_synth(sf_dir)
    kerbs = spark.read.parquet(str(synth / "kerbs_xy.parquet"))
    dem = spark.read.parquet(str(synth / "dem.parquet"))
    cs = P.DEM_CELL_M
    k = kerbs.withColumn("cx", F.floor(F.col("x") / cs).cast("int")) \
             .withColumn("cy", F.floor(F.col("y") / cs).cast("int"))
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(t).alias("t"))
        for dx, dy, t in ((1, 0, "e_e"), (-1, 0, "e_w"),
                          (0, 1, "e_n"), (0, -1, "e_s"))])
    c = (dem.select("cell_x", "cell_y", "elev_m",
                    F.explode(offs).alias("o"))
         .select((F.col("cell_x") - F.col("o.dx")).alias("cx"),
                 (F.col("cell_y") - F.col("o.dy")).alias("cy"),
                 F.col("o.t").alias("t"), "elev_m"))
    return (k.join(c, ["cx", "cy"]).groupBy("fid")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") == 4))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="dump_plans")
    os.makedirs("/root/repo/plans/r06", exist_ok=True)
    for name, fn in plans(spark, sf_dir).items():
        if only and name not in only:
            continue
        path = f"/root/repo/plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f, redirect_stdout(f):
            fn().explain("formatted")
        print("wrote", path)


if __name__ == "__main__":
    main()
