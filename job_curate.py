"""spark-submit entrypoint for the corpus-curation chain.

    spark-submit --py-files engine.zip job_curate.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/curate_job \
        --min-quality 0.5 --langs en,pt

Runs plans/curate.py's chain (quality -> language -> exact dedup ->
near-dup cluster dedup -> token-window chunks) and writes:

* ``out/chunks/``       training-ready chunk parquet, partitioned by
                        ``lang`` (the downstream tokenizer's read key)
                        with bounded file sizes (``maxRecordsPerFile``);
* ``out/cluster_map/``  (doc_id, cluster_id, cluster_size, is_keeper)
                        — the dedup lineage, so any dropped document is
                        auditable back to its surviving keeper;
* ``out/metrics.json``  row counts per stage + wall time.

Scale notes: the labeled stage is persisted once (MEMORY_AND_DISK) so
the cluster-map write and the chunk write don't recompute the CC
rounds; the only driver-side values are scalar counts.  At 100 TB the
same script runs unchanged with the catalog seam providing the input
(``spark.sidewalkreator.tablePrefix``) and a real checkpoint dir for
the CC rounds (see operators/graph.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from osm_sidewalkreator_spark.plans.curate import curation_stages
from osm_sidewalkreator_spark.session import get_spark
from osm_sidewalkreator_spark.sources.catalog import load_table


def _parse_spec(s: str, flag: str) -> dict[str, float]:
    """Parse 'key=float,key=float' CLI specs with clear errors."""
    spec: dict[str, float] = {}
    for kv in s.split(","):
        kv = kv.strip()
        if not kv:
            continue
        key, sep, val = kv.partition("=")
        if not sep or not key.strip():
            raise SystemExit(f"{flag}: expected key=value, got {kv!r}")
        try:
            spec[key.strip()] = float(val)
        except ValueError:
            raise SystemExit(
                f"{flag}: value for {key.strip()!r} is not a "
                f"number: {val!r}") from None
    return spec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--table", default="documents",
                    choices=["documents", "pages"],
                    help="input shape: 'documents' (doc_id, text, "
                    "lang) or the north-star 'pages' table (url, "
                    "warc_ts, html, text, lang) — pages are recrawl-"
                    "deduped first (latest_crawl) and given a "
                    "deterministic doc_id = xxhash64(canonical url); "
                    "url rides into the chain so the domain stages "
                    "(--block-domains/--max-per-domain) apply")
    ap.add_argument("--out", default="/tmp/curate_job")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--langs", default=None,
                    help="comma-separated keep-list, e.g. en,pt "
                    "(default: keep all)")
    ap.add_argument("--max-dup-3gram", type=float, default=None,
                    help="drop docs with duplicate-3gram fraction "
                    "above this (in-doc repetition filter)")
    ap.add_argument("--max-boilerplate", type=float, default=None,
                    help="drop docs whose corpus-common-shingle ratio "
                    "exceeds this (adds the DF-index shuffles)")
    ap.add_argument("--gopher", action="store_true",
                    help="apply the full Gopher (Rae et al. 2021) "
                    "document-quality rule set before scoring "
                    "(row-pure, zero shuffles)")
    ap.add_argument("--normalize", action="store_true",
                    help="collapse whitespace / strip control chars "
                    "before any scoring (row-pure, zero shuffles)")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="rewrite text through the PII placeholder "
                    "chain before scoring (row-pure, zero shuffles)")
    ap.add_argument("--strip-spans", type=int, default=None,
                    metavar="TOKENS",
                    help="cut token spans of this length that repeat "
                    "across the corpus before scoring (substring-level "
                    "exact dedup; adds the gram-count shuffle)")
    ap.add_argument("--max-nll", type=float, default=None,
                    help="drop docs whose self-trained bigram-LM "
                    "negative log-likelihood exceeds this (CCNet-style "
                    "perplexity tail cut)")
    ap.add_argument("--decontaminate", default=None, metavar="PARQUET",
                    help="path to an eval-corpus parquet with a text "
                    "column; docs sharing any 8-gram with it are "
                    "dropped (eval grams broadcast)")
    ap.add_argument("--block-domains", default=None, metavar="LIST",
                    help="comma-separated domain blocklist; needs a "
                    "url column on the input (broadcast anti-join)")
    ap.add_argument("--max-per-domain", type=int, default=None,
                    help="cap docs per domain; needs a url column. "
                    "Default is the sampled (shuffle-free, skew-immune)"
                    " cap; --domain-cap-exact opts into the window")
    ap.add_argument("--domain-cap-exact", action="store_true",
                    help="use the exact row_number per-domain cap "
                    "(one exchange; skew-exposed on mega-domains)")
    ap.add_argument("--split", default=None, metavar="SPEC",
                    help="deterministic disjoint split labels keyed on "
                    "doc_id (all chunks of a doc share a label), e.g. "
                    "'train=0.99,val=0.005,test=0.005'")
    ap.add_argument("--sample", default=None, metavar="SPEC",
                    help="deterministic per-language keep fractions "
                    "applied to the chunk-ready docs, e.g. "
                    "'en=0.8,pt=0.3,default=0.05'")
    ap.add_argument("--shards", type=int, default=None,
                    help="write chunks into N hash-sharded files in "
                    "reproducible pseudo-random training order "
                    "instead of lang partitions")
    ap.add_argument("--pack", type=int, default=None, metavar="SEQ_TOKENS",
                    help="with --shards: next-fit pack chunks into "
                    "training sequences of at most SEQ_TOKENS tokens "
                    "(adds seq_id/seq_pos/oversize; reuses the shard "
                    "partitioning, no extra exchange)")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--chunk-tokens", type=int, default=128)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--max-records-per-file", type=int, default=500_000)
    args = ap.parse_args(argv)

    spark = get_spark(app="sidewalkreator_curate")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    if args.table == "pages":
        from osm_sidewalkreator_spark.operators import textops as TX
        pages = load_table(spark, args.sf_dir, "pages")
        n_raw = pages.count()
        # recrawl dedup BEFORE anything else (the CC-index rule),
        # then a deterministic doc key: after latest_crawl there is
        # exactly one row per canonical url, so its hash is unique
        canon, _dom = TX.canonicalize_url(F.col("url"))
        docs = (TX.latest_crawl(pages)
                .select(F.xxhash64(canon).alias("doc_id"),
                        "url", "text", "lang"))
    else:
        n_raw = None
        docs = load_table(spark, args.sf_dir, "documents")
    n_docs = docs.count()
    evals = (spark.read.parquet(args.decontaminate)
             if args.decontaminate else None)
    stages = curation_stages(
        docs,
        normalize=args.normalize,
        block_domains=(args.block_domains.split(",")
                       if args.block_domains else None),
        max_per_domain=args.max_per_domain,
        domain_cap_exact=args.domain_cap_exact,
        min_quality=args.min_quality,
        gopher=args.gopher,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        max_dup_3gram=args.max_dup_3gram,
        max_boilerplate=args.max_boilerplate,
        scrub_pii=args.scrub_pii,
        strip_spans_tokens=args.strip_spans,
        max_nll=args.max_nll,
        decontaminate_against=evals,
        jaccard=args.jaccard, chunk_tokens=args.chunk_tokens,
        overlap=args.overlap)

    labeled = stages["labeled"].persist(StorageLevel.MEMORY_AND_DISK)
    (labeled.select("doc_id", "cluster_id", "cluster_size", "is_keeper")
     .write.mode("overwrite").parquet(str(out / "cluster_map")))

    chunks = stages["chunks"]
    if args.sample:
        from osm_sidewalkreator_spark.operators.sampling import (
            weighted_sample)
        spec = _parse_spec(args.sample, "--sample")
        default = spec.pop("default", 0.0)
        chunks = weighted_sample(
            chunks, spec, group_col="lang", key_col="doc_id",
            default_fraction=default)
    if args.split:
        from osm_sidewalkreator_spark.operators.domains import (
            split_corpus)
        # keyed on doc_id: every chunk of a doc lands in the same
        # split, so no document leaks across train/val/test
        chunks = split_corpus(chunks, _parse_spec(args.split,
                                                  "--split"),
                              key_col="doc_id")
    if args.pack and not args.shards:
        raise SystemExit("--pack requires --shards (sequences are "
                         "packed within shards)")
    if args.shards:
        from osm_sidewalkreator_spark.operators.sampling import (
            shard_corpus)
        sharded = shard_corpus(chunks, args.shards, key_col="doc_id")
        if args.pack:
            from osm_sidewalkreator_spark.operators.packing import (
                pack_sequences)
            # training order (shard_order) decides packing adjacency;
            # (doc_id, chunk_idx) keeps a doc's chunks contiguous.
            # With --split the split label JOINS THE GROUP KEY: a
            # packed sequence must never mix train and held-out text
            # (costs one extra exchange — correctness over shuffle
            # parsimony here).
            grp = ("shard", "split") if args.split else "shard"
            sharded = pack_sequences(
                sharded, args.pack, group_col=grp,
                order_cols=("shard_order", "doc_id", "chunk_idx"))
        (sharded.write.mode("overwrite")
         .option("maxRecordsPerFile", args.max_records_per_file)
         .partitionBy("shard")
         .parquet(str(out / "chunks")))
    else:
        (chunks.write.mode("overwrite")
         .option("maxRecordsPerFile", args.max_records_per_file)
         .partitionBy("lang")
         .parquet(str(out / "chunks")))

    chunk_stats = (spark.read.parquet(str(out / "chunks"))
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum("n_chunk_tokens").alias("tok")).first())
    metrics = {
        "seconds": round(time.time() - t0, 1),
        **({"pages_raw": n_raw} if n_raw is not None else {}),
        "docs_in": n_docs,
        "docs_after_filters": stages["filtered"].count(),
        "docs_kept": labeled.filter("is_keeper").count(),
        "near_dup_docs_dropped": labeled.filter("NOT is_keeper").count(),
        "chunks": chunk_stats["n"],
        "chunk_tokens_total": int(chunk_stats["tok"]),
    }
    if args.pack:
        seq_key = ["shard", "split", "seq_id"] if args.split \
            else ["shard", "seq_id"]
        seqs = (spark.read.parquet(str(out / "chunks"))
                .agg(F.countDistinct(*seq_key).alias("n"))
                .first()["n"])
        metrics["sequences"] = seqs
        metrics["packing_efficiency"] = round(
            int(chunk_stats["tok"]) / (seqs * args.pack), 4)
    labeled.unpersist()
    (out / "metrics.json").write_text(json.dumps(metrics, indent=2))

    # data card: the per-stratum accounting a corpus release ships —
    # docs/chunks/tokens by language (and split when present), from
    # ONE collapsing aggregate over the already-written chunk parquet
    # (#strata rows reach the driver, nothing more)
    written = spark.read.parquet(str(out / "chunks"))
    strata = [c for c in ("lang", "split") if c in written.columns]
    card_rows = (written.groupBy(*strata).agg(
        F.countDistinct("doc_id").alias("docs"),
        F.count(F.lit(1)).alias("chunks"),
        F.sum("n_chunk_tokens").alias("tokens")).collect()
        if strata else [])
    card = {
        "strata_keys": strata,
        "strata": sorted(
            ({**{k: r[k] for k in strata},
              "docs": r["docs"], "chunks": r["chunks"],
              "tokens": int(r["tokens"])} for r in card_rows),
            key=lambda d: tuple(str(d[k]) for k in strata)),
        "totals": {"docs": metrics["docs_kept"],
                   "chunks": metrics["chunks"],
                   "tokens": metrics["chunk_tokens_total"]},
        "pipeline": {k: v for k, v in vars(args).items()
                     if k not in ("out",)},
    }
    (out / "data_card.json").write_text(json.dumps(card, indent=2))
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
