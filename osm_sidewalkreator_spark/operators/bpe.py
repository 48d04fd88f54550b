"""Byte-pair-encoding tokenizer: distributed training statistics,
driver-side merge learning, distributed Arrow-batched encoding.

This is the shape real BPE training takes at corpus scale (Sennrich
et al. 2016; GPT-2's encoder): the CORPUS-SIZED work is one word-
frequency aggregate (map-side combined groupBy — at 10^12 docs only
#distinct-words rows cross the shuffle), the merge-learning loop then
runs on that small word-frequency table driver-side (the model is a
few thousand merge rules — learning it is not a distributed problem),
and encoding fans back out as a narrow ``mapInPandas`` with a
per-word memo (Zipf's law makes the hit rate ~1: a few hundred
thousand distinct words cover virtually all tokens).

Determinism: pre-tokenization is a whitespace split (the engine's
token convention throughout textops.py) with the classic ``</w>``
end-of-word sentinel; merge selection breaks frequency ties by the
lexicographically SMALLEST pair, so the learned merge list is a pure
function of the corpus — any engine recomputing the counts learns the
identical tokenizer (the test suite's independent reference does).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "</w>"


def bpe_word_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """(word, n) corpus word frequencies — the one corpus-sized stage
    of BPE training. Map-side combine collapses each partition to its
    distinct words before the exchange."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(c, r"\s+"), lambda w: w != "")
    return (docs.select(F.explode(words).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def bpe_train(word_counts: dict[str, int] | DataFrame,
              n_merges: int = 200) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merge rules from word frequencies.

    Accepts the dict directly or a (word, n) DataFrame (collected —
    the word-frequency table is the SMALL side by construction; pass
    a sampled/truncated table if distinct words are unbounded, which
    is standard practice: tokenizers are trained on a corpus sample).

    Pure driver-side function: at each step count symbol-pair
    frequencies over the word table, take the most frequent pair
    (ties -> lexicographically smallest), fuse it everywhere. Stops
    early when no pair repeats.
    """
    if isinstance(word_counts, DataFrame):
        word_counts = {r["word"]: r["n"] for r in word_counts.collect()}
    vocab = {tuple(w) + (EOW,): int(n)
             for w, n in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        # most frequent pair; frequency ties -> lexicographically
        # smallest pair (full determinism)
        top = max(pairs.values())
        best_pair = min(p for p, n in pairs.items() if n == top)
        if top < 2:
            break
        merges.append(best_pair)
        fused = best_pair[0] + best_pair[1]
        nxt = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and sym[i] == best_pair[0]
                        and sym[i + 1] == best_pair[1]):
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        vocab = nxt
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]
                 ) -> list[str]:
    """Greedy lowest-rank-first merge application (the GPT-2 bpe()
    loop): at each step fuse the present pair with the smallest
    learned rank; stop when no present pair was learned."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


_ENC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
    T.StructField("n_bpe_tokens", T.IntegerType()),
])


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               col: str = "text") -> DataFrame:
    """(doc_id, bpe_tokens, n_bpe_tokens) under the learned merges.

    Narrow ``mapInPandas`` (no shuffle): the merge table broadcasts
    inside the serialized closure (a few KB), and a per-executor word
    memo turns the per-word merge loop into a dict hit for every
    repeated word — the Zipf head IS the workload.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    colname = col

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in it:
            toks = []
            for text in pdf[colname]:
                if not isinstance(text, str):
                    text = ""  # null text -> zero tokens, never the
                    # stringified 'None'
                out: list[str] = []
                for w in text.split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, ranks)
                    out.extend(got)
                toks.append(out)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "bpe_tokens": toks,
                "n_bpe_tokens": [len(t) for t in toks]})

    return docs.select("doc_id", colname).mapInPandas(
        encode, schema=_ENC_SCHEMA)


def train_bpe_on_corpus(docs: DataFrame, n_merges: int = 200,
                        col: str = "text",
                        max_words: int | None = 1_000_000
                        ) -> list[tuple[str, str]]:
    """End-to-end convenience: distributed counts -> driver merges.
    ``max_words`` keeps only the most frequent words (deterministic
    (n DESC, word ASC) order) — the standard bound when distinct
    words are unbounded at corpus scale. Bounded BY DEFAULT: at web
    scale distinct "words" (URLs, hashes, CJK runs) are unbounded and
    an uncapped collect is a driver OOM; 1e6 words × ~tens of bytes
    is broadcast-scale. Corpora with fewer distinct words are
    unaffected (the top-k covers the whole table). Pass
    ``max_words=None`` to opt out explicitly."""
    wc = bpe_word_counts(docs, col)
    if max_words is not None:
        wc = (wc.orderBy(F.col("n").desc(), F.col("word").asc())
              .limit(max_words))
    return bpe_train(wc, n_merges=n_merges)
