"""Corpus-level n-gram statistics — the "what does this corpus actually
say" analysis pass (top boilerplate phrases, contamination candidates,
template discovery) that feeds decontamination lists and
paragraph-scrub thresholds. No reference analog (QualityControl.py's
frequency profiling is per-column categorical, reference
QualityControl.py:1040-1180 — never token n-grams).

100 TB shape — the naive form (explode n-grams, groupBy the STRING)
shuffles the entire corpus's n-gram text. Instead, the repo's
hash-compression idiom (cf. paragraph_scrub, domain_boilerplate_scrub):

1. Count by 52-bit md5 hash: the exchange behind the groupBy carries
   partially aggregated (BIGINT hash, count) pairs only — n-gram
   strings never leave their map task.
2. The global top-k (cnt DESC, hash ASC — a total order both engines
   share) lowers to TakeOrderedAndProject; k rows reach the driver.
3. A second tiny job recovers the winners' strings: filter n-grams
   whose hash is in the k-element plan-literal set (zero-shuffle
   predicate), then groupBy those k hashes with min(ngram) — the only
   strings that ever cross an exchange are the winners'.

md5-13-hex (not xxhash64) so the DuckDB oracle computes the identical
hash — one hash, both engines, and the (astronomically rare) 52-bit
collision behaves IDENTICALLY on both sides: colliding n-grams merge
counts and the lexicographically smallest string represents the bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import words


def _ngram_hash(g: Column) -> Column:
    return F.conv(F.substring(F.md5(g), 1, 13), 16, 10).cast("long")


def _with_ngrams(
    df: DataFrame, text_col: str, n: int, lowercase: bool
) -> DataFrame:
    """Adds _ng: array<string> of word n-grams (space-joined, document
    order); docs with fewer than n tokens contribute none. Arrays
    materialize in their own projections (HOF-over-expensive-array
    re-evaluation trap)."""
    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    out = df.withColumn("_toks", words(src))
    if n == 1:
        return out.withColumn("_ng", F.col("_toks")).drop("_toks")
    parts = [F.slice(F.col("_toks"), j + 1, F.size("_toks") - (n - 1)) for j in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda a, b: F.concat(a, F.lit(" "), b))
    out = out.withColumn(
        "_ng",
        F.when(F.size("_toks") >= n, joined).otherwise(
            F.array().cast("array<string>")
        ),
    )
    return out.drop("_toks")


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Exact global top-k word n-grams by count. Returns (ngram, cnt),
    k rows, deterministically tie-broken at the boundary by
    (cnt DESC, hash ASC). Runs TWO jobs: the bigint count pass (top-k
    collected — k is driver-sized), then the winner-string recovery
    pass; see the module docstring for why the corpus text never
    shuffles."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    ng = _with_ngrams(df, text_col, n, lowercase).select(
        F.explode("_ng").alias("_g")
    )
    hashed = ng.select(F.col("_g"), _ngram_hash(F.col("_g")).alias("_h"))
    counts = (
        hashed.select("_h")
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("_h").asc())
        .limit(k)
    )
    winners = counts.collect()  # k rows — a result, not a data collect
    if not winners:
        return df.sparkSession.createDataFrame([], "ngram string, cnt long")
    wh = [r["_h"] for r in winners]
    recovered = (
        hashed.filter(F.col("_h").isin(wh))
        .groupBy("_h")
        .agg(F.min("_g").alias("ngram"))
    )
    cnt_df = df.sparkSession.createDataFrame(
        [(r["_h"], r["cnt"]) for r in winners], "_h long, cnt long"
    )
    return recovered.join(F.broadcast(cnt_df), "_h").select("ngram", "cnt")
