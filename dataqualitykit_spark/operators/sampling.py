"""Deterministic token-budget sampling — "give me ~N tokens per language
from this corpus, reproducibly" — the standard curriculum/mixture step
between filtering and training. No reference analog (S5 in SURVEY.md is
plain row sampling via df.sample); task-brief training-data operator.

Semantics: within each `by` group, docs are ordered by the pseudo-random
but fully deterministic key (md5(id), id) and kept while the running
token total stays <= budget — i.e. the kept set is a reproducible random
prefix whose token mass is the budget (the first doc past the line is
dropped, not truncated).

100 TB shape — a naive one-window cumsum puts an entire language in ONE
window partition (billions of rows through a single task); instead a
DISTRIBUTED PREFIX-SUM CUT:

1. one partial-aggregated pass sums tokens per (group, 256 md5-prefix
   buckets); the 256*|groups| summary collects to the driver (bounded
   and tiny — same contract as the ANN query batches),
2. the driver prefix-sums each group's buckets in hex order and finds
   the cutoff bucket + remaining budget,
3. full buckets keep every row via a broadcast semi-join; ONLY the
   cutoff bucket (1/256 of one group) runs a window cumsum.

Because the bucket is the first two hex chars of the SAME md5 key the
window orders by, (bucket, key, id) ordering == global (key, id)
ordering, so the three-phase result is row-identical to the one-window
form (the DuckDB oracle runs the one-window form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T


def sample_to_token_budget(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "lang",
    token_expr=None,
) -> DataFrame:
    """Keep a deterministic ~budget_tokens prefix per `by` group.

    Returns the input rows (all columns) plus `n_tokens`. `id_col` must
    be unique per row (it seeds the order key). Rows with a NULL `by`
    value form their OWN group with its own budget. `token_expr` overrides
    the token counter (default: whitespace tokens — the cheap hot-path
    estimate; pass functions.text.token_count_bpe for BPE counts)."""
    toks = (
        token_expr
        if token_expr is not None
        else T.token_count_pretokens(F.col(text_col))
    )
    # internal NULL-SAFE group key: plain joins on the raw `by` column
    # would never match NULL=NULL and silently drop the whole NULL group
    # (e.g. lang detection failed); distinct prefixes make the sentinel
    # collision-free
    gkey = F.when(F.col(by).isNull(), F.lit("\x00null")).otherwise(
        F.concat(F.lit("v:"), F.col(by).cast("string"))
    )
    base = (
        df.withColumn(
            "_key", F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
        )
        .withColumn("_bkt", F.substring("_key", 1, 2))
        .withColumn("_g", gkey)
        .withColumn("n_tokens", F.coalesce(toks.cast("long"), F.lit(0)))
    )
    spark = df.sparkSession

    sums = base.groupBy("_g", "_bkt").agg(F.sum("n_tokens").alias("_s")).collect()
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r["_g"], []).append((r["_bkt"], r["_s"]))
    full_rows, cut_rows = [], []
    for g, buckets in per_group.items():
        running = 0
        for b, s in sorted(buckets):
            if running + s <= budget_tokens:
                full_rows.append((g, b))
                running += s
            else:
                cut_rows.append((g, b, budget_tokens - running))
                break  # later buckets start past the budget

    full = spark.createDataFrame(full_rows, "_g string, _bkt string")
    kept_full = base.join(F.broadcast(full), ["_g", "_bkt"], "left_semi")

    cut = spark.createDataFrame(cut_rows, "_g string, _bkt string, _rem long")
    w = Window.partitionBy("_g", "_bkt").orderBy("_key", id_col)
    kept_cut = (
        base.join(F.broadcast(cut), ["_g", "_bkt"])
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") <= F.col("_rem"))
        .drop("_rem", "_cum")
    )
    return (
        kept_full.unionByName(kept_cut)
        .drop("_key", "_bkt", "_g")
    )
