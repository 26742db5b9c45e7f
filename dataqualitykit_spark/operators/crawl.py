"""Crawl-over-crawl corpus delta — the re-crawl bookkeeping step of a
living training corpus: which urls are NEW this crawl, which vanished
(REMOVED), which pages CHANGED content, which are byte-identical
(UNCHANGED). Feeds incremental processing (only new/changed pages need
scoring and dedup re-entry — lineage.run_resumable's bucket inputs) and
freshness reporting. No reference analog (QualityControl.py is
single-table); task-brief training-data op family.

100 TB shape: each side reduces to (url, content-md5) — 48 bytes/row —
BEFORE the one full-outer sort-merge join on url; page text never
shuffles. With both crawls written bucketed by url (sources/tableio),
the join is exchange-free; AQE handles the skewless url key otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fingerprint(df: DataFrame, url_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(url_col).alias("url"),
        F.md5(
            F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
        ).alias("_h"),
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(url, status) with status in {'new','removed','changed',
    'unchanged'} — full-outer join of the two crawls' (url, md5(text))
    fingerprints. NULL text hashes as '' (the pipeline's content-hash
    convention), so NULL->'' flips do NOT count as changes; urls must be
    unique per side (dedup_url upstream — duplicate urls would cross-
    multiply in the join)."""
    o = _fingerprint(old, url_col, text_col).withColumnRenamed("_h", "_ho")
    n = _fingerprint(new, url_col, text_col).withColumnRenamed("_h", "_hn")
    j = o.join(n, "url", "full_outer")
    return j.select(
        "url",
        F.when(F.col("_ho").isNull(), F.lit("new"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
