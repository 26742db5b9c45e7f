"""Compression-ratio quality signal: zlib bytes-out / bytes-in per doc.

The classic cheap repetitiveness detector (used by Gopher/Dolma-style
pipelines alongside the explicit repeated-n-gram rules): machine-generated
and template-spam text compresses far below natural prose, while
high-entropy noise (hashes, base64 blobs, minified code) barely
compresses at all. Both tails are drop candidates; the rule composes with
gopher_repetition rather than replacing it (zlib sees repetition at ANY
distance within its window, the n-gram rules see structure).

One Arrow-batched pass (stdlib zlib at a FIXED level — deterministic
bytes for a given zlib, so the ratio is stable across partitionings);
text never shuffles. The ratio itself is not SQL-computable, so the
driver oracle is an INVARIANT oracle: byte counts cross-check exactly
against strlen(), and planted extreme classes (periodic unit repeated vs
md5-hex chains) must land under/over provable thresholds — a periodic
doc's zlib output is bounded by unit + back-references (measured 0.013
at 2000 bytes; threshold 0.1), while cryptographic hex sits at the
4-bits-per-char entropy floor (measured 0.5625; threshold 0.3).

Reference parity: none — the reference has no compression analytics;
this extends the quality-signal bank (repetition.py, entropy.py).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["compression_ratio", "compression_stats"]

_LEVEL = 6


def py_compression(text: str | None) -> tuple[int | None, int | None, float | None]:
    """(n_bytes, c_bytes, ratio) — the python mirror the Arrow batch and
    tests share. NULL/empty text -> NULLs (ratio undefined at 0 bytes)."""
    if text is None:
        return None, None, None
    raw = text.encode("utf-8")
    if not raw:
        return 0, None, None
    c = len(zlib.compress(raw, _LEVEL))
    return len(raw), c, c / len(raw)


def compression_ratio(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Adds n_bytes / c_bytes / compress_ratio columns in one Arrow
    pass."""

    def batch(texts):  # no type hints (pandas_udf eval-type inference)
        rows = [py_compression(t) for t in texts]
        return pd.DataFrame(rows, columns=["n_bytes", "c_bytes", "ratio"])

    udf = F.pandas_udf(
        batch, returnType="n_bytes long, c_bytes long, ratio double"
    )
    out = df.withColumn("_cz", udf(F.col(text_col)))
    return out.select(
        "*",
        F.col("_cz.n_bytes").alias("n_bytes"),
        F.col("_cz.c_bytes").alias("c_bytes"),
        F.col("_cz.ratio").alias("compress_ratio"),
    ).drop("_cz")


def compression_stats(
    df: DataFrame, text_col: str = "text", group_by: str | None = None
) -> DataFrame:
    """Corpus profile: count / mean / min / max of the ratio (optionally
    per group) — the threshold-picking companion."""
    scored = compression_ratio(df, text_col)
    keys = [group_by] if group_by else []
    return scored.groupBy(*keys).agg(
        F.count("compress_ratio").alias("n_docs"),
        F.avg("compress_ratio").alias("mean_ratio"),
        F.min("compress_ratio").alias("min_ratio"),
        F.max("compress_ratio").alias("max_ratio"),
    )
