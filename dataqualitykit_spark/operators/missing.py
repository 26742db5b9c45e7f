"""NullValues re-imagined (reference QualityControl.py:10-297).

The reference's list_all fires 2 actions and a Python loop (:50-68); check
fires 4 jobs per column (:138-143). Here every diagnostic is ONE wide
aggregation (partial+final hash agg, no extra jobs) and every fix is pure
plan construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import is_missing


def missing_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Single-pass per-column missing counts (A1 pattern, :59).

    Returns one row: <col>_missing count per column plus total_rows.
    """
    cols = cols or df.columns
    aggs = [
        F.sum(F.when(is_missing(F.col(c)), 1).otherwise(0)).alias(f"{c}_missing")
        for c in cols
    ]
    return df.agg(F.count(F.lit(1)).alias("total_rows"), *aggs)


def drop_missing(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """fix(strategy='delete') (:254-258) — extended to the full missing
    predicate, not just SQL NULL."""
    cols = cols or df.columns
    pred = None
    for c in cols:
        m = is_missing(F.col(c))
        pred = m if pred is None else (pred | m)
    return df.filter(~pred)


def fill_missing(df: DataFrame, fill: dict[str, object]) -> DataFrame:
    """fix(strategy='fill') (:260-267): constant fill per column, applied to
    the whole missing-token set (NULL/''/whitespace/'NA'/...)."""
    for c, v in fill.items():
        df = df.withColumn(
            c, F.when(is_missing(F.col(c)), F.lit(v)).otherwise(F.col(c))
        )
    return df


def flag_missing(df: DataFrame, cols: list[str]) -> DataFrame:
    """fix(strategy='flag') (:287-292): adds {col}_missing_flag 0/1."""
    for c in cols:
        df = df.withColumn(
            f"{c}_missing_flag",
            F.when(is_missing(F.col(c)), F.lit(1)).otherwise(F.lit(0)),
        )
    return df
