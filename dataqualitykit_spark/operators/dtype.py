"""DataTypeConformity re-imagined (reference QualityControl.py:306-639).

The reference's violation predicate (:405) conflates genuine NULLs with
cast failures; SURVEY.md §2.2 P9 pins the corrected form used here. The
reference's infer_types samples to the driver (:609) — replaced by a
single aggregation over try_cast success rates (distributed, one job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cast_violations(df: DataFrame, col: str, to_type: str) -> DataFrame:
    """One-row report: rows that fail try_cast but are not NULL (P9
    corrected), plus violation percentage."""
    c = F.col(col)
    bad = c.try_cast(to_type).isNull() & c.isNotNull()
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(bad.cast("long")).alias("violations"),
        (F.sum(bad.cast("long")) * 100.0 / F.count(F.lit(1))).alias(
            "violation_percentage"
        ),
    )


def coerce(df: DataFrame, col: str, to_type: str, flag: bool = False) -> DataFrame:
    """fix(strategy='coerce'): failed casts become NULL, row kept; optional
    {col}_cast_failed flag column (reference 'flag' remediation)."""
    c = F.col(col)
    out = df
    if flag:
        # flag computed from the ORIGINAL column, before coercion replaces it
        out = out.withColumn(
            f"{col}_cast_failed",
            (c.try_cast(to_type).isNull() & c.isNotNull()).cast("int"),
        )
    return out.withColumn(col, c.try_cast(to_type))


def infer_type_scores(df: DataFrame, col: str) -> DataFrame:
    """Distributed type inference: fraction of non-null values castable to
    each candidate type (replaces driver-side sampling :564-613)."""
    c = F.col(col)
    nonnull = F.sum(c.isNotNull().cast("long"))
    scores = [
        (F.sum((c.try_cast(t).isNotNull()).cast("long")) / F.greatest(nonnull, F.lit(1))).alias(
            f"castable_{alias}"
        )
        for t, alias in [
            ("bigint", "bigint"),
            ("double", "double"),
            ("date", "date"),
            ("timestamp", "timestamp"),
            ("boolean", "boolean"),
        ]
    ]
    return df.agg(nonnull.alias("non_null_rows"), *scores)
