"""CategoricalValidity re-imagined (reference QualityControl.py:1055-1570).

The reference pulls distinct values to the driver for O(n²) loops
(:1262) and uses row-at-a-time mapping UDFs (:1341-1354). Here: frequency
work is hash aggregation; mapping is chained-when or broadcast join; rare
detection is agg + filter; case standardization is native functions
(:1480-1497 without the UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def category_frequencies(df: DataFrame, col: str) -> DataFrame:
    """A7 (:1136-1139): value -> count, plus share of total."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("frequency"))
    total = counts.agg(F.sum("frequency").alias("_t"))
    return counts.crossJoin(F.broadcast(total)).withColumn(
        "share", F.col("frequency") / F.col("_t").cast("double")
    ).drop("_t")


def invalid_categories(df: DataFrame, col: str, allowed: list[str]) -> DataFrame:
    """check_category_validity (:1068-1180): rows outside the allowed set."""
    c = F.col(col)
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum((~c.isin(*allowed) | c.isNull()).cast("long")).alias("invalid_count"),
    )


def rare_categories(df: DataFrame, col: str, threshold: float = 0.01) -> DataFrame:
    """A8 (:1549-1559): categories with share < threshold.

    The total comes from the same in-plan broadcast 1-row aggregate idiom
    as category_frequencies — one job, no separate df.count() action."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("frequency"))
    total = counts.agg(F.sum("frequency").alias("_t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("frequency") < F.lit(threshold) * F.col("_t"))
        .drop("_t")
    )


def group_rare_as_other(
    df: DataFrame, col: str, threshold: float = 0.01, other: str = "Other"
) -> DataFrame:
    """U4 (:1563-1567) without the UDF and without a driver collect: left
    join against the rare-category frame. On heavy-tailed web categoricals
    the rare tail is MOST of the distinct values — inlining it as an isin
    literal list puts millions of literals in the plan; an equi-join on the
    category keeps the plan O(1) and lets AQE broadcast when it is small."""
    rare = rare_categories(df, col, threshold).select(
        F.col(col).alias("_rare_val")
    ).withColumn("_is_rare", F.lit(True))
    return (
        df.join(rare, df[col] == rare["_rare_val"], "left")
        .withColumn(
            col,
            F.when(F.col("_is_rare").isNotNull(), F.lit(other)).otherwise(F.col(col)),
        )
        .drop("_rare_val", "_is_rare")
    )


def mode_value(df: DataFrame, col: str) -> DataFrame:
    """A6 (:281): most frequent value, deterministic tie-break on value."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc(col))
        .limit(1)
    )


def standardize_case(df: DataFrame, col: str, style: str = "lower") -> DataFrame:
    """U3 (:1480-1497) natively: lower/upper/title(initcap)/sentence."""
    c = F.col(col)
    if style == "lower":
        expr = F.lower(c)
    elif style == "upper":
        expr = F.upper(c)
    elif style == "title":
        expr = F.initcap(c)
    elif style == "sentence":
        # Column API throughout — F.expr(f"substring({col},2)") breaks on
        # column names needing quoting (spaces, reserved words)
        expr = F.concat(
            F.upper(F.substring(c, 1, 1)),
            F.lower(c.substr(F.lit(2), F.length(c))),
        )
    else:
        raise ValueError(style)
    return df.withColumn(col, expr)


def map_categories(
    df: DataFrame,
    col: str,
    mapping: dict[str, str],
    keep_unknown: bool = True,
    case_sensitive: bool = True,
    unknown_value: str | None = None,
) -> DataFrame:
    """U1 + map_to_standard_categories (:1341-1354, :1286-1339) without
    the UDF: chained when for small maps. handle_unknown legs: keep
    (keep_unknown=True), null (False), 'Other'-style constant
    (unknown_value='Other'); case_sensitive=False mirrors the reference
    default by matching on lower()."""
    c = F.col(col)
    expr = None
    for k, v in mapping.items():
        cond = (
            (c == F.lit(k))
            if case_sensitive
            else (F.lower(c) == F.lit(k.lower()))
        )
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if unknown_value is not None:
        fallback = F.lit(unknown_value)
    else:
        fallback = c if keep_unknown else F.lit(None)
    return df.withColumn(col, expr.otherwise(fallback))


def fuzzy_correct(
    df: DataFrame,
    col: str,
    reference_values: list[str],
    threshold: float = 0.85,
) -> DataFrame:
    """U2 (reference :1415-1428, row-at-a-time F.udf + uninstalled
    jellyfish) as an Arrow-batched pandas UDF over the shared pure-python
    jaro_winkler: map each value to its best reference match when
    similarity >= threshold (the reference's similarity_threshold 0.85,
    :1186), else keep the original."""
    import pandas as pd
    from pyspark.sql.types import StringType

    from ..semantics import jaro_winkler

    refs = list(reference_values)

    # no annotations on the inner fn: `from __future__ import annotations`
    # stringifies them and pyspark's pandas_udf signature inference chokes
    # on unresolvable 'pd.Series'
    def _correct(vals):
        def best(v):
            if v is None:
                return None
            top, top_score = v, threshold
            for r in refs:
                score = jaro_winkler(v.lower(), r.lower())
                if score >= top_score:
                    top, top_score = r, score
            return top

        return vals.map(best)

    return df.withColumn(col, F.pandas_udf(_correct, StringType())(F.col(col)))


def spelling_variant_report(
    df: DataFrame,
    col: str,
    reference_values: list[str] | None = None,
    threshold: float = 0.85,
    top_k_refs: int = 100,
) -> DataFrame:
    """check_spelling_variants (:1182-1283) re-imagined. The reference
    collects every distinct value AND the top-100 reference values to the
    driver (:1242, :1262) and runs an O(distinct x refs) python loop; here
    distinct values stay distributed (hash agg), references are a bounded
    top-k (count DESC, value ASC tie-break — the reference's orderBy desc
    count alone is nondeterministic), and scoring is a broadcast cross
    join + Arrow-batched jaro_winkler over the shared semantics function.

    Returns the reference's variant_groups as a frame:
    (value, reference, similarity) for every pair >= threshold —
    identity pairs included, as in the reference loop."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    from ..semantics import jaro_winkler

    def _jw_batch(a, b):
        return pd.Series(
            [
                None if x is None or y is None else jaro_winkler(x, y)
                for x, y in zip(a, b)
            ]
        )

    jw_udf = F.pandas_udf(_jw_batch, DoubleType())

    vals = (
        df.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
    )
    if reference_values is None:
        refs = (
            df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("reference"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.desc("_n"), F.asc("reference"))
            .limit(top_k_refs)
            .select("reference")
        )
    else:
        refs = df.sparkSession.createDataFrame(
            [(r,) for r in reference_values], ["reference"]
        )
    pairs = vals.crossJoin(F.broadcast(refs))
    # lossless native prefilter before the Arrow scoring: jw >= t implies
    # jaro >= (t-0.4)/0.6 (winkler boost <= 0.4*(1-jaro)), and
    # jaro <= (m/l1 + m/l2 + 1)/3 with m <= min(l1,l2) forces
    # min/max >= 3*jaro_min - 2 — pairs with a worse length ratio CANNOT
    # clear the threshold, so the JVM drops them before Python sees them.
    # (Only a finite bound when jaro_min > 2/3, i.e. t > 0.8.)
    jaro_min = (threshold - 0.4) / 0.6
    ratio_min = 3.0 * jaro_min - 2.0
    if ratio_min > 0:
        lv, lr = F.length("value"), F.length("reference")
        pairs = pairs.filter(
            F.least(lv, lr) >= F.lit(ratio_min) * F.greatest(lv, lr)
        )
    return (
        pairs.withColumn("similarity", jw_udf(F.col("value"), F.col("reference")))
        .filter(F.col("similarity") >= F.lit(threshold))
    )


def lookup_standardize(df: DataFrame, lookup: DataFrame, key: str, value_col: str) -> DataFrame:
    """J2 (:2425 — the reference's _lookup was never implemented): broadcast
    left join against a small reference table."""
    return df.join(F.broadcast(lookup), on=key, how="left").withColumn(
        key, F.coalesce(F.col(value_col), F.col(key))
    ).drop(value_col)
