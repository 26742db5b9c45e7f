"""StatisticalAnomaly re-imagined (reference QualityControl.py:2532-3238).

Every window here is PARTITIONED — the reference's global Window.orderBy
(:3095, :3101, :2676) collapses to one task and cannot scale (SURVEY.md
§2.5 ⚠). Z-score constants inherited: k=3.0 default (:2932). Driver-side
scipy/statsmodels blocks (:2657-2672, :2900-2920) are out of scope per
SURVEY §2.9 U10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore_flags(
    df: DataFrame, col: str, threshold: float = 3.0, group_by: list[str] | None = None
) -> DataFrame:
    """|x - mean| / stddev > threshold flag (W8, :2989-2993).

    Global stats come from ONE aggregation cross-joined back as literals
    (broadcast of a 1-row frame — no collect, plan stays lazy). With
    group_by, stats are per group via partial+final hash agg + broadcast-
    friendly join on the group key.
    """
    c = F.col(col)
    if group_by:
        stats = df.groupBy(*group_by).agg(
            F.avg(c).alias("_mean"), F.stddev(c).alias("_std")
        )
        joined = df.join(F.broadcast(stats), group_by, "left")
    else:
        stats = df.agg(F.avg(c).alias("_mean"), F.stddev(c).alias("_std"))
        joined = df.crossJoin(F.broadcast(stats))
    z = F.when(
        F.col("_std").isNotNull() & (F.col("_std") > 0),
        F.abs(c - F.col("_mean")) / F.col("_std"),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("zscore", z).withColumn(
        "is_outlier", F.col("zscore") > F.lit(threshold)
    ).drop("_mean", "_std")


def remove_outliers_zscore(
    df: DataFrame, col: str, threshold: float = 3.0
) -> DataFrame:
    """zscore strategy='remove' (:3020-3030) without the anti-join — a
    plain filter over the flagged frame (golden: [1,2,3,100,5..10] with
    k=2.0 drops 100, tests/test_statistical_anomaly.py:44-46)."""
    flagged = zscore_flags(df, col, threshold)
    return flagged.filter(~F.col("is_outlier")).drop("zscore", "is_outlier")


def moving_average(
    df: DataFrame,
    col: str,
    order_col: str,
    windows: list[int] = (3, 5),
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Trailing moving averages (W3, :3100-3105) — ma_{k} columns.

    partition_by REQUIRED at scale; defaults to unpartitioned only for
    small fixtures (mirrors the reference golden ma_3/ma_5 test)."""
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    out = df
    for k in windows:
        out = out.withColumn(
            f"ma_{k}", F.avg(col).over(w.rowsBetween(-(k - 1), 0))
        )
    return out


def forward_fill(
    df: DataFrame,
    col: str,
    order_col: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W6 corrected (:2890-2892 references an undefined time_column):
    last non-null over unbounded-preceding frame."""
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    return df.withColumn(
        f"{col}_ffill",
        F.last(col, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def lag_tolerance_breach(
    df: DataFrame,
    col: str,
    order_col,
    tolerance: float = 0.0,
    partition_by: list[str] | None = None,
    kind: str = "numeric",
) -> DataFrame:
    """W2 (:1876-1890), all three reference legs:

    - kind='numeric'     |x - lag(x)| > tolerance
    - kind='temporal'    |datediff(x, lag(x))| > tolerance days (:1889)
    - kind='categorical' x != lag(x)  (:1885-1887, tolerance ignored)

    order_col may be a column name or a list of names/Columns (composite
    total order pins ties so the flag is deterministic under shuffle).
    """
    order = order_col if isinstance(order_col, list) else [order_col]
    w = Window.orderBy(*order)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order)
    prev = F.lag(col).over(w)
    if kind == "numeric":
        breach = F.abs(F.col(col) - prev) > F.lit(tolerance)
    elif kind == "temporal":
        breach = F.abs(F.datediff(F.col(col), prev)) > F.lit(tolerance)
    elif kind == "categorical":
        breach = F.col(col) != prev
    else:
        raise ValueError(f"kind must be numeric/temporal/categorical, got {kind!r}")
    # coalesce catches BOTH null legs: prev NULL (first row of a partition)
    # and current-value NULL (breach expr null-propagates) — the output is
    # always a real boolean, mirroring the oracle's coalesce(..., FALSE)
    return df.withColumn(
        "tolerance_breach",
        F.coalesce(breach, F.lit(False)),
    )


def neighborhood_deviation(
    df: DataFrame,
    col: str,
    order_col: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W7 (:3186-3191): |x - avg over [-1,+1] frame|."""
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    return df.withColumn(
        "neighborhood_dev",
        F.abs(F.col(col) - F.avg(col).over(w.rowsBetween(-1, 1))),
    )


def weighted_moving_average(
    df: DataFrame,
    col: str,
    order_col,
    weights: list[float],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W4 corrected (reference :3092-3099 passes F.lit(np.array) — invalid):
    linear-weighted trailing MA as a lag composition, wma = sum(w_i *
    lag(x, k-1-i)) / sum(w); NULL until the frame is full (first k-1 rows).

    order_col may be a name or list of names/Columns (composite tie-break)."""
    order = order_col if isinstance(order_col, list) else [order_col]
    w = Window.orderBy(*order)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order)
    k = len(weights)
    total = sum(weights)
    expr = None
    for i, wt in enumerate(weights):
        term = F.lag(col, k - 1 - i).over(w) * F.lit(wt)
        expr = term if expr is None else expr + term
    return df.withColumn(f"wma_{k}", expr / F.lit(total))


def centered_moving_average(
    df: DataFrame,
    col: str,
    order_col: str,
    k: int = 3,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W5 (:3107-3111): centered frame [-(k//2), +(k//2)] directly instead
    of the reference's trailing-MA-then-lead shift."""
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    half = k // 2
    return df.withColumn(
        f"cma_{k}", F.avg(col).over(w.rowsBetween(-half, half))
    )


def impute(
    df: DataFrame, cols: list[str], strategy: str = "mean"
) -> DataFrame:
    """A13 (:283-285): mean/median imputation via pyspark.ml.feature.Imputer."""
    from pyspark.ml.feature import Imputer

    model = Imputer(
        strategy=strategy, inputCols=cols, outputCols=cols
    ).fit(df)
    return model.transform(df)


def cusum_changepoints(
    metric_rows: list[float], threshold: float = 5.0, drift: float = 0.0
) -> list[int]:
    """CUSUM over a per-batch metrics series (SURVEY §7.0 deferred stage:
    driver-side over the TINY aggregate metrics table — the one place
    driver-side compute is fine). Returns indices where the cumulative
    positive or negative deviation from the running mean exceeds
    threshold * stddev."""
    n = len(metric_rows)
    if n < 3:
        return []
    # in-control target calibrated on an initial window (standard CUSUM),
    # not the global mean — a level shift would otherwise contaminate the
    # target and fire inside the pre-shift segment
    calib = min(n, max(5, n // 10))
    target = sum(metric_rows[:calib]) / calib
    mean = sum(metric_rows) / n
    var = sum((x - mean) ** 2 for x in metric_rows) / max(n - 1, 1)
    std = var**0.5
    if std == 0:
        return []
    limit = threshold * std
    pos = neg = 0.0
    out = []
    for i, x in enumerate(metric_rows):
        pos = max(0.0, pos + (x - target - drift))
        neg = min(0.0, neg + (x - target + drift))
        if pos > limit or -neg > limit:
            out.append(i)
            pos = neg = 0.0
    return out


def distribution_moments(
    df: DataFrame, col: str, group_by: list[str] | None = None
) -> DataFrame:
    """A4/A12 (:2640-2646, :2682-2691): mean/stddev/skewness/kurtosis,
    optionally per segment."""
    c = F.col(col)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg(c).alias("mean_value"),
        F.stddev(c).alias("stddev_value"),
        F.skewness(c).alias("skewness_value"),
        F.kurtosis(c).alias("kurtosis_value"),
    ]
    return df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)
