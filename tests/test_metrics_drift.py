"""Batch-metrics drift detection end-to-end: the per-bucket metrics table
written by lineage.run_resumable feeds CUSUM (driver-side over the TINY
aggregate series — SURVEY §7.0's one sanctioned driver-side computation).
A corpus whose later buckets are poisoned with gibberish must trip a
changepoint in the kept-fraction series; a clean corpus must not."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataqualitykit_spark.fixtures import pages_dataframe
from dataqualitykit_spark.lineage import run_resumable
from dataqualitykit_spark.operators import anomaly


def _kept_fraction_series(spark, root: str, n_buckets: int) -> list[float]:
    m = (
        spark.read.parquet(f"{root}/metrics")
        .groupBy("bucket_id")
        .agg(
            F.sum(F.when(F.col("reason") == "kept", F.col("docs")).otherwise(0)).alias(
                "kept"
            ),
            F.sum("docs").alias("total"),
        )
        .orderBy("bucket_id")
        .collect()
    )
    assert len(m) == n_buckets
    return [r["kept"] / r["total"] for r in m]


def test_cusum_fires_on_poisoned_buckets(spark, tmp_path):
    n_buckets = 10
    base = pages_dataframe(spark, 500)
    # poison: documents landing in buckets 6..9 become gibberish (the
    # bucket id is the same url-hash the lineage runner uses)
    bucket = F.pmod(F.xxhash64("url"), F.lit(n_buckets))
    poisoned = base.withColumn(
        "text",
        F.when(
            bucket >= 6,
            F.lit("zxqv jkwf qzxj vkwf yqxz jvkw fyqx zjvk wfyq xzjv kwfy"),
        ).otherwise(F.col("text")),
    )
    root = str(tmp_path / "drift")
    run_resumable(spark, poisoned, root, n_buckets=n_buckets)
    series = _kept_fraction_series(spark, root, n_buckets)
    # later buckets keep ~nothing; CUSUM must flag a break
    assert min(series[6:]) < 0.05
    breaks = anomaly.cusum_changepoints(series, threshold=1.0)
    assert breaks and min(breaks) >= 5, (series, breaks)


def test_cusum_quiet_on_clean_buckets(spark, tmp_path):
    n_buckets = 8
    root = str(tmp_path / "clean")
    run_resumable(spark, pages_dataframe(spark, 500), root, n_buckets=n_buckets)
    series = _kept_fraction_series(spark, root, n_buckets)
    assert not anomaly.cusum_changepoints(series, threshold=4.0), series
