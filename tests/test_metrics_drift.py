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


def _py_ks(a, b):
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    na, nb = len(a), len(b)
    cum_a = cum_b = 0
    best = 0.0
    for v in sorted(set(a) | set(b)):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        best = max(best, abs(cum_a / na - cum_b / nb))
    return best


def test_ks_2samp_matches_python_mirror(spark):
    from dataqualitykit_spark.operators.corpus_stats import ks_2samp

    a = [float(((i * 37) % 101)) for i in range(300)]
    b = [float(((i * 53) % 101) + 40) for i in range(200)]  # shifted by
    # ~40% of the support: D ~ 0.4 >> crit(0.05) ~ 0.124 at n=300/200
    da = spark.createDataFrame([(v,) for v in a], "value double")
    db = spark.createDataFrame([(v,) for v in b], "value double")
    row = ks_2samp(da, db, "value").collect()[0]
    assert (row["n_a"], row["n_b"]) == (300, 200)
    assert row["ks_stat"] == _py_ks(a, b)
    # the shift is gross: must reject at 5%
    assert row["reject"] is True
    # identical samples -> D = 0, no rejection
    same = ks_2samp(da, da, "value").collect()[0]
    assert same["ks_stat"] == 0.0 and same["reject"] is False


def test_ks_2samp_disjoint_and_ties_and_buckets(spark):
    from dataqualitykit_spark.operators.corpus_stats import ks_2samp

    # disjoint supports -> D = 1 exactly (ties within each side merge at
    # the grouped-value stage, the ECDF convention)
    da = spark.createDataFrame([(1.0,)] * 50 + [(2.0,)] * 50, "value double")
    db = spark.createDataFrame([(9.0,)] * 80, "value double")
    row = ks_2samp(da, db, "value").collect()[0]
    assert row["ks_stat"] == 1.0 and row["reject"] is True
    # bucket count must not change the answer (prefix offsets are exact)
    for nb in (1, 2, 7, 1024):
        assert ks_2samp(da, db, "value", n_buckets=nb).collect()[0][
            "ks_stat"
        ] == 1.0


def test_ks_2samp_nulls_and_validation(spark):
    import pytest

    from dataqualitykit_spark.operators.corpus_stats import ks_2samp

    da = spark.createDataFrame(
        [(1.0,), (None,), (2.0,)], "value double"
    )
    db = spark.createDataFrame([(1.0,), (2.0,)], "value double")
    row = ks_2samp(da, db, "value").collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2) and row["ks_stat"] == 0.0
    empty = spark.createDataFrame([], "value double")
    with pytest.raises(ValueError, match="non-empty"):
        ks_2samp(da, empty, "value")
