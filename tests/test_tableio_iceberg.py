"""Conditional Iceberg activation (north rule: Iceberg tables): when the
iceberg-spark runtime jar is on the classpath, the TableIO iceberg branch
must round-trip through a hadoop-catalog table; in jar-less sandboxes the
test SKIPS (the branch is evidenced on any cluster launched with
`spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...`).

Parquet remains the default seam either way (tableio._iceberg_available).
"""

from __future__ import annotations

import pytest

from dataqualitykit_spark.sources.tableio import TableIO, _iceberg_available


def _jar_present(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_parquet_fallback_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path), fmt="parquet")
    df = spark.range(5).withColumnRenamed("id", "x")
    io.write(df, "t1")
    assert io.read("t1").count() == 5
    io.append(df, "t1")
    assert io.read("t1").count() == 10
    assert io.exists("t1") and not io.exists("nope")


def test_default_format_selection(spark):
    io = TableIO(spark, "/tmp/whatever")
    expected = "iceberg" if _iceberg_available(spark) else "parquet"
    assert io.fmt == expected


def test_iceberg_roundtrip_when_jar_present(spark, tmp_path):
    if not _jar_present(spark):
        pytest.skip(
            "iceberg runtime jar absent in sandbox — branch activates via "
            "spark-submit --packages on the cluster"
        )
    # catalogs resolve lazily, so runtime conf registration works
    spark.conf.set(
        "spark.sql.catalog.it_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_test.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_test.warehouse", str(tmp_path / "wh"))
    io = TableIO(spark, "it_test.db", fmt="iceberg")
    df = spark.range(5).withColumnRenamed("id", "x")
    io.write(df, "t1")
    assert io.read("t1").count() == 5
    io.append(df, "t1")
    assert io.read("t1").count() == 10
    # snapshot history exists (resume/lineage hook)
    snaps = spark.sql("SELECT * FROM it_test.db.t1.snapshots").count()
    assert snaps >= 2


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """The co-located-join lever: two tables bucketed+sorted on the join
    key must sort-merge-join with ZERO Exchange and ZERO Sort in the
    plan — at 100 TB this removes the dominant per-join shuffle."""
    from pyspark.sql import functions as F

    io = TableIO(spark, str(tmp_path), fmt="parquet")
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(0, 10000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 89).alias("vb")
    )
    io.write_bucketed(a, "dqx_bucket_a", ["k"], n_buckets=8)
    io.write_bucketed(b, "dqx_bucket_b", ["k"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # the fixture is tiny, so the planner would broadcast and bypass
        # the bucketed scan; at 100 TB neither side broadcasts — force
        # the sort-merge path the bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = io.read_table("dqx_bucket_a").join(
            io.read_table("dqx_bucket_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the shuffle — the cost that matters at 100 TB — is GONE; the
        # bucketed scan is engaged on both sides. (Per-task Sort nodes
        # remain unless each bucket is a single file; that is a local
        # in-memory sort of one bucket, not a cluster-wide exchange.)
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS dqx_bucket_a")
        spark.sql("DROP TABLE IF EXISTS dqx_bucket_b")
