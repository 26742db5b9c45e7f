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
