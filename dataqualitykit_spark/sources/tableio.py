"""Storage seam: Iceberg when the runtime jar is on the classpath, Parquet
otherwise (SURVEY.md §2.1, §7.3 — the reference has no storage layer at
all; the north rule demands Iceberg tables with snapshot-based resume).

All engine code reads/writes through TableIO so the swap is one flag. On a
cluster: `spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...`
and pass fmt='iceberg'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    # Class.forName, NOT py4j attribute traversal: `spark._jvm.org.apache...`
    # resolves a MISSING class to a JavaPackage object without raising, so
    # the attribute form reported the jar present in jar-less sessions and
    # autodetect silently chose the iceberg branch (caught by
    # tests/test_tableio_branch.py). Resolution goes through the CONTEXT
    # classloader (ADVICE r4): the 1-arg Class.forName uses the py4j
    # gateway's root classloader, which cannot see jars added after
    # session start (ADD JAR / --packages land in Spark's mutable URL
    # classloader) — a false "absent" that would silently downgrade an
    # iceberg session to the parquet branch.
    try:
        jvm = spark._jvm
        loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog", False, loader
        )
        return True
    except Exception:
        return False


class TableIO:
    """fmt='parquet': `root` is a filesystem directory, tables are
    subdirectories. fmt='iceberg': `root` is a catalog.namespace prefix
    (e.g. 'ice.db' with spark.sql.catalog.ice configured), tables are
    multipart identifiers — df.writeTo cannot parse filesystem paths."""

    def __init__(self, spark: SparkSession, root: str, fmt: str | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        if fmt is None:
            fmt = "iceberg" if _iceberg_available(spark) else "parquet"
        self.fmt = fmt

    def _path(self, name: str) -> str:
        if self.fmt == "iceberg":
            return f"{self.root}.{name}"
        return f"{self.root}/{name}"

    def read(self, name: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.table(self._path(name))
        return self.spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        if self.fmt == "iceberg":
            writer = df.writeTo(self._path(name))
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
        else:
            df.write.mode(mode).parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        self.write(df, name, mode="append")

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort: bool = True,
    ) -> None:
        """Catalog-managed bucketed (+sorted) table: repeated joins and
        aggregations on the bucket key then plan with NO Exchange (and no
        Sort when sorted) — the 'pre-partitioning/bucketing for co-located
        joins' lever at 100 TB, where re-shuffling the corpus per join is
        the dominant cost. Uses the session catalog (Spark's built-in,
        no Hive needed); `table` is a bare table name.

        Iceberg equivalent on a cluster: a bucket(n, col) partition
        transform in the table spec."""
        writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
        if sort:
            writer = writer.sortBy(*bucket_cols)
        writer.saveAsTable(table)

    def read_table(self, table: str) -> DataFrame:
        """Read a catalog table written by write_bucketed (bucket metadata
        only survives through the catalog, not raw parquet paths)."""
        return self.spark.table(table)

    def exists(self, name: str) -> bool:
        try:
            self.read(name).schema  # noqa: B018
            return True
        except Exception:
            return False
