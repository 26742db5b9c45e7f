"""Resumable per-partition lineage (BASELINE.json north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

The input is split into B deterministic url-hash buckets
(pmod(xxhash64(url), B) — the same salted key that defuses domain skew)
in ONE pass: the bucketed input is written once, partitioned by _bucket,
and every per-bucket read afterwards partition-prunes to a single
directory. (Round 1 filtered the original source per bucket — B full
input scans; at 100 TB with B=8 that is 800 TB of read.)

Each bucket is processed and appended to the output table, then its id is
recorded in a JSON manifest. A restart skips completed buckets, so a run
killed after bucket k reprocesses nothing and converges to the same table
as an uninterrupted run.

Content-dedup across buckets stays exact: before deciding dup_content, the
current bucket is LEFT-JOINED (plain shuffled equi-join on content_md5 —
NOT broadcast: the kept-hash set is the MAJORITY of the corpus at scale,
billions of md5s; AQE may still choose broadcast when the set is actually
small) against the hashes already written by COMPLETED buckets. Within a
bucket the window dedup applies as usual; across buckets the manifest
state substitutes for a global shuffle.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, PipelineConfig
from .pipeline import quality_metrics, run_pipeline
from .sources import TableIO


class Manifest:
    """JSON checkpoint manifest: {bucket_id: {rows, completed_at}}."""

    def __init__(self, path: str):
        self.path = path
        self.state: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)

    def completed(self) -> set[int]:
        return {int(k) for k in self.state}

    def mark(self, bucket: int, rows: int) -> None:
        self.state[str(bucket)] = {
            "rows": rows,
            "completed_at": datetime.now(timezone.utc).isoformat(),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
        os.replace(tmp, self.path)


def run_resumable(
    spark: SparkSession,
    source: DataFrame,
    out_root: str,
    n_buckets: int = 8,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    fail_after: int | None = None,
) -> Manifest:
    """Process `source` in url-hash buckets, appending labeled output +
    metrics per bucket; resume skips completed buckets.

    fail_after=k raises after k buckets (test hook for the kill/resume
    contract).
    """
    io = TableIO(spark, out_root, fmt="parquet")
    os.makedirs(out_root, exist_ok=True)
    manifest = Manifest(os.path.join(out_root, "manifest.json"))
    done = manifest.completed()

    # ONE source scan: materialize the bucketed input partitioned by
    # _bucket, then every per-bucket read below prunes to one partition
    # directory (PartitionFilters on _bucket). The marker file makes the
    # stage idempotent across restarts — a resume never re-scans the
    # source, matching the north rule's "resumable mid-table".
    bucketed_path = io._path("bucketed")
    marker = os.path.join(out_root, "_bucketed_done")
    if not os.path.exists(marker):
        # project the pipeline's columns only — never rewrite `html`
        # page bytes into the bucketed copy
        keep = [c for c in ("url", "warc_ts", "text", "lang") if c in source.columns]
        (
            source.select(*keep)
            .withColumn(
                "_bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
            )
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(bucketed_path)
        )
        with open(marker, "w") as f:
            f.write("ok")
    bucketed = spark.read.parquet(bucketed_path)

    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        labeled = run_pipeline(part, cfg)
        # cross-bucket exact content dedup against already-written keeps.
        # Restrict to manifest-COMPLETED buckets: a torn previous run may
        # have written this bucket's files without marking it, and reading
        # them here would (a) dedup the bucket against its own stale copy
        # and (b) race the dynamic overwrite that replaces those files.
        if cfg.dedup_content and done:
            prior = (
                io.read("labeled")
                .filter(
                    F.col("keep")
                    & F.col("bucket_id").isin(*[int(x) for x in done])
                )
                .select(F.col("content_md5").alias("_h"))
                .distinct()
            )
            # plain equi-join on a hash key — sort-merge/shuffled-hash is
            # fine, and AQE broadcasts on its own when `hit` is small.
            # Forcing broadcast here would ship the kept-hash set of the
            # whole processed corpus into every executor.
            hit = prior.withColumn("_dup_prior", F.lit(True))
            labeled = (
                labeled.withColumn("_h", F.col("content_md5"))
                .join(hit, "_h", "left")
                .withColumn(
                    "drop_reason",
                    F.when(
                        F.col("keep") & F.col("_dup_prior").isNotNull(),
                        F.lit("dup_content"),
                    ).otherwise(F.col("drop_reason")),
                )
                .withColumn("keep", F.col("keep") & F.col("_dup_prior").isNull())
                .drop("_h", "_dup_prior")
            )
        labeled = labeled.withColumn("bucket_id", F.lit(b))
        # idempotent per-bucket commit: dynamic partition overwrite on
        # bucket_id means a crash AFTER the write but BEFORE manifest.mark
        # replaces (not duplicates) the bucket's rows on resume
        (
            labeled.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_id")
            .parquet(io._path("labeled"))
        )
        (
            quality_metrics(labeled.drop("bucket_id"))
            .withColumn("bucket_id", F.lit(b))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_id")
            .parquet(io._path("metrics"))
        )
        # count the WRITTEN parquet (cheap metadata scan) instead of
        # recomputing the whole UDF pipeline a second time
        rows = (
            io.read("labeled").filter(F.col("bucket_id") == b).count()
        )
        manifest.mark(b, rows)
        done.add(b)
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after bucket {b}")
    return manifest
