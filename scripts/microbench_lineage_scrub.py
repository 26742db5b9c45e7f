#!/usr/bin/env python
"""Measure the run_resumable near-sig text-recovery re-scrub (round-5
VERDICT "what's wrong #2": lineage.py re-applies the c4/paragraph scrubs
to each bucket's input to recover the content_md5-matching text for
MinHash signatures — redundant with the scrub already done inside
run_pipeline for the same rows; each row is scrubbed TWICE total).

Times, per bucket at bench scale:
  bucket_total   full resumable-style bucket pass (run_pipeline + near
                 participants + signatures), i.e. what a bucket costs
  rescrub_only   just the re-scrub + md5 projection over the bucket input
The re-scrub fraction = rescrub_only / bucket_total decides whether a
keep-scrubbed-text cache column is worth pinning (PLANS.md).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/microbench_lineage_scrub.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    target_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))

    from dataqualitykit_spark import get_spark, run_pipeline
    from dataqualitykit_spark.config import PipelineConfig
    from dataqualitykit_spark.operators import c4_filter, dedup
    from dataqualitykit_spark.pipeline import adapt_documents

    spark = get_spark(app_name="dqx-lineage-scrub", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()
    reps = max(1, target_docs // n_base)
    replicated = (
        docs.repartition(4 * int(cpus))
        .withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" rep "), F.col("_r")))
        .drop("_r")
    )
    pages = adapt_documents(replicated)
    # one bucket of 8, the resumable slice shape
    part = pages.filter(F.pmod(F.xxhash64("url"), F.lit(8)) == 0)
    cfg = PipelineConfig(
        salt_partitions=64,
        dedup_near=True,
        near_dup_hash="md5",
        dedup_paragraphs=True,
        c4_lines=True,
    )

    def rescrub(df):
        src = df.withColumn(
            "text", c4_filter.kept_lines_text(F.col("text"), cfg.c4_min_words_per_line)
        )
        src = dedup.paragraph_scrub(
            src, "text", doc_key="url", min_repeats=cfg.paragraph_min_repeats
        )
        return src.withColumn(
            "_h", F.md5(F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"))
        ).select("url", "_h", "text")

    def timed(fn):
        best = None
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    # warmup
    run_pipeline(part.limit(2000), cfg).count()

    results = {}
    results["rescrub_only"] = timed(
        lambda: rescrub(part).agg(F.count("_h"), F.max(F.length("text"))).collect()
    )

    def bucket_pass():
        labeled = run_pipeline(part, cfg).localCheckpoint(eager=False)
        texts = rescrub(part).join(
            labeled.filter(F.col("drop_reason").isNull()).select("url"), "url"
        )
        sigs = dedup.minhash_signatures_portable(
            texts.dropDuplicates(["url"]), "text", "url", cfg.near_dup_hashes
        )
        sigs.agg(F.count("id")).collect()
        labeled.agg(F.count("url")).collect()

    results["bucket_total"] = timed(bucket_pass)
    results["rescrub_fraction"] = round(
        results["rescrub_only"] / results["bucket_total"], 3
    )
    results["n_docs_bucket"] = part.count()
    results["loadavg_end"] = list(os.getloadavg())
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
