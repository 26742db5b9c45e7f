#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "docs_per_sec": ..., "cpus": ...}

Each timed query materializes fully (parquet write or aggregate over every
computed column) so UDF columns cannot be pruned away by Catalyst.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dataqualitykit_spark import get_spark, run_pipeline
    from dataqualitykit_spark.operators import dedup, similarity
    from dataqualitykit_spark.pipeline import adapt_documents, with_metrics
    from dataqualitykit_spark.config import PipelineConfig

    spark = get_spark(app_name="dqx-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = docs.count()

    # The driver documents tables are small (500-5k rows). Replicate the
    # corpus deterministically to ~TARGET_DOCS so the pipeline measurement
    # exercises real parallelism, and repartition by url hash — a tiny
    # single parquet file otherwise arrives as ONE partition and would
    # serialize the whole Arrow-UDF stage (the 100 TB analog is thousands
    # of input splits, so this mirrors reality, not games it).
    target_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
    reps = max(1, target_docs // n_base)
    replicated = (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .withColumn("doc_id", F.col("doc_id") * reps + F.col("_r"))
        .drop("_r")
    )
    n_docs = n_base * reps

    out_dir = tempfile.mkdtemp(prefix="dqx_bench_")
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    pages = adapt_documents(replicated).repartition(4 * int(cpus), F.xxhash64("url"))

    # q1: full pipeline (scrub + heuristics + langid/ppl UDFs + dedup +
    # decide) with a real parquet write — the headline docs/sec number
    timed(
        "pipeline_full",
        lambda: run_pipeline(pages).write.mode("overwrite").parquet(f"{out_dir}/labeled"),
    )

    # q2: JVM-only heuristic rule bank (no dedup shuffle, no write) —
    # isolates the whole-stage-codegen path
    cfg = PipelineConfig(dedup_url=False, dedup_content=False)
    timed(
        "heuristics_only",
        lambda: with_metrics(pages.drop("lang"), cfg)
        .agg(
            F.sum("n_chars").alias("a"),
            F.sum("n_words").alias("b"),
            F.sum(F.length("scrubbed_text")).alias("c"),
            F.sum("ppl").alias("d"),
        )
        .collect(),
    )

    # q3: exact dedup window over text hash
    timed(
        "dedup_exact",
        lambda: dedup.dedup_exact(docs, ["text"], order_by=[F.col("doc_id")])
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # q4: MinHash-LSH near-dup candidates
    timed(
        "minhash_lsh",
        lambda: dedup.minhash_jaccard(docs, "text", "doc_id")
        .filter(F.col("est_jaccard") >= 0.8)
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    # q5: brute-force cosine top-k (100 queries against full corpus)
    timed(
        "cosine_topk",
        lambda: similarity.cosine_topk(
            emb, emb.filter(F.col("vec_id") < 100), "vec_id", "embedding", k=5
        )
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["pipeline_full"], 1)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "quality_pipeline_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "docs_per_sec": docs_per_sec,
                "cpus": int(cpus),
            }
        )
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
